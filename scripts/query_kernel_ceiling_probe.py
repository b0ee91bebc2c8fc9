"""Hardware-ceiling probe for the QUERY scoring kernel (no Spark).

Twin of scripts/kernel_ceiling_probe.py, for the query side: the hot
work of a warmed top-k query is (a) varint/block decode of the query
terms' posting lists, (b) the BM25 contribution scatter-add
`acc[off] += w * tf/(tf+Kd)`, and (c) the bounded top-k argpartition.
This probe runs EXACTLY those kernels — the engine's own
`decode_postings` + the `_contrib_cached` math + `_topk_from_scores` —
in P identical, fully independent OS processes over private copies of
the same synthetic shard.  No Spark, no JVM, no shared state: the
per-process slowdown from P=1 to P=4 is the shared socket (the
scatter-add is memory-latency/bandwidth bound), and t(1)/t(4) is the
parallel-efficiency CEILING any 4-way-parallel query execution can
measure on this box.  Compare the concurrent per-query cluster cells
(BENCH/query_cluster_cells.json) against it.

Each P is sampled `iters` times; MIN per-process time kept (min over
load windows estimates the unloaded cost — shared-tenant host).

Usage: python scripts/query_kernel_ceiling_probe.py [n_docs] [iters]
Writes BENCH/query_kernel_ceiling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROCS = (1, 4)
N_TERMS = 24          # posting lists in the synthetic shard
TERMS_PER_QUERY = 3
N_QUERIES = 400       # scoring passes per timed iteration


def _cell(args) -> float:
    n_docs, seed = args
    import numpy as np

    from clinical_trial_searchengine_spark.functions.codec import (
        decode_postings, encode_postings_group,
    )
    from clinical_trial_searchengine_spark.plans.query import (
        _topk_from_scores,
    )

    rng = np.random.default_rng(seed)
    k1, b, avgdl, k = 1.2, 0.75, 120.0, 10
    dl = rng.integers(40, 300, size=n_docs).astype(np.float64)
    ids_parts, tfs_parts, bounds = [], [], [0]
    for t in range(N_TERMS):
        df = int(n_docs * rng.uniform(0.05, 0.6))
        ids_parts.append(np.sort(
            rng.choice(n_docs, size=df, replace=False).astype(np.uint64)
        ))
        tfs_parts.append(rng.integers(1, 6, size=df).astype(np.uint64))
        bounds.append(bounds[-1] + df)
    bufs, _ = encode_postings_group(
        np.concatenate(ids_parts), np.concatenate(tfs_parts),
        np.asarray(bounds, dtype=np.int64),
    )
    bufs = [bytes(b) for b in bufs]

    t0 = time.time()
    # (a) decode + per-term contribution — once per term (the engine's
    # per-worker contribution cache shape)
    contrib = []
    for buf in bufs:
        ids, tfs = decode_postings(buf)
        off = ids.astype(np.int64)
        Kd = k1 * (1.0 - b + b * dl[off] / avgdl)
        contrib.append((off, tfs.astype(np.float64) / (tfs + Kd)))
    # (b)+(c) per-query scatter-add + bounded top-k
    for q in range(N_QUERIES):
        acc = np.zeros(n_docs, dtype=np.float64)
        for t in range(TERMS_PER_QUERY):
            off, norm = contrib[(q + t * 7) % N_TERMS]
            acc[off] += 1.7 * norm
        _topk_from_scores(acc, 0, k)
    return time.time() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 62_500
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = os.path.join(REPO, "BENCH", "query_kernel_ceiling.json")
    best: dict[int, float] = {}
    if os.path.exists(path):  # min-merge with earlier load windows
        with open(path) as f:
            prev = json.load(f)
        if prev.get("n_docs_per_proc") == n_docs:
            best = {int(p): v for p, v in prev["per_proc_sec"].items()}
    for _ in range(iters):
        for p in PROCS:
            with mp.Pool(p) as pool:
                walls = pool.map(_cell, [(n_docs, 42 + i) for i in range(p)])
            w = max(walls)
            best[p] = min(best.get(p, float("inf")), w)
    out = {
        "n_docs_per_proc": n_docs,
        "n_queries": N_QUERIES,
        "per_proc_sec": {str(p): round(best[p], 3) for p in PROCS},
        "ceiling_eff_4x": round(best[1] / best[4], 3),
        "note": (
            "independent processes running the engine's real query "
            "kernels (decode_postings + BM25 contribution scatter-add + "
            "bounded top-k); per-process slowdown at P>1 is pure hardware "
            "(memory latency/bandwidth on the fancy-indexed scatter-add) "
            "- the parallel-efficiency ceiling for 4-way query execution. "
            "MIN-merged across probe runs."
        ),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
