"""Benchmark harness (driver contract).

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"index_build": sec, "q001": sec, ...}, "sf": 0.1, ...}

Workload (mirrors BASELINE.json's metric: index-build throughput + top-k
query latency, rank-identical BM25):

1. ``index_build`` — full segment build (tokenize -> salted shuffle ->
   varint/block-max postings -> norms/manifest) over the deterministic
   synthetic source-code corpus at ``n_docs = 500_000 * sf`` (FIXTURES.md
   §1: sf0.1 -> 50k docs).  Also reported as ``build_docs_per_sec``.
2. ``q001..q020`` — the 20-query reference set (sources/corpus.py
   reference_queries) against the warmed index; per-query wall seconds;
   p50/p95 exported as ``query_p50_sec`` / ``query_p95_sec``.
3. Headline DataFrame ops on the driver-provided parquet tables:
   BM25 top-k over `documents`, MinHash-LSH dedup, brute-force cosine
   top-k over `embeddings`.

Scaling evidence (local[8] vs local[32]) lives in scripts/bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_docs = max(2_000, int(500_000 * sf))

    from pyspark.sql import functions as F

    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.operators.dedup import (
        minhash_lsh_duplicates,
    )
    from clinical_trial_searchengine_spark.operators.similarity import cosine_topk
    from clinical_trial_searchengine_spark.plans.dataframe_bm25 import bm25_topk
    from clinical_trial_searchengine_spark.session import get_spark
    from clinical_trial_searchengine_spark.sources.corpus import (
        generate_corpus_df,
        reference_queries,
    )

    spark = get_spark(
        app_name="ctse-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    t_total = time.time()

    # -- 1. index build over the synthetic north-rule corpus ----------------
    # Corpus is materialized to parquet UNTIMED (in production the input is
    # an existing Iceberg table; generator cost is not index-build cost).
    index_dir = f"/tmp/ctse_bench_index_{os.getpid()}"
    corpus_dir = f"/tmp/ctse_bench_corpus_{n_docs}"
    shutil.rmtree(index_dir, ignore_errors=True)
    if not os.path.exists(corpus_dir):
        generate_corpus_df(
            spark, n_docs, seed=42, partitions=cpus * 2
        ).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    # One UNTIMED tiny warm-up build first, mirroring the query suite's
    # untimed pass: the first build in a fresh JVM pays one-time costs
    # (Janino codegen, Python-worker spawn, Arrow pools, JIT) that showed
    # up as 2-6s of phantom wall spread across the first job's stages —
    # steady-state is the honest throughput for a long-running indexer.
    # The timed cell is then MIN-MERGED over 2 full builds (same
    # steal-robust estimator as the query cells); the observed spread is
    # exported as build_noise_rel_spread.
    warm_dir = f"{index_dir}_warm"
    shutil.rmtree(warm_dir, ignore_errors=True)
    SearchEngine(spark, warm_dir).build(
        corpus.limit(2_000), mode="standard", shard_size=1_024
    )
    shutil.rmtree(warm_dir, ignore_errors=True)

    build_walls: list[float] = []
    build_meta: dict = {}
    for pass_i in range(3):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        eng = SearchEngine(spark, index_dir)
        meta_i = eng.build(
            corpus,
            mode="standard",
            shard_size=max(4096, n_docs // 8),
            hot_df_threshold=max(1000, n_docs // 10),
        )
        wall_i = time.time() - t0
        build_walls.append(wall_i)
        if wall_i == min(build_walls):
            build_meta = meta_i
    build_sec = min(build_walls)
    build_spread = (max(build_walls) - build_sec) / build_sec
    queries["index_build"] = round(build_sec, 3)

    # -- 2. reference query suite on the warmed index -----------------------
    # One untimed pass first: the first execution of each query shape pays
    # one-time costs (Python-worker spawn per kernel closure, Janino codegen
    # variants, Arrow buffer pools) that a query SERVICE never pays again —
    # round-1 bench showed a single roaming 2.5s outlier (q015 there,
    # q001/q020 on other runs) that disappears from the second pass onward;
    # steady-state is the honest latency for the reference's "<2s per
    # complex query" server-style baseline.
    # Per-query cells are MIN-MERGED over 3 passes: this host shows
    # hypervisor-steal wobble of +-10% on single-shot cells (BASELINE.md),
    # which round-over-round diffs then misread as engine regressions (the
    # r3 phantom -9%).  min-of-3 is the standard steal-robust estimator for
    # a deterministic workload; the observed spread is exported as
    # query_noise_rel_spread so the JSON itself says how noisy the host was.
    eng.warm(postings=True)
    for q in reference_queries():
        eng.search_topk_rows(q["text"], k=q["k"])
    per_q: list[float] = []
    spreads: list[float] = []
    for q in reference_queries():
        times = []
        for _ in range(4):
            t0 = time.time()
            eng.search_topk_rows(q["text"], k=q["k"])
            times.append(time.time() - t0)
        dt = min(times)
        spreads.append((max(times) - dt) / dt if dt > 0 else 0.0)
        queries[q["query_id"]] = round(dt, 4)
        per_q.append(dt)

    # -- 2b. scoring-kernel comparison on the warmed index -------------------
    # "auto" is the DEFAULT search path: per-query df-adaptive choice
    # between block-max 'pruned' (candidate pool >> k) and 'exhaustive'
    # (rare-term queries, where skip bookkeeping is pure overhead) — this
    # cell is the standing evidence auto <= min(pruned, exhaustive) on a
    # mixed batch.  wand_ref is the DEMOTED doc-at-a-time Python reference
    # (test-only oracle, not reachable as a production kernel — the public
    # 'wand'/use_wand surface resolves to 'pruned'); measured here for the
    # record.  Six-query batches, one warm pass per kernel first.
    kq = list(reference_queries())[:6]
    for kern in ("auto", "pruned", "exhaustive", "wand_ref"):
        arg = None if kern == "auto" else kern
        for q in kq:
            eng.search_topk_rows(q["text"], k=q["k"], kernel=arg)
        cells = []
        for _ in range(2):
            t0 = time.time()
            for q in kq:
                eng.search_topk_rows(q["text"], k=q["k"], kernel=arg)
            cells.append(time.time() - t0)
        queries[f"kernel_{kern}_6q"] = round(min(cells), 3)

    # -- 2c. postings codec cells: varint (wire v1) vs PForDelta (wire v2) --
    # The 200 densest posting lists of the just-built index are transcoded
    # to BOTH codecs driver-side and full-decoded min-of-3 — standing size
    # + decode-throughput evidence for the default-codec choice (the build
    # default is pfor; decode version-dispatches per buffer).
    from clinical_trial_searchengine_spark.functions.codec import (
        decode_postings,
        encode_postings,
    )

    hot_rows = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .orderBy(F.col("n_postings").desc())
        .limit(200)
        .select("postings")
        .collect()
    )
    hot_decoded = [decode_postings(bytes(r["postings"])) for r in hot_rows]
    n_hot_postings = sum(len(d) for d, _ in hot_decoded)
    codec_bytes_per_posting: dict[str, float] = {}
    for c in ("varint", "pfor"):
        bufs = [
            encode_postings(d, t.astype("uint64"), codec=c)[0]
            for d, t in hot_decoded
        ]
        codec_bytes_per_posting[c] = round(
            sum(len(b) for b in bufs) / max(1, n_hot_postings), 3
        )
        walls = []
        for _ in range(3):
            t0 = time.time()
            for b in bufs:
                decode_postings(b)
            walls.append(time.time() - t0)
        queries[f"codec_{c}_decode_200hot"] = round(min(walls), 4)

    # -- 2d. concurrent serving throughput (round 4) --------------------------
    # 16 driver threads fire the 20-query set x3 at the warmed index through
    # (a) per-query jobs and (b) the adaptive micro-batching server — the
    # serving surface; qps is reported so round-over-round JSONs track the
    # batching win (absolute throughput, same hardware).
    from concurrent.futures import ThreadPoolExecutor

    serving_qps: dict[str, float] = {}
    work = [q for _ in range(3) for q in reference_queries()]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(lambda q: eng.search_topk_rows(q["text"], k=q["k"]), work))
    serving_qps["per_query"] = round(len(work) / (time.time() - t0), 2)
    with eng.serving() as srv:
        for q in reference_queries():  # warm the batch-kernel path
            srv.search(q["text"], k=q["k"])
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=16) as ex:
            list(ex.map(lambda q: srv.search(q["text"], k=q["k"]), work))
        serving_qps["batched"] = round(len(work) / (time.time() - t0), 2)

    # -- 3. headline DataFrame ops on driver tables -------------------------
    # Each op runs once untimed (whole-stage-codegen Janino compile is a
    # one-time ~50s JIT cost, amortized to nothing at real scale) and once
    # timed — the steady-state number is the honest scale-relevant one.
    # Skipped when the sf dir has no driver tables (e.g. the sf1.0
    # matched-corpus-size cell, which only exercises build + query suite).
    has_tables = os.path.exists(f"{sf_dir}/documents.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") if has_tables else None
    if has_tables:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        qvec = [float(x) for x in qvec]

        def _op_bm25():
            bm25_topk(
                docs, {"merge": 1.0, "join": 1.0, "filter": 1.0}, k=10
            ).collect()

        def _op_minhash():
            minhash_lsh_duplicates(docs, threshold=0.8).count()

        def _op_ann():
            cosine_topk(emb, qvec, k=10).collect()

        for name, op in [
            ("bm25_documents_topk", _op_bm25),
            ("minhash_lsh_dedup", _op_minhash),
            ("ann_cosine_topk", _op_ann),
        ]:
            op()  # warm: codegen compile + parquet footer cache
            cells = []
            for _ in range(3):
                t0 = time.time()
                op()
                cells.append(time.time() - t0)
            queries[name] = round(min(cells), 3)

    total = time.time() - t_total
    shutil.rmtree(index_dir, ignore_errors=True)

    result = {
        "metric": "index_build + bm25 topk query suite + pipeline ops wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs_indexed": n_docs,
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "build_cells": "warmup_plus_min_of_3",
        "build_noise_rel_spread": round(build_spread, 4),
        "query_p50_sec": round(statistics.median(per_q), 4),
        "query_p95_sec": round(sorted(per_q)[int(0.95 * (len(per_q) - 1))], 4),
        "query_cells": "min_of_4",
        "query_noise_rel_spread": round(statistics.median(spreads), 4),
        "cpus": cpus,
        "serving_qps_16threads": serving_qps,
        "postings_codec": build_meta.get("postings_codec", "pfor"),
        "codec_bytes_per_posting": codec_bytes_per_posting,
        "build_stage_sec": build_meta.get("stage_seconds", {}),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
