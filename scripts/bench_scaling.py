"""Two-parallelism scaling evidence (north rule: throughput efficiency >= 0.8
going from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two local parallelism levels — local[8] (N) and local[32]
(4N) — on the SAME materialized parquet input, each in a fresh subprocess
(fresh JVM, no cache reuse between levels).  Reported per level:

* index-build throughput (docs/sec) over the deterministic synthetic
  source-code corpus (sources/corpus.py),
* query throughput (queries/sec) for the 20-query reference suite submitted
  CONCURRENTLY from 8 driver threads (the realistic serving shape — Spark
  schedules concurrent jobs across all cores; sequential per-query latency
  is fixed job-scheduling overhead and does not scale with cores).

Efficiency(N->4N) = (T_N / T_4N) / 4 for builds, and
(QPS_4N / QPS_8) / 4 for queries.

Usage:
  python scripts/bench_scaling.py [--n-docs 100000]       # orchestrate + report
  python scripts/bench_scaling.py --run 8 --n-docs 100000 # one level (internal)

Writes BENCH/BASELINE.md with the table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, n_docs: int, corpus_dir: str) -> dict:
    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.session import get_spark
    from clinical_trial_searchengine_spark.sources.corpus import reference_queries

    spark = get_spark(
        app_name=f"ctse-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_dir)

    index_dir = f"/tmp/ctse_scaling_idx_{cpus}_{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    eng = SearchEngine(spark, index_dir)
    eng.build(
        corpus,
        mode="standard",
        shard_size=max(4096, n_docs // 8),
        hot_df_threshold=max(1000, n_docs // 10),
    )
    build_sec = time.time() - t0

    eng.warm(postings=True)
    qs = reference_queries()
    for q in qs[:3]:  # steady-state: codegen + kernel warm
        eng.search_topk_rows(q["text"], k=q["k"])

    def one(q):
        eng.search_topk_rows(q["text"], k=q["k"])

    n_rounds = 3  # 60 concurrent queries total
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(one, [q for _ in range(n_rounds) for q in qs]))
    query_sec = time.time() - t0
    n_queries = len(qs) * n_rounds

    shutil.rmtree(index_dir, ignore_errors=True)
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "n_queries": n_queries,
        "query_sec": round(query_sec, 2),
        "queries_per_sec": round(n_queries / query_sec, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=0, help="internal: run one level")
    ap.add_argument("--n-docs", type=int, default=100_000)
    args = ap.parse_args()
    corpus_dir = f"/tmp/ctse_scaling_corpus_{args.n_docs}"

    if args.run:
        print(json.dumps(run_level(args.run, args.n_docs, corpus_dir)))
        return

    # -- orchestrate: materialize corpus once, run each level in a fresh JVM
    if not os.path.exists(corpus_dir):
        from clinical_trial_searchengine_spark.session import get_spark
        from clinical_trial_searchengine_spark.sources.corpus import (
            generate_corpus_df,
        )

        spark = get_spark(master="local[32]", shuffle_partitions=32,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        spark.sparkContext.setLogLevel("ERROR")
        generate_corpus_df(spark, args.n_docs, seed=42, partitions=64)\
            .write.mode("overwrite").parquet(corpus_dir)
        spark.stop()

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--run", str(cpus), "--n-docs", str(args.n_docs)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(json.dumps(results[cpus]))

    r8, r32 = results[8], results[32]
    build_eff = (r32["build_docs_per_sec"] / r8["build_docs_per_sec"]) / 4
    query_eff = (r32["queries_per_sec"] / r8["queries_per_sec"]) / 4
    summary = {
        "build_speedup_8_to_32": round(
            r32["build_docs_per_sec"] / r8["build_docs_per_sec"], 2
        ),
        "build_scaling_efficiency": round(build_eff, 3),
        "query_speedup_8_to_32": round(
            r32["queries_per_sec"] / r8["queries_per_sec"], 2
        ),
        "query_scaling_efficiency": round(query_eff, 3),
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — measured engine numbers (this sandbox)

Machine: single node, 32 hardware threads, local-mode Spark (one JVM).
Input: deterministic synthetic source-code corpus (sources/corpus.py,
seed=42), {args.n_docs:,} docs, ~200 tokens/doc, materialized to parquet
once and shared by both levels.  Each level runs in a fresh JVM.

## Two-parallelism scaling (north rule: efficiency >= 0.8 from N to 4N)

No real cluster exists in this sandbox; per the driver instruction the same
job runs at local[8] (N) and local[32] (4N).  Queries are submitted
concurrently from 8 driver threads (the serving shape; Spark schedules
concurrent jobs across all cores).

| level | build sec | build docs/s | query suite sec ({r8["n_queries"]} q) | queries/s |
|---|---|---|---|---|
| local[8]  (N)  | {r8["build_sec"]} | {r8["build_docs_per_sec"]} | {r8["query_sec"]} | {r8["queries_per_sec"]} |
| local[32] (4N) | {r32["build_sec"]} | {r32["build_docs_per_sec"]} | {r32["query_sec"]} | {r32["queries_per_sec"]} |

* Build scaling 8 -> 32: **{summary["build_speedup_8_to_32"]}x speedup,
  efficiency {summary["build_scaling_efficiency"]}**
* Query-throughput scaling 8 -> 32: **{summary["query_speedup_8_to_32"]}x
  speedup, efficiency {summary["query_scaling_efficiency"]}**

Caveats (honest): local[8] vs local[32] shares one JVM heap, one memory
bus and one disk, so this under-reports true multi-node scaling for
compute-bound stages and over-reports it for I/O-bound ones; the shuffle
is in-process (no network).  The partition strategy itself
(doc-range shards, salted term shuffle, per-shard kernels, global
broadcast stats) has no single-node assumption — shard count and
term_buckets grow with the input, and no stage collects unbounded data
to the driver.

## vs the reference (BASELINE.md)

The reference ingests ~54-80 docs/s (ClinicalTrials.gov scraper,
single node) and serves complex queries in <2 s (OpenSearch, 512 MB
heap, 580k docs).  This engine indexes {r32["build_docs_per_sec"]}
docs/s at local[32] and answers top-k queries in ~0.25-0.3 s p50
(sequential) / {r32["queries_per_sec"]} q/s (concurrent) at 100k docs
— see bench.py output (BENCH_r*.json) for the per-query suite.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
