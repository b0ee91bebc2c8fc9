"""Round-6 probe: decompose the ~0.25-0.31 s per-query wall into
sub-phases finer than profile_query_overhead.py, to find where the fixed
cost actually goes (guide §1: measure first).

Phases measured on a warmed index (steady state, min-of-N):
  analyze      tokenize + qtf (pure Python)
  dfs          global df lookup (dict hit after warm preload)
  build_df     construct the cogroup DataFrame + kernel closure (py4j)
  noop_job     spark.range(1).count() — the floor cost of ANY job
  scan_only    postings.where(isin).count() — cache scan + filter, no Python
  cogroup_job  full search collect (job + Arrow + kernel + topk + fetch)
  search_total engine.search_topk_rows

Usage: python scripts/probe_query_phases.py [--sf-docs N] [--cpus C]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.plans import query as Q
    from clinical_trial_searchengine_spark.session import get_spark
    from clinical_trial_searchengine_spark.sources.corpus import (
        generate_corpus_df,
        reference_queries,
    )

    spark = get_spark(
        app_name="ctse-probe-query",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = args.n_docs
    corpus_dir = f"/tmp/ctse_bench_corpus_{n_docs}"
    index_dir = f"/tmp/ctse_probe_idx_{n_docs}"
    if not os.path.exists(corpus_dir):
        generate_corpus_df(
            spark, n_docs, seed=42, partitions=args.cpus * 2
        ).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        shutil.rmtree(index_dir, ignore_errors=True)
        SearchEngine(spark, index_dir).build(
            corpus, mode="standard", shard_size=max(4096, n_docs // 8),
            hot_df_threshold=max(1000, n_docs // 10),
        )
    eng = SearchEngine(spark, index_dir).warm(postings=True)
    handle = eng.handle()
    meta = handle.meta
    qs = reference_queries()
    for q in qs:
        eng.search_topk_rows(q["text"], k=q["k"])  # steady state

    phases: dict[str, list[float]] = {}

    def rec(name, dt):
        phases.setdefault(name, []).append(dt)

    for _ in range(args.rounds):
        # floor: the cheapest possible Spark job
        t0 = time.perf_counter()
        spark.range(1).count()
        rec("noop_range_count", time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.sparkContext.parallelize([1], 1).count()
        rec("noop_rdd_count", time.perf_counter() - t0)
        for q in qs[:6]:
            qtf = Q.analyze_query(q["text"], meta["mode"])
            t0 = time.perf_counter()
            Q.analyze_query(q["text"], meta["mode"])
            t1 = time.perf_counter()
            handle.global_dfs(list(qtf))
            t2 = time.perf_counter()
            df = Q.search(spark, index_dir, q["text"], q["k"], handle=handle)
            t3 = time.perf_counter()
            rows = df.collect()
            t4 = time.perf_counter()
            assert rows is not None
            rec("analyze", t1 - t0)
            rec("dfs", t2 - t1)
            rec("build_df", t3 - t2)
            rec("collect", t4 - t3)
            rec("search_total", t4 - t0)
            # cache scan + filter only, no Python boundary
            t0 = time.perf_counter()
            handle.postings.where(
                F.col("term").isin(list(qtf))
            ).select("gen", "shard").count()
            rec("scan_filter_count", time.perf_counter() - t0)
            # scan + collect the pruned postings bytes to the driver
            t0 = time.perf_counter()
            handle.norms.select("gen", "shard").count()
            rec("norms_scan_count", time.perf_counter() - t0)

    out = {
        p: {
            "min_ms": round(min(v) * 1e3, 2),
            "p50_ms": round(statistics.median(v) * 1e3, 2),
            "mean_ms": round(statistics.mean(v) * 1e3, 2),
            "n": len(v),
        }
        for p, v in phases.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
