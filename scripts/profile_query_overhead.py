"""Decompose per-query wall time on a warmed index into driver-side
phases, to find the serial fraction that caps concurrent-query executor
scaling (BENCH/BASELINE.md: 0.734 at 16 threads, 1 -> 4 executors).

Phases per query (single-threaded, steady-state):
  analyze    tokenize + qtf           (pure Python)
  dfs        global df lookup         (dict hit after warm preload)
  plan       build the cogroup DataFrame + kernel closure (py4j, no job)
  execute    .collect() on the built plan (job + result fetch)

Usage: python scripts/profile_query_overhead.py [--index-dir D] [--rounds R]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", default="/dev/shm/ctse_query_idx_200000")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--master", default="local[4]")
    args = ap.parse_args()

    from clinical_trial_searchengine_spark.session import get_spark
    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.plans import query as Q
    from clinical_trial_searchengine_spark.sources.corpus import (
        reference_queries,
    )

    spark = get_spark(master=args.master, shuffle_partitions=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    eng = SearchEngine(spark, args.index_dir).warm(postings=True)
    handle = eng.handle()
    meta = handle.meta
    qs = reference_queries()
    for q in qs:
        eng.search_topk_rows(q["text"], k=q["k"])  # steady state

    phases = {p: [] for p in ("analyze", "dfs", "plan", "execute", "total")}
    for _ in range(args.rounds):
        for q in qs:
            t0 = time.perf_counter()
            qtf = Q.analyze_query(q["text"], meta["mode"])
            t1 = time.perf_counter()
            handle.global_dfs(list(qtf))
            t2 = time.perf_counter()
            df = Q.search(spark, args.index_dir, q["text"], q["k"],
                          handle=handle)
            t3 = time.perf_counter()
            df.collect()
            t4 = time.perf_counter()
            phases["analyze"].append(t1 - t0)
            phases["dfs"].append(t2 - t1)
            phases["plan"].append(t3 - t2)
            phases["execute"].append(t4 - t3)
            phases["total"].append(t4 - t0)

    out = {
        p: {
            "p50_ms": round(statistics.median(v) * 1e3, 2),
            "mean_ms": round(statistics.mean(v) * 1e3, 2),
        }
        for p, v in phases.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
