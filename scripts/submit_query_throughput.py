"""spark-submit entry point: concurrent query-throughput cell.

Measures the SERVING shape of the engine on a multi-executor cluster: the
reference query set is fired from a pool of driver threads against a warmed
index (persisted postings/norms), so concurrent Spark jobs keep every
executor core busy — throughput (q/s) is the number that scales with
executors, unlike single-query latency which is bounded by one query's
task count.

    spark-submit --py-files ctse.zip scripts/submit_query_throughput.py \
        --index-dir /path/to/index [--threads 8] [--rounds 3]

Prints one JSON line: {"queries": N, "seconds": s, "qps": ...,
"p50_sec": ..., "p95_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3,
                    help="repetitions of the 20-query reference set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.sources.corpus import (
        reference_queries,
    )

    spark = SparkSession.builder.appName("ctse-query-throughput").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    eng = SearchEngine(spark, args.index_dir).warm(postings=True)
    qs = reference_queries()
    for q in qs:  # steady state: codegen JIT + persisted-relation warm
        eng.search_topk_rows(q["text"], k=q["k"])

    lat: list[float] = []

    def one(q) -> None:
        t0 = time.time()
        eng.search_topk_rows(q["text"], k=q["k"])
        lat.append(time.time() - t0)  # list.append is atomic under the GIL

    work = [q for _ in range(args.rounds) for q in qs]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.threads) as ex:
        list(ex.map(one, work))
    wall = time.time() - t0

    lat.sort()
    print(json.dumps({
        "queries": len(work),
        "seconds": round(wall, 2),
        "qps": round(len(work) / wall, 3),
        "p50_sec": round(lat[len(lat) // 2], 4),
        "p95_sec": round(lat[int(len(lat) * 0.95)], 4),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
