"""Round-6 probe #2: split the job floor into plan-vs-execute-vs-py4j.

Cells:
  jvm_count_py4j      spark._jsparkSession.range(1).count() — pure JVM job,
                      one py4j call, no PySpark collect plumbing
  reused_df_collect   .collect() on the SAME DataFrame object (QueryExecution
                      cached) vs fresh_df_collect (re-analyze each time)
  reused_py_collect   same split for a 1-partition mapInArrow plan
  py4j_roundtrip      trivial py4j call cost
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cell(fn, n=9):
    fn()
    v = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        v.append(time.perf_counter() - t0)
    return {
        "min_ms": round(min(v) * 1e3, 1),
        "p50_ms": round(statistics.median(v) * 1e3, 1),
    }


def main() -> None:
    import pyarrow as pa

    from clinical_trial_searchengine_spark.session import get_spark

    spark = get_spark(
        app_name="ctse-probe-floor2", master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    jspark = spark._jsparkSession
    out["py4j_roundtrip"] = cell(lambda: spark._jsc.sc().defaultParallelism())
    out["jvm_count_py4j"] = cell(lambda: jspark.range(1).count())
    jdf = jspark.range(1)
    out["jvm_count_reused_jdf"] = cell(lambda: jdf.count())

    fresh = cell(lambda: spark.range(1).collect())
    same_df = spark.range(1)
    reused = cell(lambda: same_df.collect())
    out["fresh_df_collect"] = fresh
    out["reused_df_collect"] = reused

    df1 = spark.range(0, 64, 1, 1).persist()
    df1.count()

    def ak(it):
        for b in it:
            yield pa.RecordBatch.from_pydict({"n": [b.num_rows]})

    out["fresh_py_collect"] = cell(
        lambda: df1.mapInArrow(ak, "n long").collect()
    )
    pydf = df1.mapInArrow(ak, "n long")
    out["reused_py_collect"] = cell(lambda: pydf.collect())
    # toPandas vs collect on the python plan
    out["reused_py_toPandas"] = cell(lambda: pydf.toPandas())
    out["reused_py_toArrow"] = cell(lambda: pydf.toArrow())
    # is it the python-function broadcast per job?  measure a job with the
    # same physical plan run twice back-to-back inside one timing
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
