"""Round-6 probe: what does the minimal Spark job cost at local[32], and
which knobs move it?  (guide §1 measure-first; feeds the per-query
fixed-cost work, VERDICT r5 task #4.)

Cells (each min-of-N after warmup):
  range_count_aqe        spark.range(1).count() with session AQE
  range_count_noaqe      same with spark.sql.adaptive.enabled=false
  range_collect          spark.range(1).collect() (no shuffle at all)
  pandas_min             1-partition applyInPandas job
  arrow_min              1-partition mapInArrow job
  pandas_8part           8-partition applyInPandas job (empty-ish data)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cell(fn, n=7):
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
    import pandas as pd
    import pyarrow as pa

    from clinical_trial_searchengine_spark.session import get_spark

    spark = get_spark(
        app_name="ctse-probe-floor", master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    out["range_collect"] = cell(lambda: spark.range(1).collect())
    out["range_count_aqe"] = cell(lambda: spark.range(1).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["range_count_noaqe"] = cell(lambda: spark.range(1).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    df1 = spark.range(0, 64, 1, 1).selectExpr("id", "id % 4 as g")
    df1.persist().count()

    def k(key, pdf):
        return pd.DataFrame({"g": [int(key[0])], "n": [len(pdf)]})

    out["pandas_1part"] = cell(
        lambda: df1.groupby("g").applyInPandas(k, "g long, n long").collect()
    )

    def ak(it):
        for b in it:
            yield pa.RecordBatch.from_pydict({"n": [b.num_rows]})

    out["arrow_1part"] = cell(
        lambda: df1.mapInArrow(ak, "n long").collect()
    )

    df8 = spark.range(0, 64, 1, 8).selectExpr("id", "id % 16 as g")
    df8 = df8.repartition(8, "g").persist()
    df8.count()
    out["pandas_8part"] = cell(
        lambda: df8.groupby("g").applyInPandas(k, "g long, n long").collect()
    )
    out["arrow_8part"] = cell(lambda: df8.mapInArrow(ak, "n long").collect())
    out["cogroup_8part"] = cell(
        lambda: df8.groupby("g")
        .cogroup(df8.groupby("g"))
        .applyInPandas(lambda key, a, b: k(key, a), "g long, n long")
        .collect()
    )
    # orderBy/limit on top of a python stage (the search() tail shape)
    from pyspark.sql import functions as F

    out["arrow_8part_topk"] = cell(
        lambda: df8.mapInArrow(ak, "n long")
        .orderBy(F.desc("n")).limit(3).collect()
    )
    # does python worker reuse hold? measure worker pid stability
    def pidk(it):
        for b in it:
            yield pa.RecordBatch.from_pydict({"pid": [os.getpid()]})

    pids = set()
    for _ in range(5):
        pids.update(
            r["pid"] for r in df8.mapInArrow(pidk, "pid long").collect()
        )
    out["distinct_worker_pids_5x8tasks"] = len(pids)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
