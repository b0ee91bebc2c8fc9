"""Round-6 probe #3: where inside a 1-task python job do 135 ms go?

The mapInArrow kernel stamps wall-clock times (first-batch receipt, yield);
driver stamps submit/return.  Gap A = submit -> worker first batch
(JVM scheduling + runner setup + worker dispatch); gap B = worker compute;
gap C = worker done -> driver return (result path).  Also A/B tests:
worker reuse off, local[4], spark.sql.execution.arrow settings.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_session(master, extra):
    from clinical_trial_searchengine_spark.session import get_spark

    spark = get_spark(
        app_name="ctse-probe-floor3", master=master, shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false", **extra},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyarrow as pa

    df1 = spark.range(0, 64, 1, 1).persist()
    df1.count()

    def ak(it):
        t_in = time.time()
        first = None
        n = 0
        for b in it:
            if first is None:
                first = time.time()
            n += b.num_rows
        t_out = time.time()
        yield pa.RecordBatch.from_pydict(
            {"t_in": [t_in], "t_first": [first], "t_out": [t_out],
             "pid": [float(os.getpid())]}
        )

    pydf = df1.mapInArrow(
        ak, "t_in double, t_first double, t_out double, pid double"
    )
    pydf.collect()
    gaps = {"submit_to_worker_ms": [], "worker_ms": [], "return_ms": [],
            "total_ms": []}
    for _ in range(9):
        t0 = time.time()
        rows = pydf.collect()
        t1 = time.time()
        r = rows[0]
        gaps["submit_to_worker_ms"].append((r["t_in"] - t0) * 1e3)
        gaps["worker_ms"].append((r["t_out"] - r["t_in"]) * 1e3)
        gaps["return_ms"].append((t1 - r["t_out"]) * 1e3)
        gaps["total_ms"].append((t1 - t0) * 1e3)
    res = {k: round(statistics.median(v), 1) for k, v in gaps.items()}
    res["min_total_ms"] = round(min(gaps["total_ms"]), 1)
    spark.stop()
    return res


def main() -> None:
    out = {}
    out["local32_default"] = run_session("local[32]", {})
    out["local32_noreuse"] = run_session(
        "local[32]", {"spark.python.worker.reuse": "false"}
    )
    out["local4_default"] = run_session("local[4]", {})
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
