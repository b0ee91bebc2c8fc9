"""Run 1-task python jobs in a tight loop for 120 s so an external jstack
can sample the JVM during the per-task gap."""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow as pa

    from clinical_trial_searchengine_spark.session import get_spark

    spark = get_spark(
        app_name="ctse-probe-loop", master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df1 = spark.range(0, 64, 1, 1).persist()
    df1.count()

    def ak(it):
        for b in it:
            yield pa.RecordBatch.from_pydict({"n": [b.num_rows]})

    pydf = df1.mapInArrow(ak, "n long")
    t_end = time.time() + 120
    n = 0
    while time.time() < t_end:
        pydf.collect()
        n += 1
    print("jobs:", n)
    spark.stop()


if __name__ == "__main__":
    main()
