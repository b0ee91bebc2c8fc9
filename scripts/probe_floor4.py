"""Round-6 probe #4: event-log decomposition of the 1-task python job.

Parses the Spark event log for: job submit -> stage submit -> task launch
-> task finish -> job end, plus task metrics (executorDeserializeTime,
executorRunTime, resultSerializationTime).  Locates the 150 ms.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow as pa

    from clinical_trial_searchengine_spark.session import get_spark

    import shutil

    log_dir = "/tmp/ctse_eventlog"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        app_name="ctse-probe-floor4", master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df1 = spark.range(0, 64, 1, 1).persist()
    df1.count()

    def ak(it):
        for b in it:
            yield pa.RecordBatch.from_pydict({"n": [b.num_rows]})

    pydf = df1.mapInArrow(ak, "n long")
    pydf.collect()
    walls = []
    for _ in range(5):
        t0 = time.time()
        pydf.collect()
        walls.append((t0, time.time()))
    spark.stop()

    cand = glob.glob(log_dir + "/*/events_*") or glob.glob(log_dir + "/*")
    evf = [p for p in cand if os.path.isfile(p)][0]
    jobs = {}
    with open(evf) as f:
        for line in f:
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {"submit": e["Submission Time"]}
            elif ev == "SparkListenerStageSubmitted":
                pass
            elif ev == "SparkListenerTaskStart":
                j = max(jobs)
                jobs[j].setdefault("task_launch", []).append(
                    e["Task Info"]["Launch Time"]
                )
            elif ev == "SparkListenerTaskEnd":
                j = max(jobs)
                ti = e["Task Info"]
                tm = e.get("Task Metrics", {})
                jobs[j].setdefault("task_end", []).append(ti["Finish Time"])
                jobs[j].setdefault("metrics", []).append(
                    {
                        "deser_ms": tm.get("Executor Deserialize Time", 0),
                        "run_ms": tm.get("Executor Run Time", 0),
                        "result_ser_ms": tm.get("Result Serialization Time", 0),
                        "gc_ms": tm.get("JVM GC Time", 0),
                    }
                )
            elif ev == "SparkListenerJobEnd":
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
    # report the last 5 jobs (the timed collects)
    out = []
    for j in sorted(jobs)[-5:]:
        d = jobs[j]
        if "end" not in d or "task_launch" not in d:
            continue
        out.append(
            {
                "job": j,
                "submit_to_task_launch_ms": d["task_launch"][0] - d["submit"],
                "task_ms": d["task_end"][0] - d["task_launch"][0],
                "task_end_to_job_end_ms": d["end"] - d["task_end"][0],
                "metrics": d["metrics"][0],
            }
        )
    print(json.dumps(out, indent=1))
    print("walls_ms:", [round((b - a) * 1e3, 1) for a, b in walls])


if __name__ == "__main__":
    main()
