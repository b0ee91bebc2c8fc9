"""Round-6 probe: event-log decomposition of a full index build.

Runs ONE build at --n-docs with the event log on, then prints per-stage
wall / task-time sums / GC, ordered by wall, plus the build's own
stage_seconds ticks.  (guide §1 / §7.1: find where the 31 s of
postings_write actually go.)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.session import get_spark
    from clinical_trial_searchengine_spark.sources.corpus import (
        generate_corpus_df,
    )

    log_dir = "/tmp/ctse_eventlog_build"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir)
    spark = get_spark(
        app_name="ctse-probe-build", master="local[32]",
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
    corpus_dir = f"/tmp/ctse_bench_corpus_{n_docs}"
    if not os.path.exists(corpus_dir):
        generate_corpus_df(spark, n_docs, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    idx = f"/tmp/ctse_probe_build_{n_docs}"
    # warm build (codegen/JIT) then the measured one, mirroring bench.py
    shutil.rmtree(idx, ignore_errors=True)
    SearchEngine(spark, idx).build(corpus.limit(2000), mode="standard",
                                   shard_size=1024)
    shutil.rmtree(idx, ignore_errors=True)
    import time

    t0 = time.time()
    meta = SearchEngine(spark, idx).build(
        corpus, mode="standard", shard_size=max(4096, n_docs // 8),
        hot_df_threshold=max(1000, n_docs // 10),
    )
    wall = time.time() - t0
    spark.stop()

    cand = glob.glob(log_dir + "/*")
    evf = [p for p in cand if os.path.isfile(p)][0]
    stages = {}
    with open(evf) as f:
        for line in f:
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                d = stages.setdefault(sid, {"tasks": 0, "task_ms": 0,
                                            "gc_ms": 0})
                d["name"] = si["Stage Name"].split("\n")[0][:90]
                d["wall_ms"] = si.get("Completion Time", 0) - si.get(
                    "Submission Time", 0
                )
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                d = stages.setdefault(sid, {"tasks": 0, "task_ms": 0,
                                            "gc_ms": 0})
                tm = e.get("Task Metrics") or {}
                d["tasks"] += 1
                d["task_ms"] += tm.get("Executor Run Time", 0)
                d["gc_ms"] += tm.get("JVM GC Time", 0)
    print(json.dumps({"build_wall_s": round(wall, 1),
                      "stage_seconds": meta.get("stage_seconds")}))
    rows = sorted(stages.items(), key=lambda kv: -kv[1].get("wall_ms", 0))
    for sid, d in rows[:18]:
        print(
            f"stage {sid:3d} wall={d.get('wall_ms', 0)/1e3:7.2f}s "
            f"tasks={d['tasks']:4d} taskSum={d['task_ms']/1e3:8.1f}s "
            f"gc={d['gc_ms']/1e3:6.1f}s  {d.get('name', '?')}"
        )


if __name__ == "__main__":
    main()
