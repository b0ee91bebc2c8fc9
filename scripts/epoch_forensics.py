"""One instrumented scaling epoch with Spark event logs + per-stage forensics.

Runs the standard paired epoch (4:200k, 1:200k, 4:50k, 1:50k — big cells
first, best use of a quiet window) with ``spark.eventLog.enabled`` so the
per-task metrics behind every stage wall are auditable.  Results min-merge
into BENCH/cluster_cells.json and append to BENCH/cluster_epochs.jsonl
exactly like the campaign runner; the parsed task-level breakdown is
printed so tokenize/postings scaling losses can be attributed (task CPU vs
scheduler gap vs stage-boundary serial time) instead of guessed at.

Usage: python scripts/epoch_forensics.py [--cells 4:200000,1:200000,...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cluster_scaling import (  # noqa: E402
    REPO,
    _corpus_dir,
    _spark_env,
    _submit_cmd,
    load1,
    make_zip,
    materialize_corpora,
    min_merge,
    start_cluster,
)

EVDIR = "/tmp/ctse_eventlogs"


def run_cell_logged(n_execs: int, n_docs: int) -> dict | None:
    os.makedirs(EVDIR, exist_ok=True)
    before = set(os.listdir(EVDIR))
    index_dir = f"/dev/shm/ctse_fx_idx_{n_execs}_{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    cmd = _submit_cmd(n_execs, [
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir=file://{EVDIR}",
        os.path.join(REPO, "scripts", "submit_build.py"),
        "--input", _corpus_dir(n_docs),
        "--index-dir", index_dir,
        "--shard-size", "50000",
        "--hot-df-threshold", str(max(1000, n_docs // 10)),
    ])
    # (the eventLog --conf pairs sit at the head of the tail, before the
    # app script, as spark-submit requires)
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env=_spark_env(), cwd=REPO, timeout=3600)
    wall = time.time() - t0
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    shutil.rmtree(index_dir, ignore_errors=True)
    shutil.rmtree(f"/dev/shm/ctse_spark_{os.getpid()}", ignore_errors=True)
    if not lines:
        print("cell failed:", out.stderr[-1500:], flush=True)
        return None
    meta = json.loads(lines[-1])
    sec = round(meta["build_seconds"], 2)
    new = [f for f in set(os.listdir(EVDIR)) - before
           if not f.endswith(".inprogress")]
    return {
        "executors": n_execs, "n_docs": n_docs, "build_sec": sec,
        "build_docs_per_sec": round(n_docs / sec, 1),
        "submit_wall_sec": round(wall, 2),
        "stage_sec": meta.get("stage_seconds"),
        "eventlog": os.path.join(EVDIR, new[0]) if new else None,
    }


def _stage(stages: dict, sid: int) -> dict:
    return stages.setdefault(sid, {
        "name": "", "wall": 0.0, "tasks": 0,
        "sum": 0.0, "max": 0.0, "cpu": 0.0, "gc": 0.0,
        "sched_delay": 0.0, "deser": 0.0, "fetch": 0.0,
        "input_mb": 0.0, "shuffle_w_mb": 0.0,
    })


def parse_eventlog(path: str) -> dict:
    """Stage-level rollup: wall, task-time sum, max task, input, shuffle,
    python-worker-ish metrics, plus inter-job serial gaps."""
    stages = {}
    jobs = []
    app_start = app_end = None
    if os.path.isdir(path):  # rolling event log (eventlog_v2_<app>/)
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if "events_" in f
        )
    else:
        parts = [path]

    def _lines():
        for p in parts:
            if p.endswith(".zstd"):
                # streaming-framed zstd: pyarrow's one-shot decompress can't
                # take it (unknown content size), shell out to the CLI
                out = subprocess.run(
                    ["unzstd", "-c", p], capture_output=True, text=True,
                    check=True,
                )
                yield from out.stdout.splitlines()
            else:
                with open(p) as f:
                    yield from f

    for line in _lines():
        if True:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                jobs.append({
                    "id": ev["Job ID"],
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", "")[:80],
                })
            elif e == "SparkListenerJobEnd":
                for j in jobs:
                    if j["id"] == ev["Job ID"]:
                        j["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = _stage(stages, si["Stage ID"])
                st["name"] = si["Stage Name"].split("\n")[0][:70]
                st["wall"] = (si.get("Completion Time", 0)
                              - si.get("Submission Time", 0)) / 1000
                st["tasks"] = si["Number of Tasks"]
            elif e == "SparkListenerTaskEnd":
                st = _stage(stages, ev["Stage ID"])
                ti = ev.get("Task Info", {})
                # Spark 4 event logs carry task metrics as
                # internal.metrics.* accumulable updates on Task Info
                acc = {
                    a["Name"]: a.get("Update", 0)
                    for a in ti.get("Accumulables", [])
                    if a.get("Internal")
                }
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
                st["sum"] += dur
                st["max"] = max(st["max"], dur)
                st["cpu"] += acc.get("internal.metrics.executorCpuTime", 0) / 1e9
                st["gc"] += acc.get("internal.metrics.jvmGCTime", 0) / 1000
                deser = acc.get(
                    "internal.metrics.executorDeserializeTime", 0) / 1000
                st["deser"] += deser
                run = acc.get("internal.metrics.executorRunTime", 0) / 1000
                st["sched_delay"] += max(0.0, dur - run - deser)
                st["input_mb"] += acc.get(
                    "internal.metrics.input.bytesRead", 0) / 1e6
                st["shuffle_w_mb"] += acc.get(
                    "internal.metrics.shuffle.write.bytesWritten", 0) / 1e6
    # serial gap: time not covered by any job
    jobs.sort(key=lambda j: j["start"])
    covered = 0.0
    cursor = None
    for j in jobs:
        if "end" not in j:
            continue
        s, en = j["start"], j["end"]
        if cursor is None or s > cursor:
            cursor = cursor if cursor is not None else s
        covered += max(0, en - max(s, cursor))
        cursor = max(cursor, en)
    total = (app_end - app_start) / 1000 if app_start and app_end else None
    return {"stages": stages, "jobs": jobs,
            "app_sec": total,
            "job_covered_sec": covered / 1000,
            "serial_gap_sec": (total - covered / 1000) if total else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="4:200000,1:200000,4:50000,1:50000")
    ap.add_argument("--merge", action="store_true",
                    help="min-merge results into the campaign history")
    args = ap.parse_args()
    materialize_corpora()
    make_zip()
    start_cluster()
    results = {}
    for cell in args.cells.split(","):
        e, n = map(int, cell.split(":"))
        print(f"=== cell {e}:{n} load1={load1():.2f}", flush=True)
        got = run_cell_logged(e, n)
        if not got:
            continue
        results[cell] = got
        print(json.dumps({k: v for k, v in got.items() if k != "eventlog"}),
              flush=True)
        if args.merge:
            min_merge(got)
    for cell, got in results.items():
        if not got.get("eventlog"):
            continue
        fx = parse_eventlog(got["eventlog"])
        print(f"\n### forensics {cell}  app={fx['app_sec']}s "
              f"serial_gap={fx['serial_gap_sec']:.1f}s")
        big = sorted(fx["stages"].items(), key=lambda kv: -kv[1]["wall"])[:12]
        for sid, st in big:
            if st["wall"] < 0.5:
                continue
            print(f"  stage {sid:>4} wall={st['wall']:6.1f}s sum={st['sum']:7.1f}s "
                  f"max={st['max']:5.1f}s cpu={st['cpu']:7.1f}s gc={st['gc']:4.1f}s "
                  f"sched={st['sched_delay']:5.1f}s in={st['input_mb']:6.0f}MB "
                  f"shw={st['shuffle_w_mb']:5.0f}MB t={st['tasks']:3d} {st['name']}")
    print("\nforensic eventlogs kept in", EVDIR)


if __name__ == "__main__":
    main()
