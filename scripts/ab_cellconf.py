"""A/B a candidate cell-config / job-flag change on the big scaling cells.

Variants are defined inline; each runs 4:200000 then 1:200000 with event
logs so the per-stage cpu/gc profile is comparable against the baseline
forensics.  Nothing min-merges into the campaign history — this is an
experiment harness; adopt a variant by changing cluster_scaling.py.

Usage: python scripts/ab_cellconf.py --variant nopersist_xms
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
    start_cluster,
)
from epoch_forensics import EVDIR, parse_eventlog  # noqa: E402

VARIANTS = {
    # drop BOTH content-sized columnar caches' build cost from the hot
    # path (persist_input=False: docs join re-scans parquet for doc_meta)
    "nopersist": {"extra_conf": [], "build_args": ["--no-persist-input"]},
    # pin executor heap at Xmx so 4 fresh JVMs don't each pay adaptive
    # heap-growth GC storms mid-build
    "xms": {
        "extra_conf": [
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xms12g",
        ],
        "build_args": [],
    },
    "nopersist_xms": {
        "extra_conf": [
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xms12g",
        ],
        "build_args": ["--no-persist-input"],
    },
    # jstack-motivated combo: skip BOTH columnar cache builders (input un-
    # persisted, pairs DISK_ONLY = UnsafeRow serialize), route pyarrow off
    # jemalloc onto glibc (whose mmap/trim pins the cell env already sets),
    # pre-fault the executor heap once at startup
    "leancache": {
        "extra_conf": [
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xms12g -XX:+AlwaysPreTouch",
            "--conf",
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
        ],
        "build_args": ["--no-persist-input", "--pairs-storage", "disk_only"],
    },
    # isolate the pairs-storage change alone
    "diskpairs": {
        "extra_conf": [],
        "build_args": ["--pairs-storage", "disk_only"],
    },
    # /proc forensics: executor JVMs burn more SYSTEM than user time (page
    # faults zeroing freshly-touched heap; this host's kernel page
    # allocator is slow and contends across executors).  Shrink the heap
    # to what a 1-core no-cache executor actually needs (3g), pin Xms=Xmx
    # so sizing is stable, and madvise the heap onto 2 MB transparent
    # hugepages (512x fewer faults).  AlwaysPreTouch was tried and is
    # catastrophic here (4x12g zeroed at ~35 MB/s: +218 s startup).
    "lean3": {
        "extra_conf": [
            "--conf", "spark.executor.memory=3g",
            "--conf", "spark.executor.memoryOverhead=2g",
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xms3g -XX:+UseTransparentHugePages",
            "--conf",
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
        ],
        "build_args": ["--no-persist-input", "--pairs-storage", "disk_only"],
    },
    # fully-fused single-pass build: NO pairs materialization at all
    # (tokenize streams into the encode shuffle), no input cache, modest
    # JVM page footprint -> minimal kernel page-allocator load
    "fused": {
        "extra_conf": [
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xms12g",
            "--conf",
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
        ],
        "build_args": ["--no-persist-input", "--pairs-storage", "none"],
    },
    # fused + tiny fixed young gen: allocation-heavy string stages then GC
    # over RE-USED eden pages instead of lazily faulting fresh ones (this
    # host's kernel page-zeroing collapses under multi-process concurrency
    # — the measured 8x task-CPU inflation of regex/sha stages at 4 JVMs)
    "fusedmn": {
        "extra_conf": [
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xmn512m -XX:-UseAdaptiveSizePolicy",
            "--conf",
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
        ],
        "build_args": ["--no-persist-input", "--pairs-storage", "none"],
    },
    # same but 1g young gen: the 512m eden showed 23.6 s of young-GC time
    # in the 4-exec encode/write stage — trade a little more one-time page
    # zeroing for fewer collections there
    "fusedmn1g": {
        "extra_conf": [
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xmn1g -XX:-UseAdaptiveSizePolicy",
            "--conf",
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
        ],
        "build_args": ["--no-persist-input", "--pairs-storage", "none"],
    },
    # lean3 with the standard 14g heap back (3g GC-thrashed: 48 s of GC in
    # the tokenize stage): THP alone to cut fault count, lazy faulting
    "lean4": {
        "extra_conf": [
            "--conf",
            "spark.executor.extraJavaOptions="
            "-XX:+UseParallelGC -XX:ParallelGCThreads=2 "
            "-XX:CICompilerCount=2 -Xms12g -XX:+UseTransparentHugePages",
            "--conf",
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
        ],
        "build_args": ["--no-persist-input", "--pairs-storage", "disk_only"],
    },
}


def run_cell(n_execs: int, n_docs: int, variant: dict) -> dict | None:
    os.makedirs(EVDIR, exist_ok=True)
    before = set(os.listdir(EVDIR))
    index_dir = f"/dev/shm/ctse_ab_idx_{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    cmd = _submit_cmd(n_execs, [
        *variant["extra_conf"],
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir=file://{EVDIR}",
        os.path.join(REPO, "scripts", "submit_build.py"),
        "--input", _corpus_dir(n_docs),
        "--index-dir", index_dir,
        "--shard-size", "50000",
        "--hot-df-threshold", str(max(1000, n_docs // 10)),
        *variant["build_args"],
    ])
    # later --conf duplicates override _submit_cmd's earlier ones
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
    new = [f for f in set(os.listdir(EVDIR)) - before
           if not f.endswith(".inprogress")]
    return {
        "build_sec": round(meta["build_seconds"], 2),
        "submit_wall_sec": round(wall, 2),
        "stage_sec": meta.get("stage_seconds"),
        "eventlog": os.path.join(EVDIR, new[0]) if new else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True, choices=sorted(VARIANTS))
    ap.add_argument("--cells", default="4:200000,1:200000")
    args = ap.parse_args()
    materialize_corpora()
    make_zip()
    start_cluster()
    v = VARIANTS[args.variant]
    for cell in args.cells.split(","):
        e, n = map(int, cell.split(":"))
        print(f"=== {args.variant} {cell} load1={load1():.2f}", flush=True)
        got = run_cell(e, n, v)
        if not got:
            continue
        print(json.dumps({k: w for k, w in got.items() if k != "eventlog"}),
              flush=True)
        if got.get("eventlog"):
            fx = parse_eventlog(got["eventlog"])
            print(f"  serial_gap={fx['serial_gap_sec']:.1f}s")
            for sid, st in sorted(fx["stages"].items(),
                                  key=lambda kv: -kv[1]["wall"])[:8]:
                if st["wall"] < 1:
                    continue
                print(f"  st{sid:>3} wall={st['wall']:6.1f} sum={st['sum']:7.1f}"
                      f" cpu={st['cpu']:7.1f} gc={st['gc']:4.1f}"
                      f" in={st['input_mb']:5.0f}MB shw={st['shuffle_w_mb']:4.0f}MB"
                      f" t={st['tasks']:3d}", flush=True)


if __name__ == "__main__":
    main()
