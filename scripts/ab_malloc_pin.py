"""A/B the scaling-cell MALLOC_* executorEnv pin on the real 4-exec cell.

The fresh malloc-pinned campaign's 4:50000 cells ran 87-156s where the
pre-pin campaign (BENCH/r4b) routinely landed 30-50s, while the 1-exec
cells matched history — i.e. the pin is suspected of HURTING the
multi-executor level (glibc env on the executor JVM serializes native
malloc across its service threads; pyarrow's own pool is jemalloc and
never sees glibc env anyway).  This script alternates 4:50k cells with
and without the three MALLOC_* confs (everything else identical) and
prints per-arm walls + the min-merge, so the cell config is decided by
measurement, not theory.

Usage: python scripts/ab_malloc_pin.py [reps]
"""

from __future__ import annotations

import json
import sys
import time

import cluster_scaling as cs

_ORIG_SUBMIT = cs._submit_cmd


def submit_no_pin(n_execs, tail):
    cmd = _ORIG_SUBMIT(n_execs, tail)
    # drop MALLOC conf pairs ("--conf spark.executorEnv.MALLOC...=v")
    cleaned = []
    skip = False
    for i, a in enumerate(cmd):
        if skip:
            skip = False
            continue
        if a == "--conf" and i + 1 < len(cmd) and cmd[i + 1].startswith(
            "spark.executorEnv.MALLOC"
        ):
            skip = True
            continue
        cleaned.append(a)
    assert len(cleaned) == len(cmd) - 6, (len(cleaned), len(cmd))
    return cleaned


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cs.materialize_corpora()
    cs.make_zip()
    cs.start_cluster()
    orig = _ORIG_SUBMIT
    results: dict[str, list[float]] = {"pin": [], "nopin": []}
    for rep in range(reps):
        for arm in ("pin", "nopin"):
            while cs.load1() > 0.8:
                time.sleep(20)
            cs._submit_cmd = orig if arm == "pin" else submit_no_pin
            got = cs.run_cell(4, 50_000)
            cs._submit_cmd = orig
            if got is None:
                continue
            results[arm].append(got["build_sec"])
            print(json.dumps({"rep": rep, "arm": arm,
                              "build_sec": got["build_sec"],
                              "stage_sec": got["stage_sec"]}), flush=True)
    print(json.dumps({
        "min_pin": min(results["pin"]) if results["pin"] else None,
        "min_nopin": min(results["nopin"]) if results["nopin"] else None,
        "all": results,
    }), flush=True)


if __name__ == "__main__":
    main()
