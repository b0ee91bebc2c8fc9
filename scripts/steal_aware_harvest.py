"""Steal-aware quiet-window harvester for the 4-executor build cells.

/proc/loadavg cannot see hypervisor steal (co-tenant VMs), which is the
actual noise source on this host — so gate cell launches on the measured
STEAL fraction from /proc/stat instead.  Fires the big cell first (best
use of a window), min-merges into BENCH/cluster_cells.json.

Usage: python scripts/steal_aware_harvest.py [--minutes M] [--steal-max S]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cluster_scaling import (  # noqa: E402
    make_zip,
    materialize_corpora,
    min_merge,
    report,
    run_cell,
    start_cluster,
)


def _cpu():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def steal_frac(window_s: float = 8.0) -> float:
    a = _cpu()
    time.sleep(window_s)
    b = _cpu()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return d[7] / tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=45)
    ap.add_argument("--steal-max", type=float, default=0.025)
    ap.add_argument("--executors", type=int, default=4)
    args = ap.parse_args()
    materialize_corpora()
    make_zip()
    start_cluster()
    deadline = time.time() + args.minutes * 60
    while time.time() < deadline:
        s = steal_frac()
        if s > args.steal_max:
            print(f"steal {s:.3f} > {args.steal_max}; waiting", flush=True)
            time.sleep(45)
            continue
        for n in (200_000, 50_000):
            got = run_cell(args.executors, n)
            if got:
                min_merge(got)
                print(
                    f"steal={s:.3f} {args.executors}:{n} -> "
                    f"{got['build_sec']}s {got.get('stage_sec')}",
                    flush=True,
                )
    report()


if __name__ == "__main__":
    main()
