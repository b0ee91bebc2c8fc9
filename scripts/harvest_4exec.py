"""Targeted quiet-window harvest of the 4-executor build cells.

The 1-executor cells' min-merged history already reflects the keys-only
doc_id assignment (plans/build.py); the 4-executor cells' minimums predate
it.  Re-running ONLY the 4-exec cells in quiet windows re-balances the
min-merge so both levels measure the same code — a full paired epoch
spends ~3 min per iteration on 1-exec cells that cannot improve the
report.  Cells min-merge into BENCH/cluster_cells.json exactly like
cluster_scaling.py (same run_cell / min_merge).

Usage: python scripts/harvest_4exec.py [--iters N] [--load-threshold L]
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
    SIZES,
    load1,
    make_zip,
    materialize_corpora,
    min_merge,
    report,
    run_cell,
    start_cluster,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--load-threshold", type=float, default=1.3)
    ap.add_argument("--executors", type=int, default=4)
    args = ap.parse_args()
    materialize_corpora()
    make_zip()
    start_cluster()
    for i in range(args.iters):
        while load1() > args.load_threshold:
            time.sleep(20)
        for n in sorted(SIZES, reverse=True):  # big first: best window use
            got = run_cell(args.executors, n)
            if got:
                min_merge(got)
                print(f"iter {i} {args.executors}:{n} -> "
                      f"{got['build_sec']}s {got.get('stage_sec')}",
                      flush=True)
    report()


if __name__ == "__main__":
    main()
