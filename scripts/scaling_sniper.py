"""Load-aware scaling-cell runner for a noisy shared host.

The orchestrator (bench_scaling.py) runs all cells back-to-back, so a
co-tenant load wave poisons whole runs.  This helper fires ONE cell at a
time, only when the 1-minute load average is below a threshold, and
min-merges results into BENCH/scaling_cells.json (same format).  Run it for
a while, then `python scripts/bench_scaling.py --report-only` regenerates
BENCH/BASELINE.md from the accumulated minimums.

Usage: python scripts/scaling_sniper.py [max_minutes] [load_threshold]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(REPO, "BENCH", "scaling_cells.json")
CELLS = [(4, 200_000), (1, 200_000), (4, 50_000), (1, 50_000)]


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 60
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 0.7
    deadline = time.time() + max_minutes * 60
    i = 0
    while time.time() < deadline:
        if load1() > thresh:
            time.sleep(30)
            continue
        cpus, n = CELLS[i % len(CELLS)]
        i += 1
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "bench_scaling.py"),
             "--run", str(cpus), "--n-docs", str(n)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print("cell failed", cpus, n, out.stderr[-500:], flush=True)
            continue
        got = json.loads(lines[-1])
        cells = {}
        if os.path.exists(HIST):
            with open(HIST) as f:
                cells = json.load(f)
        key = f"{cpus}:{n}"
        prev = cells.get(key)
        if prev is None or got["build_sec"] < prev["build_sec"]:
            merged = dict(got)
            if prev and prev.get("queries_per_sec") and not got.get(
                "queries_per_sec"
            ):
                for f_ in ("queries_per_sec", "query_sec", "n_queries"):
                    merged[f_] = prev[f_]
            cells[key] = merged
        if (
            prev is not None
            and got.get("queries_per_sec")
            and got["queries_per_sec"] > (prev.get("queries_per_sec") or 0)
        ):
            for f_ in ("queries_per_sec", "query_sec", "n_queries"):
                cells[key][f_] = got[f_]
        os.makedirs(os.path.dirname(HIST), exist_ok=True)
        with open(HIST, "w") as f:
            json.dump(cells, f, indent=1)
        print(json.dumps({"cell": key, "build_sec": got["build_sec"],
                          "kept": cells[key]["build_sec"],
                          "load_after": load1()}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
