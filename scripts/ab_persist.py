"""One-off A/B: 4-executor 200k build cell with vs without persist_input.

With keys-only doc_id assignment the corpus persist is no longer needed by
the assign stage (only keys shuffle twice, column-pruned); the content
passes (tokenize, doc_meta/sha) may be cheaper re-scanning /dev/shm parquet
than paying a full MEMORY_AND_DISK materialization.  Measures both."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import cluster_scaling as cs  # noqa: E402


def run(n_execs, n_docs, extra, tag):
    index_dir = f"/dev/shm/ctse_ab_idx_{tag}_{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    cmd = cs._submit_cmd(n_execs, [
        os.path.join(cs.REPO, "scripts", "submit_build.py"),
        "--input", cs._corpus_dir(n_docs),
        "--index-dir", index_dir,
        "--shard-size", "50000",
        "--hot-df-threshold", str(max(1000, n_docs // 10)),
    ] + extra)
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env=cs._spark_env(), cwd=cs.REPO, timeout=3600)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    shutil.rmtree(index_dir, ignore_errors=True)
    shutil.rmtree(f"/dev/shm/ctse_spark_{os.getpid()}", ignore_errors=True)
    if not lines:
        print("FAIL", tag, out.stderr[-500:], flush=True)
        return None
    meta = json.loads(lines[-1])
    return {
        "build_sec": round(meta["build_seconds"], 2),
        "stage_sec": meta.get("stage_seconds"),
        "wall": round(time.time() - t0, 1),
    }


def main():
    cs.materialize_corpora()
    cs.make_zip()
    cs.start_cluster()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for i in range(rounds):
        a = run(4, n, ["--no-persist-input"], "np")
        print(f"round {i} no-persist 4:{n}:", json.dumps(a), flush=True)
        b = run(4, n, [], "p")
        print(f"round {i} persist    4:{n}:", json.dumps(b), flush=True)


if __name__ == "__main__":
    main()
