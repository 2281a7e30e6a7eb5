"""Interleaved A/B of the postings-encoder generations on the 600k scaling
corpus: version A = a git worktree (e.g. the round-3 judge commit, whole-
partition mapInPandas kernel), version B = HEAD (JVM-sorted shuffle +
streaming mapInArrow kernel + batch coalescer). Reuses bench_scaling's
WORKER (public API only: synthesize -> warm -> timed build -> queries),
pinned to the same 4 cores, alternating A,B,A,B so each pair samples the
same host-noise window (the NOISE_r03 methodology).

Usage: python tools/ab_encoder.py <worktree_A> <pairs> [out.jsonl]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import bench_scaling as bs  # noqa: E402


def run_in(cwd: str, cpus: int = 4, n_docs: int = 600_000) -> dict:
    cmd = bs._pin([sys.executable, "-c", bs.WORKER, str(cpus), str(n_docs)], cpus)
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=cwd, timeout=3000)
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise RuntimeError(f"no JSON from worker in {cwd}: {p.stderr[-2000:]}")


def main() -> None:
    wt_a = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/dev/stdout"
    with open(out_path, "a") as out:
        for rep in range(1, pairs + 1):
            for ver, cwd in (("A", wt_a), ("B", "/root/repo")):
                t0 = time.time()
                res = run_in(cwd)
                rec = {"rep": rep, "ver": ver, "cwd": cwd,
                       "wall": round(time.time() - t0, 1), "res": res}
                out.write(json.dumps(rec) + "\n")
                out.flush()
                print(json.dumps({k: rec[k] for k in ("rep", "ver")} |
                                 {"build_sec": res["build_sec"],
                                  "postings": res["stages"].get("postings")}),
                      flush=True)


if __name__ == "__main__":
    main()
