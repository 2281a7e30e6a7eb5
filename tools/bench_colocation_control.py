"""Host co-location inflation control (VERDICT r3 #4).

The sharded-mode scaling measurement runs 4 co-located single-core shard
processes against 1; its raw efficiency (0.76-0.79) was attributed to
shared-socket memory-bandwidth/LLC contention via jiffy-counter CPU
accounting (1.22x CPU inflation). This control measures the SAME
1-vs-4-pinned-processes inflation for a workload that is pure
memory-bandwidth — a large out-of-cache numpy triad (copy + scale + sum
over buffers far bigger than LLC) with zero I/O, zero JVM, zero shuffle —
so the host's intrinsic co-location penalty is bracketed independently of
the engine. If the engine's inflation is within the control's, the
sharded gap is the socket, not the code.

Method (BENCH/NOISE_r03.md rules): taskset-pinned, interleaved
solo/co-located reps (solo, 4x, solo, 4x, ...), min-of-reps per process,
idle host required.

Usage: python tools/bench_colocation_control.py [reps] [mb_per_buffer]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

# Bracketing workloads, all pinned 1-vs-4 processes:
#   membw   — out-of-cache streaming triad (512 MB buffers): pure DRAM
#             bandwidth, no reuse (measures the memory-channel ceiling).
#   llc     — LLC-sized working set WITH reuse (2x24 MB buffers): fits
#             the shared last-level cache solo, thrashes it 4-way — the
#             contention mode that actually hits cache-friendly engines.
#   compute — in-L2 numpy kernel (1 MB buffer, many passes): best case
#             (~1.0x expected); validates the pinning itself.
# The engine's measured 1.22x is read against these brackets.
_WORKLOADS = {
    "membw": {"mb": 512, "passes": 20},
    # host L3 = 260 MiB shared: 2x64 MB buffers fit solo, thrash 4-way
    "llc": {"mb": 64, "passes": 120},
    "compute": {"mb": 1, "passes": 6000},
}

_WORKER = r"""
import sys, time
import numpy as np
mb = int(sys.argv[1]); passes = int(sys.argv[2])
n = mb * 1024 * 1024 // 8
a = np.arange(n, dtype=np.float64)
b = np.empty_like(a)
np.multiply(a, 1.0000001, out=b)  # untimed warm pass: fault every page in
t0 = time.perf_counter()
acc = 0.0
for _ in range(passes):
    np.multiply(a, 1.0000001, out=b)   # stream read a, write b
    acc += float(b[:: max(1, n // 64)].sum())
print(time.perf_counter() - t0)
"""


def run_pinned(cores: list[int], mb: int, passes: int) -> list[float]:
    """One worker per core, started together; returns per-process seconds."""
    procs = []
    for c in cores:
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(c), sys.executable, "-c", _WORKER,
                 str(mb), str(passes)],
                stdout=subprocess.PIPE, text=True,
            )
        )
    out = []
    for p in procs:
        stdout, _ = p.communicate()
        out.append(float(stdout.strip().splitlines()[-1]))
    return out


def measure(mb: int, passes: int) -> dict:
    solo_times: list[float] = []
    colo_times: list[list[float]] = []
    for _ in range(REPS):  # interleaved pairs
        solo_times.append(run_pinned([0], mb, passes)[0])
        colo_times.append(run_pinned([0, 1, 2, 3], mb, passes))
        time.sleep(1)
    solo = min(solo_times)
    colo_mean = [statistics.mean(ts) for ts in colo_times]
    colo = min(colo_mean)
    return {
        "inflation_x": round(colo / solo, 3),
        "mb_per_buffer": mb,
        "passes": passes,
        "solo_sec": round(solo, 3),
        "colocated_mean_sec": round(colo, 3),
        "solo_all": [round(t, 3) for t in solo_times],
        "colocated_means": [round(t, 3) for t in colo_mean],
    }


def main() -> None:
    results = {
        name: measure(w["mb"], w["passes"]) for name, w in _WORKLOADS.items()
    }
    out = {
        "metric": "colocation_inflation_x",
        "value": results["membw"]["inflation_x"],
        "unit": "x",
        "reps": REPS,
        "workloads": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
