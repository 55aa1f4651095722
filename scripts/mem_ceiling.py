"""Measure this machine's MEMORY-BANDWIDTH ceiling for the scaling bench.

`cpu_ceiling.py` prices cpu-share contention with a cache-resident sha256
loop; this probe prices the other shared resource — the memory bus — with
a STREAM-style big-buffer copy that misses every cache level.  On a
single host, a 4-process run enjoys nearly the whole memory system while
a 16-process run shares it, so even a perfectly parallel memory-bound
job cannot show 4x throughput at 4x the processes; the pipeline's raw
4 -> 16 scaling efficiency should be read against THIS ceiling whenever
its per-core throughput is bandwidth-bound (the parse stage streams
parquet buffers, which is exactly that regime).  A real N -> 4N
EXECUTOR scale-up multiplies memory buses with the nodes — this
single-host artifact does not exist there.

Usage: python scripts/mem_ceiling.py [--low 4 --high 16 --reps 3]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

# 256 MiB per process: far past LLC, so every pass streams from DRAM.
CHILD = """
import numpy as np
a = np.ones(256 * 1024 * 1024 // 8, dtype=np.int64)
b = np.empty_like(a)
for i in range(40):
    np.copyto(b, a)
    a[0] += 1  # defeat any copy elision
"""


def measure(procs: int, pin: bool) -> float:
    cmd = [sys.executable, "-c", CHILD]
    if pin:
        cmd = ["taskset", "-c", ",".join(str(i) for i in range(procs))] + cmd
    t0 = time.monotonic()
    ps = [subprocess.Popen(cmd) for _ in range(procs)]
    for p in ps:
        p.wait()
    dt = time.monotonic() - t0
    return procs / dt  # child-runs per second = relative copied-bytes/s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    lo = max(measure(args.low, pin=True) for _ in range(args.reps))
    hi = max(measure(args.high, pin=True) for _ in range(args.reps))
    ratio = args.high / args.low
    out = {
        "low_procs": args.low,
        "high_procs": args.high,
        "low_work_per_sec": round(lo, 3),
        "high_work_per_sec": round(hi, 3),
        "ceiling_efficiency": round(hi / lo / ratio, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
