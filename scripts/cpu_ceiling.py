"""Measure this machine's parallel-capacity ceiling for the scaling bench.

Runs an embarrassingly parallel, shuffle-free, pure-CPU workload (sha256
over a cache-resident buffer) at the same two pinned core budgets as
scripts/bench_scaling.py and reports the throughput ratio.  A virtualized /
shared host does not deliver 4x the throughput at 4x the cores even for
perfect workloads; the job's scaling efficiency should be read against this
ceiling.

Usage: python scripts/cpu_ceiling.py [--low 8 --high 32 --reps 3]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

CHILD = """
import hashlib
d = b'x' * 65536
for i in range(60000):
    hashlib.sha256(d).digest()
"""


def measure(procs: int, pin: bool) -> float:
    cmd = [sys.executable, "-c", CHILD]
    if pin:
        cmd = ["taskset", "-c", f"0-{procs - 1}"] + cmd
    t0 = time.monotonic()
    ps = [subprocess.Popen(cmd) for _ in range(procs)]
    for p in ps:
        p.wait()
    return procs / (time.monotonic() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    lo = max(measure(args.low, True) for _ in range(args.reps))
    hi = max(measure(args.high, True) for _ in range(args.reps))
    ratio = args.high / args.low
    print(
        json.dumps(
            {
                "low_procs": args.low,
                "high_procs": args.high,
                "low_work_per_sec": round(lo, 3),
                "high_work_per_sec": round(hi, 3),
                "ceiling_efficiency": round((hi / lo) / ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
