"""Skew evidence: plain vs salted sessionization on a mega-conversation.

Generates a transcripts table dominated by one huge conversation (the north
rule's skew case), then times extract → sessionize → materialize through
both paths at the same parallelism.  The plain path's per-conv window
serializes the mega conv onto one task; the salted segmented scan spreads it
over n_turns/chunk_turns tasks.  Output: one JSON line.

Usage: python scripts/bench_skew.py [--cpus 32] [--mega 2000000] [--convs 8]
       [--chunk-turns 8192] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wolf_quake_spark.datagen import synth_transcripts
from wolf_quake_spark.operators import assign_games, assign_games_salted
from wolf_quake_spark.operators.extract_arrow import extract_events_arrow
from wolf_quake_spark.session import build_session


def materialize(df) -> float:
    t0 = time.monotonic()
    df.write.mode("overwrite").format("noop").save()
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--mega", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=8)
    ap.add_argument("--chunk-turns", type=int, default=8192)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument(
        "--input", default=None, help="existing transcripts dir (skip generation)"
    )
    args = ap.parse_args()

    spark = build_session(
        "wqs-bench-skew", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    path = args.input or f"/tmp/wqs_skew_{args.mega}_{args.convs}"
    if args.input is None:
        synth_transcripts(
            spark, n_convs=args.convs, lines_per_turn=4, seed=42, mega_factor=args.mega
        ).repartition(args.cpus, "conv_id").write.mode("overwrite").parquet(path)
    tr = spark.read.parquet(path)
    n_turns = tr.count()
    mega_turns = tr.filter(F.col("conv_id") == "conv-mega").count()

    from pyspark import StorageLevel

    # persist the extracted events so both paths time ONLY the sessionization
    # scan (the extract stage is embarrassingly parallel and identical in
    # both — see BENCH.md for its throughput)
    ev = extract_events_arrow(tr).persist(StorageLevel.DISK_ONLY)
    ev.write.mode("overwrite").format("noop").save()  # warm the cache
    plain, salted = [], []
    for _ in range(args.trials):
        salted.append(materialize(assign_games_salted(ev, args.chunk_turns)))
        plain.append(materialize(assign_games(ev)))
    bp, bs = min(plain), min(salted)
    print(
        json.dumps(
            {
                "metric": "sessionize-only secs on mega-conv input (cached events → window(s) → noop)",
                "cpus": args.cpus,
                "n_turns": n_turns,
                "mega_turns": mega_turns,
                "chunk_turns": args.chunk_turns,
                "plain_secs": round(bp, 2),
                "salted_secs": round(bs, 2),
                "speedup": round(bp / bs, 2),
                "plain_trials": [round(x, 2) for x in plain],
                "salted_trials": [round(x, 2) for x in salted],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
