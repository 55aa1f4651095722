"""Scan-pruning evidence for the emulated-Iceberg table layer.

Builds a day×bucket hidden-partitioned events table (synthetic,
deterministic), then measures:

* range query via ``pruned_read`` (manifest min/max) vs full scan+filter
* point lookup via ``bloom_point_lookup`` (per-partition Bloom sidecar)
  vs full scan+filter

Reports partitions read, rows scanned, and wall seconds for each — the
at-scale claim being that pruned cost tracks the SELECTED data, not the
table size.  Usage: python scripts/bench_pruning.py [n_rows] [n_days]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from wolf_quake_spark.plans.bloom_index import (
        bloom_point_lookup,
        build_bloom_index,
    )
    from wolf_quake_spark.plans.partition_transforms import (
        PartitionSpec,
        bucket,
        days,
        pruned_read,
        write_hidden_partitioned,
    )
    from wolf_quake_spark.session import build_session

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    spark = build_session("wqs-prune-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1767225600) + (F.col("id") % n_days) * 86400 + F.col("id") % 86400
        ).alias("ts"),
        F.concat(F.lit("conv-"), (F.xxhash64("id") % 500_000).cast("string")).alias(
            "conv_id"
        ),
        (F.col("id") % 1000).alias("value"),
    )

    out = tempfile.mkdtemp(prefix="wqs_prune_")
    tbl = os.path.join(out, "tbl")
    try:
        t0 = time.monotonic()
        write_hidden_partitioned(
            df,
            tbl,
            [
                PartitionSpec("day", "ts", days("ts")),
                PartitionSpec("cb", "conv_id", bucket(4, "conv_id")),
            ],
        )
        t_write = time.monotonic() - t0
        t0 = time.monotonic()
        build_bloom_index(spark, tbl, "conv_id", bits_per_row=10, k=5)
        t_bloom = time.monotonic() - t0

        def timed(thunk):
            t0 = time.monotonic()
            n = thunk()
            return round(time.monotonic() - t0, 3), n

        # range: 2 of n_days days
        lo, hi = "2026-01-05 00:00:00", "2026-01-06 23:59:59"
        full = spark.read.parquet(tbl)
        t_full_range, n_full = timed(
            lambda: full.where(F.col("ts").between(lo, hi)).count()
        )
        got, rep = pruned_read(spark, tbl, "ts", lo, hi)
        t_pruned_range, n_pruned = timed(got.count)
        assert n_full == n_pruned

        # point lookup on one conv_id
        key = df.where(F.col("event_id") == 12345).collect()[0]["conv_id"]
        t_full_pt, n_full_pt = timed(
            lambda: full.where(F.col("conv_id") == key).count()
        )
        gpt, rep_pt = bloom_point_lookup(spark, tbl, "conv_id", key)
        t_bloom_pt, n_bloom_pt = timed(gpt.count)
        assert n_full_pt == n_bloom_pt

        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "n_days": n_days,
                    "partitions_total": rep["partitions_total"],
                    "write_secs": round(t_write, 3),
                    "bloom_build_secs": round(t_bloom, 3),
                    "range": {
                        "rows": n_full,
                        "full_scan_secs": t_full_range,
                        "pruned_secs": t_pruned_range,
                        "partitions_read": rep["partitions_read"],
                    },
                    "point": {
                        "rows": n_full_pt,
                        "full_scan_secs": t_full_pt,
                        "bloom_secs": t_bloom_pt,
                        "partitions_read": rep_pt["partitions_read"],
                    },
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
