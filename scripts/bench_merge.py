"""Copy-on-write MERGE evidence for the snapshot table layer.

Builds a snapshot table of N rows split across F data files (deterministic
synthetic transcripts-shaped rows), then merges a small update batch whose
keys all live in ONE file, and compares against the naive alternative — a
full-table overwrite upsert — at the same row count.

The at-scale claim: COW merge cost tracks the AFFECTED files (file-level
pruning via a broadcast semi-join over key tuples), not the table size, so
merging 10^5 late fixups into a 10^12-turn table rewrites a handful of
files.  Usage: python scripts/bench_merge.py [n_rows] [n_files]
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
    from pyspark.sql.functions import broadcast

    from wolf_quake_spark.plans import snapshots as sn
    from wolf_quake_spark.session import build_session

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    spark = build_session("wqs-merge-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def mk_rows(ids):
        # zero-padded conv ids: lexical order == numeric order, so footer
        # min/max stats prune on a key-clustered layout (the layout the
        # pipeline's own conv-partitioned writers produce); ~400-byte text
        # payload so rewrite cost reflects realistic row width
        return ids.select(
            F.concat(
                F.lit("conv-"),
                F.lpad((F.col("id") / 100).cast("long").cast("string"), 9, "0"),
            ).alias("conv_id"),
            (F.col("id") % 100).cast("int").alias("turn_idx"),
            F.concat(
                F.lit("turn text payload "),
                F.col("id").cast("string"),
                F.lit(" " + "lorem ipsum dolor sit amet " * 14),
            ).alias("text"),
        )

    base = tempfile.mkdtemp(prefix="wqs_merge_")
    tbl = os.path.join(base, "tbl")
    try:
        # range-partition by id so each file holds one contiguous id range —
        # update keys drawn from the first range hit one file (± boundary)
        df = mk_rows(spark.range(n_rows).repartitionByRange(n_files, "id"))
        sn.create_table(df, tbl, ["conv_id", "turn_idx"])
        n_data_files = len(sn.snapshot_files(tbl, sn._load(tbl)["snapshots"][-1]["id"]))

        # update batch: 1000 keys from the FIRST id range (one file's worth)
        upd = mk_rows(spark.range(1000)).withColumn(
            "text", F.concat(F.col("text"), F.lit(" [fixed]"))
        )
        t0 = time.time()
        rep = sn.merge_cow(spark, tbl, upd)
        t_cow = time.time() - t0

        # naive alternative at the same scale: full-table overwrite upsert
        naive_dir = os.path.join(base, "naive")
        full = sn.read_snapshot(spark, tbl)
        t0 = time.time()
        (
            full.join(broadcast(upd.select("conv_id", "turn_idx")),
                      ["conv_id", "turn_idx"], "left_anti")
            .unionByName(upd)
            .write.mode("overwrite")
            .parquet(naive_dir)
        )
        t_naive = time.time() - t0

        n_after = sn.read_snapshot(spark, tbl).count()
        print(json.dumps({
            "n_rows": n_rows,
            "data_files": n_data_files,
            "files_rewritten": rep["rewritten"],
            "files_kept": rep["kept"],
            "files_stats_pruned": rep["stats_pruned"],
            "cow_merge_sec": round(t_cow, 2),
            "full_rewrite_sec": round(t_naive, 2),
            "speedup": round(t_naive / t_cow, 2),
            "rows_after": n_after,
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
