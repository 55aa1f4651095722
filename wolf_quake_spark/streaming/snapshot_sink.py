"""Structured Streaming sink into the snapshot table — exactly-once.

``foreachBatch`` gives at-least-once epoch delivery: a crash between the
sink write and the streaming checkpoint commit replays the epoch on
restart.  The classic transactional-sink fix (Structured Streaming docs,
"foreachBatch idempotent writes") is a (stream, epoch) ledger committed
ATOMICALLY with the sink write; ``plans/snapshots.py`` carries that ledger
inside the snapshot log (``stream_epochs``, written in the same
tmp+rename metadata commit as the snapshot itself), so a replayed epoch is
detected and skipped — each micro-batch lands in the table exactly once
across any number of restarts.

Two sink modes:

* ``append`` — each epoch is an Iceberg fast append (no existing file
  read); the table is the raw landing history.
* ``merge``  — each epoch upserts by the table key via the copy-on-write
  MERGE (late fixups overwrite earlier turns); per-epoch cost tracks the
  files the epoch's keys touch, not the table size.

Readers (``read_snapshot``) see only fully-committed epochs — snapshot
isolation for free; downstream consumers can tail commits via the
snapshot log's monotone ids.

Reference parity: beyond-reference surface (the reference is strictly
batch, reference/src/main.rs:31-39); north-rule Iceberg framing.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from wolf_quake_spark.data_model import TRANSCRIPTS_SCHEMA
from wolf_quake_spark.plans import snapshots as sn


def make_snapshot_sink(
    spark: SparkSession,
    table_dir: str,
    key_cols: list[str],
    mode: str = "append",
    stream_name: str = "transcripts",
    branch: str | None = None,
):
    """Build the ``foreachBatch`` function.  Exposed separately from
    :func:`run_stream_to_snapshot` so tests can drive replayed epochs
    directly (the crash window is not reproducible from the happy path).

    ``branch`` lands every epoch on that writable ref instead of main —
    the audited streaming backfill: drain a correction stream onto a
    branch (exactly-once per epoch as usual), validate the branch head,
    then ``fast_forward`` main in one atomic pointer flip.  The table
    (and the branch) must already exist in branch mode."""
    if mode not in ("append", "merge"):
        raise ValueError(f"unknown sink mode {mode!r}")

    def process(df: DataFrame, epoch_id: int) -> None:
        # bounded commit retry (the Iceberg discipline): a maintenance job
        # (gc, rewrite, expire) briefly holding the table's writer lock
        # must delay the epoch, not fail the whole streaming query
        for attempt in range(6):
            state = sn._load(table_dir)
            if state["stream_epochs"].get(stream_name, -1) >= epoch_id:
                return  # replayed epoch — its snapshot already committed
            epoch = (stream_name, int(epoch_id))
            try:
                if state["current_id"] is None and not state["snapshots"]:
                    if branch is not None:
                        raise ValueError(
                            "branch-targeted sink needs an existing table"
                        )
                    sn.create_table(df, table_dir, key_cols, stream_epoch=epoch)
                elif mode == "merge":
                    sn.merge_cow(
                        spark, table_dir, df, stream_epoch=epoch, branch=branch
                    )
                else:
                    sn.append(df, table_dir, stream_epoch=epoch, branch=branch)
                return
            except sn.CommitConflict:
                if attempt == 5:
                    raise
                time.sleep(0.2 * (attempt + 1))

    return process


def run_stream_to_snapshot(
    spark: SparkSession,
    input_path: str,
    table_dir: str,
    key_cols: list[str],
    mode: str = "append",
    stream_name: str = "transcripts",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    branch: str | None = None,
) -> dict:
    """Drain the landing zone (availableNow) into the snapshot table and
    return the resulting snapshot-log state.  Restartable: the streaming
    checkpoint skips already-ingested files, and the epoch ledger makes a
    replayed trailing epoch a no-op."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)
    query = (
        stream.writeStream.foreachBatch(
            make_snapshot_sink(
                spark, table_dir, key_cols, mode, stream_name, branch
            )
        )
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(table_dir, "_stream_checkpoint"),
        )
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return sn._load(table_dir)
