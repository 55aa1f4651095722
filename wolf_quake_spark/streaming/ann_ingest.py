"""Structured Streaming ingest into the materialized IVFADC index —
exactly-once.

The embedding firehose of a production corpus (new documents embedded
upstream, landed as parquet) drains into the index via ``foreachBatch``:
each micro-batch is encoded against the FROZEN cells and codebooks
(:func:`analysis.ann_index.ivfpq_index_append_epoch` — no retraining on
the ingest path) into an epoch-scoped code table, with the (stream,
epoch) ledger committed atomically in the index meta.  ``foreachBatch``
delivery is at-least-once; the ledger makes a replayed epoch a no-op and
a half-written epoch dir is reader-invisible until its commit, so every
vector lands exactly once across restarts.  Searches see main codes +
committed epochs; ``ivfpq_index_compact`` is the maintenance action that
folds epochs back into one table.

Same transactional-sink shape as ``streaming/snapshot_sink.py`` (the
Structured Streaming "foreachBatch idempotent writes" recipe), applied to
the ANN index instead of the snapshot table.

Reference parity: beyond-reference surface (the reference is strictly
batch, reference/src/main.rs:31-39).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from wolf_quake_spark.analysis import ann_index as ai


def make_ann_sink(
    spark: SparkSession,
    index_dir: str,
    stream_name: str = "embeddings",
    vec_col: str = "embedding",
):
    """Build the ``foreachBatch`` function — exposed separately so tests
    can drive replayed epochs directly (the crash window is not
    reproducible from the happy path)."""

    def process(df: DataFrame, epoch_id: int) -> None:
        ai.ivfpq_index_append_epoch(
            spark,
            index_dir,
            df,
            int(epoch_id),
            stream_name=stream_name,
            vec_col=vec_col,
        )

    return process


def run_stream_to_ann_index(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    stream_name: str = "embeddings",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> dict:
    """Drain the embedding landing zone (availableNow) into the index and
    return the index meta.  Restartable: the streaming checkpoint skips
    already-ingested files and the epoch ledger no-ops a replayed
    trailing epoch.  The index must already exist (built once; ingest
    never retrains)."""
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)
    query = (
        stream.writeStream.foreachBatch(
            make_ann_sink(spark, index_dir, stream_name, vec_col)
        )
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint"),
        )
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return ai._load_meta(index_dir)
