"""Incremental ingest via Structured Streaming ``foreachBatch``.

The reference is strictly batch (one pass over a complete file,
src/main.rs:31-39) and the north_rule pins resumable *batch* — but a live
deployment tails a landing zone of transcript files.  This adapter is that
push-based path: a file-source ``readStream`` feeds each micro-batch through
the exact same ``run_batch`` body used by the resumable batch runner, so
batch and streaming share one logical pipeline (parse → enrich → route →
aggregate) and one sink layout.

Correctness precondition (same as plans/checkpoint.py): conversations do not
span micro-batch boundaries.  The file source delivers whole files per
trigger, so a conv-partitioned/bucketed landing layout — the standard Iceberg
layout for this table, and what the pipeline's own writers emit — satisfies
it.  Sessionization is data-driven (boundary markers), not time-driven, so
no watermark is needed: a conversation is complete when its file lands.

Exactly-once: the streaming checkpoint (file-source log) makes each input
file processed once across restarts, and ``run_batch`` writes idempotent
per-batch sink partitions keyed by epoch id, so a micro-batch replayed after
a crash overwrites its own half-written output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from wolf_quake_spark.data_model import TRANSCRIPTS_SCHEMA
from wolf_quake_spark.plans.checkpoint import BatchRecord, Manifest
from wolf_quake_spark.plans.pipeline import run_batch
from wolf_quake_spark.sources.catalog import SinkCatalog


def transcripts_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of transcript parquet files (whole files per
    trigger; schema pinned — streaming sources cannot infer)."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_path)


def run_streaming(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    strict: bool = False,
    extractor: str = "udf",
    with_aggregates: bool = True,
    iceberg_catalog: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    timeout_secs: float | None = None,
    table_format: str = "parquet",
) -> Manifest:
    """Drain the landing zone through the batch pipeline body.

    ``available_now=True`` (default) processes everything currently present
    and stops — the batch-equivalent trigger, used by tests and backfills;
    ``False`` runs continuously until ``timeout_secs`` (required in that
    mode: ``awaitTermination(None)`` would block forever and make the stop /
    Manifest return unreachable).  Restartable: the streaming checkpoint
    under ``<out_dir>/_stream_checkpoint`` carries the processed-file log
    across runs.
    """
    if not available_now and timeout_secs is None:
        raise ValueError(
            "run_streaming(available_now=False) requires timeout_secs; "
            "an unbounded continuous run would never return the Manifest"
        )
    catalog = SinkCatalog(
        spark, out_dir, iceberg_catalog=iceberg_catalog, table_format=table_format
    )
    manifest = Manifest(out_dir)

    def process(df: DataFrame, epoch_id: int) -> None:
        batch_id = f"epoch={epoch_id:08d}"
        result = run_batch(
            df,
            catalog,
            batch_id,
            strict=strict,
            extractor=extractor,
            with_aggregates=with_aggregates,
        )
        manifest.record(
            BatchRecord(
                batch_id=batch_id,
                input_files=[],  # lineage held by the streaming file-source log
                sink_counts=result.counts,
                wall_secs=round(result.wall_secs, 3),
                extra={"epoch_id": epoch_id, "source": "stream"},
            )
        )

    stream = transcripts_stream(spark, input_path, max_files_per_trigger)
    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
        .outputMode("update")
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:
        query = writer.start()
        query.awaitTermination(timeout_secs)
        query.stop()
    return manifest
