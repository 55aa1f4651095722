"""Streaming exact deduplication: the ingest-time face of the batch
``dedup_fingerprint`` / ``dedup_exact_groups`` operators.

A continuously-ingested corpus can't wait for a full-corpus batch groupBy;
``dropDuplicatesWithinWatermark`` keeps the FIRST document per content
fingerprint and drops re-arrivals, with state bounded by the event-time
watermark horizon rather than the stream length — the property that makes
this viable at 10^12-row ingest (a plain ``dropDuplicates`` on a stream
accumulates unbounded state).

The fingerprint is the same whitespace-collapsed lowercased md5 the batch
path uses (analysis/dedup.py normalized_fingerprint), so batch re-dedup of
the streamed sink is a no-op for in-horizon duplicates: one definition of
"duplicate", two execution modes.

Semantics: a duplicate arriving within ``delay`` of the retained first copy
is dropped; one arriving after the fingerprint's state has been evicted
(event time beyond watermark) is KEPT — streaming dedup dedups the horizon,
the periodic batch job sweeps the tail.  State shuffles on the fingerprint
(uniform md5 — no skew), checkpointed per-partition like every stateful op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis import WS_SPLIT


def fingerprint_col(text_col: str = "text") -> Column:
    return F.md5(F.lower(F.trim(F.regexp_replace(F.col(text_col), WS_SPLIT, " "))))


def dedup_stream(
    docs: DataFrame,
    delay: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Keep the first doc per content fingerprint within the watermark
    horizon.  Works on a streaming frame (stateful, bounded by ``delay``)
    and on a batch frame (``withWatermark`` no-op + plain first-wins
    dedup) — same body, both engines."""
    tagged = docs.withColumn("fingerprint", fingerprint_col(text_col))
    if docs.isStreaming:
        return tagged.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return tagged.dropDuplicates(["fingerprint"])
