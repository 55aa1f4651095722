"""Streaming last-write-wins upsert view: the ingest-time face of the batch
``events_lww_compaction`` query.

A continuously-ingested event log wants a live "current version per merge
key" view without waiting for the periodic batch compaction.  This is a
plain declarative streaming aggregate — ``max_by`` keyed on the merge key,
ordered by ``(ts, event_id)`` — so the whole operator stays JVM-side (no
Python state fold): Spark's state store holds exactly ONE row per merge
key (the current winner), updated in place each trigger.

State is bounded by merge-key cardinality, not stream length — the same
bound the materialized upsert view itself needs, so there is nothing to
watermark away: evicting a key would forget its current version.  (If key
cardinality itself outgrows state, the right fix is partitioning the view,
not a watermark.)

Batch/stream parity: the identical expression runs on a batch frame and
must equal the window row_number formulation the batch query uses —
``max_by(payload, (ts, event_id))`` picks the same row as
``row_number() over (order by ts desc, event_id desc) = 1`` because the
ordering struct is a total order.  Parity is pytest-enforced across
micro-batch boundaries (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_view(
    events: DataFrame, key_cols: tuple[str, ...] = ("user_id", "event_type")
) -> DataFrame:
    """Current-version-per-key view of an append-only event log.

    Works identically on batch and streaming frames; streaming callers run
    it in ``update`` (emit changed keys per trigger) or ``complete`` output
    mode.  The ordering struct ``(ts, event_id)`` is a total order, so the
    winner is deterministic under replays and batch/stream execution.
    """
    order = F.struct(F.col("ts"), F.col("event_id"))
    pick = F.max_by(
        F.struct(
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        ),
        order,
    )
    return events.groupBy(*[F.col(c) for c in key_cols]).agg(
        pick.alias("_r")
    ).select(*key_cols, "_r.*")
