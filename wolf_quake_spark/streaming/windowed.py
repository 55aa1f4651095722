"""Watermarked tumbling-window aggregation over an event-time stream.

The transcript pipeline's sessionization is data-driven (boundary markers,
streaming/adapter.py) and needs no watermark; *metric* rollups over the
routed event stream are time-driven and do: a per-(hour, event_type) count
stream must eventually close each hour despite stragglers.  This module is
the streaming face of the batch ``events_hourly_rollup`` query
(queries.py): same ``F.window`` bucketing, same integer-cent quantization,
plus an event-time watermark bounding both state and lateness.

Semantics (standard Structured Streaming):

* state per open window is kept until ``watermark = max(ts) - delay``
  passes the window end — so state size is O(windows inside the delay
  horizon × event types), independent of stream length;
* rows later than the watermark are DROPPED — precisely: the watermark is
  a *lower bound* on tolerated lateness.  A window is evicted (and emitted)
  at the end of the first micro-batch whose watermark passes its end; a
  late row arriving while its window is still in state merges normally even
  if its event time is behind the watermark, and one arriving after
  eviction is dropped (verified in tests/test_streaming.py).  Dropped-row
  counts surface in each query progress'
  ``stateOperators[].numRowsDroppedByWatermark`` — a monitoring hook, not a
  silent loss;
* append output mode emits each window exactly once, when it closes —
  the right contract for an Iceberg metrics sink (no rewrites).

At cluster scale the stateful agg shuffles on (window, event_type) — the
same single-exchange shape as the batch rollup — and the state store
(RocksDB on executors in a real deployment) checkpoints per-partition, so
a restart resumes with no recount (cf. plans/checkpoint.py for the batch
analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    delay: str = "2 hours",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (default) or sliding (``slide`` < ``window``) rollup with an
    event-time watermark.

    Works on a streaming OR batch ``events``-shaped frame (ts, event_type,
    user_id, value); on a batch frame ``withWatermark`` is a no-op, so the
    same function body serves both engines — one definition, two execution
    modes (the Structured Streaming contract).  Sliding multiplies open
    state by window/slide overlapping windows per key; each still closes
    (and emits, in append mode) when the watermark passes its own end.
    """
    # group on the window struct itself (not a projection of it): the
    # watermark binds to the grouping column's event-time metadata, which a
    # .getField("start") projection would strip — append mode then rejects
    # the plan as an unwatermarked streaming aggregation
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(win, "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window").getField("start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
            "approx_users",
        )
    )


def session_window_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    delay: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user SESSION windows via Spark's native ``session_window`` — the
    dynamic-gap cousin of the fixed rollup above: a window opens at a user's
    first event and keeps extending while successive events arrive within
    ``gap``; the first quiet gap closes it at ``last_ts + gap``.

    Semantics boundary pinned by the oracle/tests: the end bound is
    INCLUSIVE — an event at EXACTLY ``prev_ts + gap`` still extends the
    session (a new one starts only when the idle gap is strictly greater,
    at full microsecond precision; the closed-form lag/prefix-sum
    restatement in the ``session_window_rollup`` registry oracle encodes
    the same strict-``>`` boundary).

    One definition, two execution modes (the Structured Streaming
    contract): on a batch frame ``withWatermark`` is a no-op and the
    session merge runs as a single user-keyed sort-merge pass; on a stream,
    open sessions live in the state store until the watermark passes their
    end, then emit exactly once in append mode — state is bounded by
    sessions open inside the delay horizon, independent of stream length
    (same argument as the tumbling rollup above).  At cluster scale both
    faces shuffle once on ``user_id`` — the same single-exchange shape as
    the lag/prefix-sum closed form, but with merge logic the engine
    maintains incrementally instead of a recomputed window chain.
    """
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("session_window").getField("start").alias("session_start"),
            F.col("session_window").getField("end").alias("session_end"),
            "n_events",
            "first_event_id",
            "value_cents",
        )
    )
