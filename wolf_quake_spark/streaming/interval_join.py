"""Watermarked stream-stream interval join (the streaming face of the batch
``purchase_window_clicks`` range join in queries.py).

Batch answers "how many clicks preceded each purchase by ≤1 hour" with a
bucketized equi-join; incrementally, the same question is a stream-stream
self-join with a time-interval condition.  Structured Streaming supports
exactly this shape natively: both sides carry an event-time watermark, the
join condition pairs an equi-key (user_id) with a bounded time range, and
the engine derives per-side state-retention bounds from the two — a click
is held only until the watermark guarantees no future purchase can still
reach back to it (horizon + delay), so state is O(in-horizon rows), never
O(stream length).

Contract notes (standard Structured Streaming):

* inner join: each (purchase, click) pair is emitted exactly once, when
  both sides have arrived;
* rows later than their side's watermark may be dropped — same lateness
  contract as the windowed rollup (streaming/windowed.py);
* on a batch frame ``withWatermark`` is a no-op and the identical function
  body runs as a plain range join — one definition, two execution modes,
  verified pair-for-pair in tests/test_streaming.py.

At cluster scale both sides shuffle on user_id (the equi-key); the range
condition never degenerates into a nested loop because the state store is
keyed by the equi-key and scanned only within the key.  Skewed mega-users
bound the per-key scan by the retention horizon, not by user history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_pairs(
    events: DataFrame,
    horizon: str = "1 hour",
    delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Pairs every purchase with each same-user click in the trailing
    ``horizon``.  ``events`` is an events-shaped frame (event_id, ts,
    user_id, event_type), streaming or batch.

    ``how="left_outer"`` additionally emits click-less purchases with NULL
    click columns — in streaming mode such a row is emitted only once the
    watermark proves no matching click can still arrive (purchase state
    expiry), so the null is a *decision*, not a race; batch mode emits it
    immediately.  Left-outer interval joins require exactly the watermark +
    time-bound condition this function already carries.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", delay)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", delay)
    )
    cond = (
        (purchases.p_user_id == clicks.c_user_id)
        & (clicks.c_ts > purchases.p_ts - F.expr(f"INTERVAL {horizon}"))
        & (clicks.c_ts <= purchases.p_ts)
    )
    return purchases.join(clicks, cond, how).select(
        "p_event_id", "c_event_id", "p_user_id", "p_ts", "c_ts"
    )
