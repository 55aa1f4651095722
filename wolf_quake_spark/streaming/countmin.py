"""Streaming Count-Min sketch: per-window heavy-hitter cells over an
event-time stream.

The streaming face of the batch ``countmin_term_counts`` family
(analysis/textstats.py): the same deterministic salted-md5 row hashes, but
sketch cells are built per tumbling event-time window and emitted append-
mode when the watermark closes the window.  Because a CM sketch is a grid
of COUNTERS, its merge is cell-wise addition — so a consumer folds closed
windows into an hour/day/all-time sketch with one ``SUM`` per ``(j, b)``,
never touching raw events again.  That mergeability is the whole point:
per-window emission keeps streaming state bounded (windows inside the
watermark horizon × depth·width cells) while still answering "top items
over any span" downstream.

Same one-definition-two-modes contract as streaming/windowed.py: on a
batch frame ``withWatermark`` is a no-op and the function computes the
exact same cells (parity-tested in tests/test_streaming.py, including the
estimate-from-merged-sketch ≥ exact-count CM guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.textstats import cm_bucket as _cm_bucket

CM_WIDTH = 256
CM_DEPTH = 4


def windowed_countmin(
    events: DataFrame,
    window: str = "1 hour",
    delay: str = "2 hours",
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    item_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-window CM cells ``(window_start, window_end, j, b, cell)``.

    The explode is stateless (depth rows per event, narrow); the only
    stateful operator is the windowed count keyed on ``(window, j, b)`` —
    state per open window is depth·width counters regardless of item
    cardinality, which is exactly the regime where exact per-item counting
    (windowed_event_rollup's shape) stops scaling.
    """
    item = F.col(item_col).cast("string")
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cm_bucket(item, j, width).alias("b"))
            for j in range(depth)
        ]
    )
    e = (
        events.withWatermark(ts_col, delay)
        .select(F.col(ts_col), F.explode(rows).alias("s"))
        .select(ts_col, "s.j", "s.b")
    )
    agg = e.groupBy(F.window(ts_col, window), "j", "b").agg(
        F.count("*").cast("long").alias("cell")
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "j",
        "b",
        "cell",
    )


def merge_cm_windows(cells: DataFrame) -> DataFrame:
    """Fold per-window cells into one sketch: cell-wise SUM over (j, b).

    This is the CM merge — linear, associative, and exactly what makes the
    per-window emission composable into hourly/daily/all-time sketches
    without reprocessing events."""
    return cells.groupBy("j", "b").agg(F.sum("cell").alias("cell"))


def cm_estimate(merged: DataFrame, items: DataFrame, item_col: str = "item",
                width: int = CM_WIDTH, depth: int = CM_DEPTH) -> DataFrame:
    """Point-estimate counts for ``items`` from a merged sketch:
    min over the item's depth cells (missing cells count 0)."""
    item = F.col(item_col).cast("string")
    hashed = items.select(
        item.alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cm_bucket(item, j, width).alias("b")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("s"),
    ).select("item", "s.j", "s.b")
    return (
        hashed.join(merged, ["j", "b"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cell", F.lit(0))).alias("cm_estimate"))
    )
