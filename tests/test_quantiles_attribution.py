"""Semantic tests for iterative-refinement exact quantiles and last-touch
attribution — complementing the DuckDB oracle rows (exact_price_quantiles,
purchase_attribution)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.quantiles import exact_quantiles


def _rank_value(sorted_vals, q):
    return sorted_vals[max(1, math.ceil(q * len(sorted_vals))) - 1]


def test_exact_quantiles_match_sorted_rank_small_threshold(spark):
    # 10_000 skewed values; tiny buckets/threshold force multiple
    # refinement rounds; result must equal the rank-convention value.
    vals = [((i * 2654435761) % 99991) ** 1.5 for i in range(10_000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {
        r.quantile: r.value
        for r in exact_quantiles(
            df, "x", (0.1, 0.5, 0.9, 0.99), buckets=8, exact_threshold=50
        ).collect()
    }
    s = sorted(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert out[q] == _rank_value(s, q), q


def test_exact_quantiles_duplicates_and_extremes(spark):
    # Heavy ties straddling bucket boundaries + q=1.0 endpoint.
    vals = [1.0] * 500 + [2.0] * 500 + [3.0] * 500
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {
        r.quantile: r.value
        for r in exact_quantiles(
            df, "x", (0.0, 1 / 3, 0.5, 1.0), buckets=4, exact_threshold=10
        ).collect()
    }
    assert out[0.0] == 1.0
    assert out[1 / 3] == 1.0  # rank ceil(1500/3)=500 -> last 1.0
    assert out[0.5] == 2.0
    assert out[1.0] == 3.0


def test_exact_quantiles_all_equal_and_nulls(spark):
    df = spark.createDataFrame(
        [(5.0,)] * 100 + [(None,)] * 20, "x double"
    )
    out = exact_quantiles(df, "x", (0.5, 0.99)).collect()
    assert [(r.quantile, r.value) for r in out] == [(0.5, 5.0), (0.99, 5.0)]


def test_exact_quantiles_empty(spark):
    df = spark.createDataFrame([], "x double")
    assert exact_quantiles(df, "x").count() == 0


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, ts_offset_seconds)
    base = dt.datetime(2025, 1, 1)
    data = [
        (eid, base + dt.timedelta(seconds=off), uid, et, 1.0, "{}")
        for eid, uid, et, off in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_attribution_last_touch_and_direct(spark, tmp_path):
    from wolf_quake_spark.queries import q_purchase_attribution

    ev = _events(
        spark,
        [
            (1, 7, "view", 0),
            (2, 7, "click", 100),      # latest touch before purchase 3
            (3, 7, "purchase", 200),
            (4, 7, "purchase", 300),   # still attributed to click 2
            (5, 8, "purchase", 50),    # no prior touch -> direct
            (6, 9, "view", 0),
            (7, 9, "purchase", 604800 + 1000),  # touch too old -> direct
        ],
    )
    p = str(tmp_path / "events.parquet")
    ev.write.parquet(p)
    out = {
        r.purchase_id: r
        for r in q_purchase_attribution(spark, str(tmp_path)).collect()
    }
    assert out[3].channel == "click" and out[3].touch_event_id == 2
    assert out[3].secs_since_touch == 100
    assert out[4].channel == "click" and out[4].secs_since_touch == 200
    assert out[5].channel == "direct" and out[5].touch_event_id is None
    assert out[7].channel == "direct"


def test_attribution_tie_broken_by_event_id(spark, tmp_path):
    from wolf_quake_spark.queries import q_purchase_attribution

    # view and click at the SAME timestamp: the (ts, event_id) order makes
    # the higher event_id the "last" touch deterministically.
    ev = _events(
        spark,
        [
            (10, 1, "view", 100),
            (11, 1, "click", 100),
            (12, 1, "purchase", 200),
        ],
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    r = q_purchase_attribution(spark, str(tmp_path)).collect()[0]
    assert r.channel == "click" and r.touch_event_id == 11
