"""Semantic tests for the plan-time statistics operators (key skew report,
histogram join-cardinality estimate)."""

from __future__ import annotations

import pytest

from wolf_quake_spark.analysis.diagnostics import (
    join_cardinality_estimate,
    key_skew_report,
)


def _keyed(spark, counts):
    # counts: {key: n} -> one row per occurrence
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k long")


def test_skew_report_uniform_keys_zero_gini(spark):
    df = _keyed(spark, {i: 10 for i in range(20)})
    r = key_skew_report(df, "k").collect()[0]
    assert (r.n_keys, r.total_rows, r.max_count) == (20, 200, 10)
    assert r.max_share == pytest.approx(0.05, abs=1e-6)
    assert r.p50_count == 10 and r.p99_count == 10
    # perfectly equal distribution -> Gini ~ 0 (finite-n correction = 0
    # here because every weight is identical)
    assert r.gini == pytest.approx(0.0, abs=1e-6)


def test_skew_report_hot_key(spark):
    # one key holds 910 of 1000 rows: max_share ~ 0.91, Gini near 1.
    counts = {0: 910}
    counts.update({i: 10 for i in range(1, 10)})
    r = key_skew_report(_keyed(spark, counts), "k").collect()[0]
    assert r.n_keys == 10 and r.total_rows == 1000
    assert r.max_count == 910 and r.max_share == pytest.approx(0.91)
    assert r.p50_count == 10  # rank ceil(0.5*10)=5 -> a cold key
    assert r.p99_count == 910  # rank ceil(0.99*10)=10 -> the hot key
    # hand Gini: ascending counts [10]*9 + [910]; ws = sum(i*c_i)
    ws = sum((i + 1) * 10 for i in range(9)) + 10 * 910
    gini = 2 * ws / (10 * 1000) - 11 / 10
    assert r.gini == pytest.approx(round(gini, 6), abs=1e-6)
    assert r.gini > 0.7


def test_join_estimate_uniform_exact(spark):
    # keys 0..63 map 1:1 onto the 64 buckets with equal counts: the
    # uniformity assumption holds exactly -> rel_error == 0.
    df = _keyed(spark, {i: 5 for i in range(64)})
    r = join_cardinality_estimate(df, "k", buckets=64).collect()[0]
    assert r.exact_pairs == 64 * 25
    assert r.est_pairs == pytest.approx(64 * 25.0, abs=1e-6)
    assert r.rel_error == 0.0


def test_join_estimate_skew_underestimates(spark):
    # two keys in ONE bucket: c = {0: 90, 64: 10} (both ≡ 0 mod 64).
    # exact = 8100 + 100 = 8200; estimate = (100)^2/2 = 5000 — the
    # uniform assumption UNDERestimates under skew, the classic optimizer
    # failure this statistic exposes.
    r = join_cardinality_estimate(
        _keyed(spark, {0: 90, 64: 10}), "k", buckets=64
    ).collect()[0]
    assert r.exact_pairs == 8200
    assert r.est_pairs == pytest.approx(5000.0, abs=1e-6)
    assert r.rel_error == pytest.approx(round((5000 - 8200) / 8200, 6))
