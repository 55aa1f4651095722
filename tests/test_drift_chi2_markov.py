"""Semantic tests for the KS drift test, chi-square independence, and the
Markov stationary distribution — complementing the DuckDB oracle rows."""

from __future__ import annotations

import datetime as dt

import pytest

from wolf_quake_spark.queries import (
    q_chi2_type_weekday,
    q_ks_drift_purchase_value,
    q_markov_stationary_events,
)


def _events(spark, rows, path):
    data = [
        (i, ts, uid, et, val, "{}")
        for i, (uid, et, ts, val) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(path / "events.parquet"))
    return str(path)


def test_ks_identical_halves_zero_stat(spark, tmp_path):
    # Same 50-value sample in each half: D = 0.
    vals = [float(7 + (i * 13) % 40) for i in range(50)]
    rows = []
    for i, v in enumerate(vals):
        rows.append((1, "purchase", dt.datetime(2024, 1, 5, 0, 0, i), v))
        rows.append((1, "purchase", dt.datetime(2024, 1, 25, 0, 0, i), v))
    r = q_ks_drift_purchase_value(
        spark, _events(spark, rows, tmp_path)
    ).collect()[0]
    assert (r.n1, r.n2) == (50, 50)
    assert r.ks_stat == 0.0
    assert r.ks_critical_005 == pytest.approx(1.358 * (100 / 2500) ** 0.5, abs=1e-6)


def test_ks_disjoint_supports_full_separation(spark, tmp_path):
    # Half 1 all below half 2: D = 1.0 (maximal drift).
    rows = [
        (1, "purchase", dt.datetime(2024, 1, 3, 0, 0, i), float(i))
        for i in range(30)
    ] + [
        (1, "purchase", dt.datetime(2024, 1, 20, 0, 0, i), float(1000 + i))
        for i in range(30)
    ]
    r = q_ks_drift_purchase_value(
        spark, _events(spark, rows, tmp_path)
    ).collect()[0]
    assert r.ks_stat == 1.0
    assert r.ks_stat > r.ks_critical_005


def test_chi2_independent_layout_zero_stat(spark, tmp_path):
    # Perfectly independent contingency: every (type, weekday) cell holds
    # the same count -> expected == observed -> chi2 = 0.
    rows = []
    i = 0
    for d in range(7, 14):  # 2024-01-07 (Sun) .. 13 covers all 7 weekdays
        for et in ("click", "view"):
            for _ in range(5):
                rows.append(
                    (1, et, dt.datetime(2024, 1, d, 12, i // 60, i % 60), 1.0)
                )
                i += 1
    r = q_chi2_type_weekday(spark, _events(spark, rows, tmp_path)).collect()[0]
    assert r.chi2 == 0.0
    assert r.dof == (2 - 1) * (7 - 1)
    assert r.n == 70


def test_markov_stationary_absorbing_chain(spark, tmp_path):
    # a -> b -> b -> b ... : with transitions a->b and b->b only, the
    # stationary mass collapses onto b (pi_b -> 1 as iterations grow;
    # after 4 rounds from uniform, pi_b = 1 - 0.5*0 = ... exactly:
    # pi0 = (.5,.5); a's mass all flows to b and nothing returns -> after
    # one round pi(a)=0, pi(b)=1, stable thereafter.
    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, "b", dt.datetime(2024, 1, 1, 0, 0, 1), 1.0),
        (1, "b", dt.datetime(2024, 1, 1, 0, 0, 2), 1.0),
        (1, "b", dt.datetime(2024, 1, 1, 0, 0, 3), 1.0),
    ]
    out = {r.state: r.pi for r in q_markov_stationary_events(
        spark, _events(spark, rows, tmp_path)
    ).collect()}
    assert out["b"] == pytest.approx(1.0, abs=1e-9)
    assert out.get("a", 0.0) == pytest.approx(0.0, abs=1e-9)


def test_markov_stationary_two_state_cycle(spark, tmp_path):
    # a<->b strict alternation: P is a swap matrix; from uniform pi the
    # distribution is invariant at (0.5, 0.5) every iteration.
    rows = [
        (1, "ab"[i % 2], dt.datetime(2024, 1, 1, 0, 0, i), 1.0)
        for i in range(20)
    ]
    out = {r.state: r.pi for r in q_markov_stationary_events(
        spark, _events(spark, rows, tmp_path)
    ).collect()}
    assert out["a"] == pytest.approx(0.5, abs=1e-6)
    assert out["b"] == pytest.approx(0.5, abs=1e-6)
