"""Semantic tests for K-fold target encoding, Welch's t, and term
burstiness — complementing the DuckDB oracle rows."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from wolf_quake_spark.analysis.textstats import term_burstiness


def _events(spark, rows, path):
    data = [
        (eid, ts, 1, et, val, "{}") for eid, et, ts, val in rows
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(path / "events.parquet"))
    return str(path)


def test_target_encoding_excludes_own_fold(spark, tmp_path):
    from wolf_quake_spark.queries import q_target_encoding_oof

    # category 'click', folds 0..4, value = 100*(fold+1) cents = fold+1
    # dollars: the OOF mean for fold f must exclude f's own value.
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (f, "click", t0 + dt.timedelta(seconds=f), float(f + 1))
        for f in range(5)
    ]
    sf = _events(spark, rows, tmp_path)
    out = {r.fold: r for r in q_target_encoding_oof(spark, sf).collect()}
    assert len(out) == 5
    cents = [100 * (f + 1) for f in range(5)]
    total = sum(cents)
    for f in range(5):
        expect = (total - cents[f]) / 4
        assert out[f].oof_mean_cents == pytest.approx(expect, abs=1e-4), f
        # shrinkage pulls toward the global mean (total/5)
        prior = total / 5
        sm = (total - cents[f] + 10 * prior) / (4 + 10)
        assert out[f].smoothed_cents == pytest.approx(round(sm, 4), abs=1e-4)


def test_welch_t_planted_difference(spark, tmp_path):
    from wolf_quake_spark.queries import q_welch_t_purchase_vs_click

    # purchases ~ {10,12} dollars, clicks ~ {1,2}: big positive t.
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(40):
        rows.append((eid, "purchase", t0 + dt.timedelta(seconds=eid),
                     10.0 if i % 2 else 12.0)); eid += 1
        rows.append((eid, "click", t0 + dt.timedelta(seconds=eid),
                     1.0 if i % 2 else 2.0)); eid += 1
    sf = _events(spark, rows, tmp_path)
    r = q_welch_t_purchase_vs_click(spark, sf).collect()[0]
    assert (r.n1, r.n2) == (40, 40)
    assert r.mean_diff_cents == pytest.approx(1100 - 150, abs=1e-3)
    # hand-computed Welch t: se1 = var1/n1 with var1 = (100^2)*... both
    # samples alternate two values, var = (d/2)^2 * n/(n-1)
    v1 = sum((c - 1100) ** 2 for c in ([1000, 1200] * 20)) / 39
    v2 = sum((c - 150) ** 2 for c in ([100, 200] * 20)) / 39
    t = 950 / math.sqrt(v1 / 40 + v2 / 40)
    assert r.t_stat == pytest.approx(round(t, 4), abs=1e-3)
    assert r.t_stat > 50


def test_welch_t_identical_groups_zero(spark, tmp_path):
    from wolf_quake_spark.queries import q_welch_t_purchase_vs_click

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        rows.append((2 * i, "purchase", t0 + dt.timedelta(seconds=i),
                     float(5 + i % 3)))
        rows.append((2 * i + 1, "click", t0 + dt.timedelta(seconds=i),
                     float(5 + i % 3)))
    r = q_welch_t_purchase_vs_click(
        spark, _events(spark, rows, tmp_path)
    ).collect()[0]
    assert r.mean_diff_cents == 0.0 and r.t_stat == 0.0


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_burstiness_clumped_beats_uniform(spark):
    # 'burst' appears 10x in each of 2 docs (clumped); 'flat' once in all
    # 20 docs (uniform).  Same total_tf=20, but VMR(burst) >> VMR(flat).
    texts = []
    for i in range(20):
        base = "flat"
        if i < 2:
            texts.append(("burst " * 10) + base)
        else:
            texts.append(base)
    out = {r.term: r for r in term_burstiness(
        _docs(spark, texts), top_k=10, min_df=2
    ).collect()}
    b, f = out["burst"], out["flat"]
    assert b.total_tf == f.total_tf == 20
    # exact VMR: burst mean=1, E[x^2]=200/20=10 -> vmr=(10-1)/1=9
    assert b.vmr == pytest.approx(9.0, abs=1e-6)
    # flat: mean=1, E[x^2]=1 -> vmr=0
    assert f.vmr == pytest.approx(0.0, abs=1e-6)
    assert b.vmr > f.vmr


def test_burstiness_min_df_floor(spark):
    texts = ["solo " * 30] + ["common x"] * 10
    out = {r.term for r in term_burstiness(
        _docs(spark, texts), top_k=50, min_df=2
    ).collect()}
    assert "solo" not in out  # df=1 < 2
    assert "common" in out
