"""Semantic tests for Fellegi-Sunter linkage scoring and temperature
mixture reweighting — fixture-level properties complementing the DuckDB
oracle parity rows (fs_link_pairs, temperature_mix_weights)."""

from __future__ import annotations

import math

import pytest

from wolf_quake_spark.analysis.linkage import M_PROBS, fs_link_pairs
from wolf_quake_spark.analysis.sampling import temperature_weights

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_fs_full_agreement_scores_match(spark):
    # Two near-identical docs in one block agreeing on every field, plus
    # filler docs that diversify the value distributions (low u -> high
    # positive agreement weights).  Filler docs land in singleton blocks.
    rows = [(1, "alpha beta one", "en", "web", 100),
            (2, "alpha beta two", "en", "web", 110)] + [
        (10 + i, f"w{i} x{i}", f"l{i%7}", f"s{i%5}", 1000 + 300 * i)
        for i in range(20)
    ]
    out = fs_link_pairs(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert (r.agree_lang, r.agree_source, r.agree_tok2) == (1, 1, 1)
    assert r.verdict == "match" and r.weight > 2.0


def test_fs_weight_is_sum_of_field_log_ratios(spark):
    # Hand-check the arithmetic: 4 docs, all in one block, uniform fields
    # so u is computable by hand.  Docs 1-2 agree everywhere; 3-4 disagree
    # on lang and source with 1-2.
    rows = [
        (1, "k a p", "en", "web", 10),
        (2, "k a p", "en", "web", 10),
        (3, "k b p", "fr", "pdf", 10),
        (4, "k b p", "fr", "pdf", 10),
    ]
    out = {(r.doc_a, r.doc_b): r for r in fs_link_pairs(_docs(spark, rows)).collect()}
    assert len(out) == 6
    # u for lang/source: 2 values x 2 docs over N=4 -> (4+4)/16 = 0.5;
    # tok2 likewise (a/b).
    m = dict(M_PROBS)
    agree_w = sum(math.log2(m[f] / 0.5) for f in ("lang", "source", "tok2"))
    disagree_w = sum(
        math.log2((1 - m[f]) / 0.5) for f in ("lang", "source", "tok2")
    )
    assert out[(1, 2)].weight == pytest.approx(agree_w, abs=1e-5)
    assert out[(3, 4)].weight == pytest.approx(agree_w, abs=1e-5)
    assert out[(1, 3)].weight == pytest.approx(disagree_w, abs=1e-5)
    assert out[(1, 2)].verdict == "match"
    assert out[(1, 3)].verdict == "non_match"


def test_fs_blocking_excludes_cross_block_pairs(spark):
    # Same fields but different first token / length bucket: no pair.
    rows = [
        (1, "aaa tail", "en", "web", 10),
        (2, "bbb tail", "en", "web", 10),
        (3, "aaa tail", "en", "web", 2000),
    ]
    assert fs_link_pairs(_docs(spark, rows)).count() == 0


def test_temperature_weights_uplift_low_resource(spark):
    # 90/10 split at alpha=0.3: minority share rises, majority falls,
    # weights move in opposite directions, shares still sum to 1.
    rows = [(i, "t", "en" if i < 90 else "yo", "w", 5) for i in range(100)]
    out = {r.grp: r for r in temperature_weights(_docs(spark, rows), "lang").collect()}
    en, yo = out["en"], out["yo"]
    assert en.natural_share == pytest.approx(0.9) and yo.natural_share == pytest.approx(0.1)
    z = 0.9**0.3 + 0.1**0.3
    assert yo.resampled_share == pytest.approx(round(0.1**0.3 / z, 6), abs=1e-9)
    assert yo.resampled_share > yo.natural_share
    assert en.resampled_share < en.natural_share
    assert yo.sample_weight > 1.0 > en.sample_weight
    assert en.resampled_share + yo.resampled_share == pytest.approx(1.0, abs=1e-5)
    assert en.expected_epoch_docs + yo.expected_epoch_docs == pytest.approx(
        100.0, abs=0.01
    )


def test_temperature_alpha_one_is_identity(spark):
    rows = [(i, "t", ["a", "b", "c"][i % 3], "w", 5) for i in range(60)]
    out = temperature_weights(_docs(spark, rows), "lang", alpha=1.0).collect()
    for r in out:
        assert r.resampled_share == pytest.approx(r.natural_share, abs=1e-6)
        assert r.sample_weight == pytest.approx(1.0, abs=1e-6)


# --- EM parameter estimation (fs_link_pairs_em) -----------------------------


def _fixture_patterns():
    """Hand-built pattern counts with a clear two-cluster structure: a
    small population of near-duplicates (mostly full agreement) inside a
    large background of chance agreements."""
    return [
        ((1, 1, 1), 40),   # true-match cluster
        ((1, 1, 0), 10),
        ((1, 0, 0), 300),  # background: lang agrees by chance often
        ((0, 1, 0), 120),
        ((0, 0, 0), 2000),
        ((0, 0, 1), 15),
    ]


def test_em_converges_on_fixture():
    """EM is a fixpoint iteration: by round 3 the parameters must be close
    to their round-8 values, and the learned structure must separate the
    clusters (every m above its u, prior strictly inside (0, 1))."""
    from wolf_quake_spark.analysis.linkage import _em_on_patterns

    u0 = (0.4, 0.3, 0.05)
    m3, u3, p3 = _em_on_patterns(_fixture_patterns(), u0, rounds=3)
    m8, u8, p8 = _em_on_patterns(_fixture_patterns(), u0, rounds=8)
    for a, b in zip(m3 + u3 + [p3], m8 + u8 + [p8]):
        assert abs(a - b) < 0.05, (m3, u3, p3, m8, u8, p8)
    for mi, ui in zip(m8, u8):
        assert mi > ui
    assert 0.0 < p8 < 1.0


def test_em_weights_separate_matches(spark):
    """On the documents fixture the EM-weighted scorer must (a) score
    full-agreement pairs at the top, (b) produce the same pair set as the
    declared-constant scorer (blocking unchanged), and (c) order full
    agreement above full disagreement."""
    from wolf_quake_spark.analysis.linkage import fs_link_pairs_em

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = fs_link_pairs_em(docs)
    rows = out.collect()
    for h in out._wqs_persisted:
        h.unpersist()
    base = fs_link_pairs(docs)
    base_pairs = {(r["doc_a"], r["doc_b"]) for r in base.collect()}
    getattr(base, "_wqs_persisted").unpersist()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == base_pairs
    full = [r["weight"] for r in rows
            if r["agree_lang"] and r["agree_source"] and r["agree_tok2"]]
    none = [r["weight"] for r in rows
            if not (r["agree_lang"] or r["agree_source"] or r["agree_tok2"])]
    if full and none:
        assert min(full) > max(none)
