"""Semantic tests for character entropy and the Heaps'-law vocabulary
growth fit — hand-computed fixtures complementing the DuckDB oracle rows."""

from __future__ import annotations

import math

from wolf_quake_spark.analysis.textstats import char_entropy, vocab_growth_heaps


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_char_entropy_hand_computed(spark):
    # "aabb": p(a)=p(b)=1/2 -> H = 1 bit exactly.
    # "abcd": 4 equiprobable -> H = 2 bits exactly.
    # "aaaa": single symbol -> H = 0.
    out = {
        r.doc_id: r
        for r in char_entropy(_docs(spark, ["aabb", "abcd", "aaaa"])).collect()
    }
    assert out[0].entropy_bits == 1.0 and out[0].n_distinct_chars == 2
    assert out[1].entropy_bits == 2.0 and out[1].n_distinct_chars == 4
    assert out[2].entropy_bits == 0.0 and out[2].n_distinct_chars == 1
    assert all(out[i].n_chars_counted == 4 for i in range(3))


def test_char_entropy_skips_empty_docs(spark):
    rows = char_entropy(_docs(spark, ["", "ab"])).collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].entropy_bits == 1.0


def test_char_entropy_nonuniform(spark):
    # "aab": H = log2(3) - (2*log2(2) + 1*log2(1))/3 = log2(3) - 2/3
    (row,) = char_entropy(_docs(spark, ["aab"])).collect()
    assert row.entropy_bits == round(math.log2(3) - 2 / 3, 6)


def test_vocab_growth_curve_and_fit(spark):
    # 10 docs; doc i contributes exactly one NEW term ("t<i>") plus i
    # repeats of "t0": vocab at checkpoint j (= first j docs) is j,
    # tokens is sum_{i<j}(1 + i) = j + j(j-1)/2.
    texts = [" ".join([f"t{i}"] + ["t0"] * i) for i in range(10)]
    out = vocab_growth_heaps(_docs(spark, texts)).orderBy("ckpt").collect()
    assert len(out) == 10
    for j, r in enumerate(out, start=1):
        assert r.n_docs == j
        assert r.vocab == j
        assert r.n_tokens == j + j * (j - 1) // 2
    # fit recomputed in Python over the same 10 points
    xs = [math.log(r.n_tokens) for r in out]
    ys = [math.log(r.vocab) for r in out]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (sxy - sx * sy / m) / (sxx - sx * sx / m)
    k = math.exp(sy / m - beta * sx / m)
    assert abs(out[0].beta - beta) < 1e-5
    assert abs(out[0].heaps_k - k) < 1e-5
    # constant across rows
    assert len({r.beta for r in out}) == 1
    assert len({r.heaps_k for r in out}) == 1


def test_vocab_growth_pure_duplication_beta_zero(spark):
    # every doc identical -> vocabulary saturates at checkpoint 1;
    # beta must come out ~0 (the duplication-collapse signal).
    texts = ["the same text again"] * 20
    out = vocab_growth_heaps(_docs(spark, texts)).collect()
    assert all(r.vocab == 4 for r in out)
    assert abs(out[0].beta) < 1e-9


def test_zipf_perfect_power_law(spark):
    # Construct term counts following f(r) = 64 / 2^(r-1) for r=1..4:
    # freqs 64,32,16,8 -> exact slope s = 1/ (ln ratio...) recompute in
    # Python below; ranks and frequencies integer-exact.
    from wolf_quake_spark.analysis.textstats import zipf_rank_frequency

    words = []
    for r, f in enumerate([64, 32, 16, 8], start=1):
        words += [f"w{r}"] * f
    docs = spark.createDataFrame(
        [(0, " ".join(words), "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = zipf_rank_frequency(docs, fit_n=4, top_k=4).orderBy("rank").collect()
    assert [(r.rank, r.freq) for r in out] == [(1, 64), (2, 32), (3, 16), (4, 8)]
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(f) for f in (64, 32, 16, 8)]
    m, sx, sy = 4, sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (sxy - sx * sy / m) / (sxx - sx * sx / m)
    assert abs(out[0].zipf_s - (-slope)) < 1e-5
    assert len({r.zipf_s for r in out}) == 1


def test_zipf_tiebreak_on_term(spark):
    # equal frequencies rank alphabetically
    from wolf_quake_spark.analysis.textstats import zipf_rank_frequency

    docs = spark.createDataFrame(
        [(0, "b a c b a c", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = zipf_rank_frequency(docs, fit_n=3, top_k=3).orderBy("rank").collect()
    assert [r.term for r in out] == ["a", "b", "c"]


def test_vocab_growth_zero_token_prefix_kept_in_curve(spark):
    # regression: the first half of the corpus (by doc_id) is empty text —
    # early checkpoints have 0 tokens/vocab and MUST still appear in the
    # curve (zero-filled), per the documented contract; the fit uses only
    # the nonzero points.
    texts = ["", "", "", "", ""] + [f"w{i} common" for i in range(5)]
    out = vocab_growth_heaps(_docs(spark, texts)).orderBy("ckpt").collect()
    assert len(out) == 10
    assert [r.n_tokens for r in out[:5]] == [0] * 5
    assert [r.vocab for r in out[:5]] == [0] * 5
    assert out[-1].vocab == 6  # w0..w4 + "common"
    assert all(r.beta == out[0].beta for r in out)
