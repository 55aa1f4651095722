"""ExactSubstr dedup (analysis/dedup.exact_substring_*): Lee et al. 2022
suffix-array-style removal of corpus-duplicated substrings >= n tokens,
re-expressed as a hash-join plan.

The exact-family discipline (PassJoin/Ed-Join precedent): the operator's
claim is EXACT equality with a brute-force definition, so the tests
enumerate every substring of every length >= n corpus-wide in pure Python
and compare covered positions / spans / cleaned text — no reliance on the
n-window equivalence the implementation itself uses.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.dedup import (
    exact_substring_clean,
    exact_substring_spans,
)


def _brute_covered(docs: dict[int, list[str]], n: int) -> dict[int, set[int]]:
    """Ground truth by definition: position p of doc d is covered iff it
    lies inside SOME substring of length >= n whose token sequence occurs
    at >= 2 (doc, start) positions anywhere in the corpus."""
    cnt: Counter = Counter()
    for toks in docs.values():
        for i in range(len(toks)):
            for L in range(1, len(toks) - i + 1):
                cnt[tuple(toks[i : i + L])] += 1
    covered: dict[int, set[int]] = {d: set() for d in docs}
    for d, toks in docs.items():
        for i in range(len(toks)):
            for L in range(n, len(toks) - i + 1):
                if cnt[tuple(toks[i : i + L])] >= 2:
                    covered[d].update(range(i, i + L))
    return covered


def _brute_spans(covered: set[int]) -> list[tuple[int, int, int]]:
    out, run = [], []
    for p in sorted(covered):
        if run and p == run[-1] + 1:
            run.append(p)
        else:
            if run:
                out.append((run[0], run[-1], len(run)))
            run = [p]
    if run:
        out.append((run[0], run[-1], len(run)))
    return out


def _check_against_brute(spark, corpus: dict[int, list[str]], n: int) -> None:
    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in corpus.items()],
        "doc_id long, text string",
    )
    covered = _brute_covered(corpus, n)

    from wolf_quake_spark.analysis import persisted_handles

    got_spans: dict[int, list] = {}
    spans_df = exact_substring_spans(docs, n=n)
    for r in spans_df.collect():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_tokens"])
        )
    for handle in persisted_handles(spans_df):
        handle.unpersist()
    for d in corpus:
        want = _brute_spans(covered[d])
        assert sorted(got_spans.get(d, [])) == want, (d, corpus[d])

    out = exact_substring_clean(docs, n=n)
    got_clean = {r["doc_id"]: r for r in out.collect()}
    from wolf_quake_spark.analysis import persisted_handles

    for handle in persisted_handles(out):
        handle.unpersist()
    for d, toks in corpus.items():
        keep = [t for i, t in enumerate(toks) if i not in covered[d]]
        r = got_clean[d]
        assert r["clean_text"] == " ".join(keep), (d, toks)
        assert r["n_kept"] == len(keep)
        assert r["n_dropped"] == len(toks) - len(keep)


def test_exact_substring_handcrafted(spark):
    """Every structural case at once: a 6-token phrase shared by two docs
    (both copies removed — the released tool's self-dedup behavior), an
    INTRA-doc repetition, a doc that is a verbatim copy of another
    (fully erased, survives with empty text), a doc shorter than n
    (untouched — no n-window exists), and two duplicated windows closer
    than n (their spans merge into ONE disjoint removal interval)."""
    phrase = "the quick brown fox jumps over".split()
    corpus = {
        0: ["alpha", *phrase, "beta", "gamma"],
        1: ["delta", "epsilon", *phrase, "zeta"],
        2: ["rep", "x1", "y1", "z1", "w1", "rep", "x1", "y1", "z1", "w1"],
        3: ["solo", "tokens", "never", "repeated", "anywhere", "here"],
        4: ["copy", "of", "doc", "four", "entirely"],
        5: ["copy", "of", "doc", "four", "entirely"],
        6: ["short", "doc"],
    }
    _check_against_brute(spark, corpus, n=5)

    # sharpen the full-erasure claim explicitly
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )
    out = exact_substring_clean(docs, n=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    from wolf_quake_spark.analysis import persisted_handles

    for handle in persisted_handles(out):
        handle.unpersist()
    assert rows[4]["clean_text"] == "" and rows[4]["n_kept"] == 0
    assert rows[5]["clean_text"] == "" and rows[5]["n_kept"] == 0
    assert rows[3]["n_dropped"] == 0
    assert rows[6]["n_dropped"] == 0


def test_exact_substring_merges_overlapping_windows(spark):
    """Two duplicated 3-windows whose spans overlap (starts 2 apart, n=3)
    must merge into one disjoint removal span, and the clean output must
    drop exactly that union."""
    # doc 0 has 'a b c' at 0 and 'c d e' at 2 -> covered 0..4 as ONE span;
    # docs 1/2 supply the second occurrences, disjointly
    corpus = {
        0: ["a", "b", "c", "d", "e", "tail0", "tail1"],
        1: ["a", "b", "c", "pad1", "pad2"],
        2: ["pad3", "pad4", "c", "d", "e"],
    }
    _check_against_brute(spark, corpus, n=3)
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )
    spans = [
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substring_spans(docs, n=3).collect()
    ]
    assert (0, 0, 4) in spans  # merged, not [0,2]+[2,4]
    assert len([s for s in spans if s[0] == 0]) == 1


def test_exact_substring_randomized_vs_brute(spark):
    """Randomized low-alphabet corpora: duplicated runs arise naturally at
    every length, so run-merging, doc boundaries, and the dense-position
    re-index (double spaces injected) are all exercised against the
    by-definition oracle."""
    rng = random.Random(41)
    words = ["a", "b", "c", "d"]
    for trial in range(3):
        corpus = {
            d: [rng.choice(words) for _ in range(rng.randint(0, 14))]
            for d in range(10)
        }
        _check_against_brute(spark, corpus, n=4)


def test_exact_substring_dense_positions_with_messy_whitespace(spark):
    """Double spaces produce empty split artifacts; positions must be
    re-indexed densely or the coverage window misfires."""
    docs = spark.createDataFrame(
        [
            (0, "u  v  w x y z  padA padB"),
            (1, "u v w x y  z other tokens here"),
        ],
        "doc_id long, text string",
    )
    spans = [
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in exact_substring_spans(docs, n=6).collect()
    ]
    # 'u v w x y z' occupies dense positions 0..5 in both docs
    assert (0, 0, 5, 6) in spans and (1, 0, 5, 6) in spans
    out = exact_substring_clean(docs, n=6)
    rows = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    from wolf_quake_spark.analysis import persisted_handles

    for handle in persisted_handles(out):
        handle.unpersist()
    assert rows[0] == "padA padB"
    assert rows[1] == "other tokens here"


def test_exact_substring_plan_is_vectorized(spark):
    """House invariant for new operators: no per-row Python, no cartesian
    product anywhere in the plan."""
    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e g")], "doc_id long, text string"
    )
    for frame in (
        exact_substring_spans(docs, n=5),
        exact_substring_clean(docs, n=5),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        from wolf_quake_spark.analysis import persisted_handles

        for handle in persisted_handles(frame):
            handle.unpersist()
