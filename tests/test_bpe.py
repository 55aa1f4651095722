"""BPE tokenizer training: Spark result vs an independent pure-Python
reference of the same deterministic merge procedure (word-freq weighted
pair counts, (cnt desc, left, right) tie order, 3-pass wrapped-replace
merge — see analysis/bpe.py for why that variant and how it differs from
textbook greedy-left on odd chains)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from wolf_quake_spark.analysis.bpe import bpe_learn, bpe_token_lengths


def _py_merge_once(seq: str, left: str, right: str) -> str:
    out = f" {seq} "
    for _ in range(3):
        out = out.replace(f" {left} {right} ", f" {left}{right} ")
    return out.strip()


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    seqs = {w: " ".join(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, f in word_freqs.items():
            syms = seqs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, cnt))
        seqs = {w: _py_merge_once(s, l, r) for w, s in seqs.items()}
    return merges, seqs


CORPUS = [
    (0, "low low low lower lowest"),
    (1, "new newer newest wide wider"),
    (2, "low wide new new new"),
    (3, "aaaaa aaa aa a"),  # odd chains exercise the 3-pass fixpoint
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _word_freqs() -> dict[str, int]:
    freqs: Counter = Counter()
    for _, text in CORPUS:
        freqs.update(t for t in re.split(r" ", text) if t)
    return dict(freqs)


def test_bpe_merge_table_matches_reference(spark, docs):
    merges, vocab_final = bpe_learn(spark, docs, n_merges=6)
    got = [tuple(r) for r in merges.orderBy("rank").collect()]
    want, _ = _py_bpe(_word_freqs(), 6)
    assert got == want
    h = getattr(vocab_final, "_wqs_persisted", None)
    if h is not None:
        h.unpersist()


def test_bpe_final_sequences_match_reference(spark, docs):
    _, vocab_final = bpe_learn(spark, docs, n_merges=6)
    got = {r["word"]: r["seq"] for r in vocab_final.collect()}
    _, want = _py_bpe(_word_freqs(), 6)
    assert got == want
    h = getattr(vocab_final, "_wqs_persisted", None)
    if h is not None:
        h.unpersist()


def test_bpe_token_lengths_sum(spark, docs):
    out = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_lengths(spark, docs).collect()
    }
    _, seqs = _py_bpe(_word_freqs(), 8)
    want = {
        doc_id: sum(len(seqs[t].split(" ")) for t in text.split(" ") if t)
        for doc_id, text in CORPUS
    }
    assert out == want


def test_three_pass_replace_reaches_fixpoint():
    """A 4th pass never changes anything the 3rd didn't (chain cases)."""
    for chain_len in range(1, 12):
        seq = " ".join("a" * 1 for _ in range(chain_len))
        three = _py_merge_once(seq, "a", "a")
        four = f" {three} ".replace(" a a ", " aa ").strip()
        assert three == four, chain_len


def _rich_corpus(spark, n_words: int = 400):
    """Deterministic corpus with enough distinct adjacent pairs to sustain
    hundreds of merges: words are base-7 digit strings over a 7-letter
    alphabet, lengths 8-15, frequencies varying by index."""
    letters = "abcdefg"
    rows = []
    for i in range(n_words):
        x, word = i * 2654435761 % (1 << 31), []
        for _ in range(8 + i % 8):
            word.append(letters[x % 7])
            x //= 7
            if x == 0:
                x = i + 13
        rows.append((i, (" ".join(["".join(word)] * (1 + i % 5)))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_scale_merges_match_reference_and_plan_bounded(spark):
    """256-merge run (the scale-real budget class, vs the fixture's 8):

    * results still match the sequential reference exactly — the lineage
      cut is a pure execution detail;
    * the live plan stays bounded: with checkpoint_every=16 the final
      frame's analyzed-plan size must not grow with the merge budget
      (an unbroken 256-chain is ~16x larger and blows up Catalyst
      analysis time at real tokenizer budgets of 32k).
    """
    docs = _rich_corpus(spark)
    merges, vocab_final = bpe_learn(spark, docs, n_merges=256, checkpoint_every=16)
    got = [tuple(r) for r in merges.orderBy("rank").collect()]

    freqs: Counter = Counter()
    for r in docs.collect():
        freqs.update(t for t in r["text"].split(" ") if t)
    want, want_seqs = _py_bpe(dict(freqs), 256)
    assert got == want
    assert len(got) == 256  # the corpus really sustains the budget

    final = {r["word"]: r["seq"] for r in vocab_final.collect()}
    assert final == want_seqs

    # plan-depth pin: at most checkpoint_every replace-chains live.  The
    # analyzed plan of an unbroken chain holds one Project per merge; the
    # cut frame holds <= 16 + a scan, so its tree stays under ~40 nodes.
    n_nodes = len(
        vocab_final._jdf.queryExecution().analyzed().toString().splitlines()
    )
    assert n_nodes < 60, n_nodes

    h = getattr(vocab_final, "_wqs_persisted", None)
    if h is not None:
        h.unpersist()


def test_bpe_incremental_equals_full_with_no_extra_jobs(spark):
    """The incremental pair-count maintenance (deltas from the applied
    merge: only Contains-matching words change any counts) must produce a
    BIT-IDENTICAL merge table to the full per-round recount, at NO extra
    Spark jobs, and the per-round top-1 source must actually BE the delta
    structure (Contains-filtered vocabulary feeding the pair table) while
    the full path's source is the whole-vocab explode with no filter."""
    docs = _rich_corpus(spark, n_words=200)
    sc = spark.sparkContext
    N = 48

    sc.setJobGroup("bpe_full", "full recount")
    probe_full: dict = {}
    m_full, vf_full = bpe_learn(
        spark, docs, n_merges=N, incremental=False, plan_probe=probe_full
    )
    rows_full = [tuple(r) for r in m_full.orderBy("rank").collect()]
    jobs_full = len(sc.statusTracker().getJobIdsForGroup("bpe_full"))

    sc.setJobGroup("bpe_incr", "incremental deltas")
    probe_incr: dict = {}
    m_incr, vf_incr = bpe_learn(
        spark, docs, n_merges=N, incremental=True, plan_probe=probe_incr
    )
    rows_incr = [tuple(r) for r in m_incr.orderBy("rank").collect()]
    jobs_incr = len(sc.statusTracker().getJobIdsForGroup("bpe_incr"))
    sc.setJobGroup("bpe_done", "")

    assert rows_incr == rows_full
    assert len(rows_incr) == N
    assert jobs_incr <= jobs_full, (jobs_incr, jobs_full)

    # plan pins: the incremental delta aggregates Contains-filtered
    # affected words only, over a lineage-cut pair table (the per-round
    # source is a bare checkpointed scan, not a whole-vocab explode);
    # the full source explodes the whole vocabulary with no such filter
    assert "Contains(" in probe_incr["delta_plan"]
    assert "LogicalRDD" in probe_incr["source_plan"]
    assert "Contains(" not in probe_full["source_plan"]
    assert "explode" in probe_full["source_plan"]

    for vf in (vf_full, vf_incr):
        h = getattr(vf, "_wqs_persisted", None)
        if h is not None:
            h.unpersist()
