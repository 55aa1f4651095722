"""Distributed BPE (byte-pair-encoding) tokenizer training.

The tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): learn the
top-N symbol merges from corpus word frequencies, then re-tokenize documents
with the learned merge table.

Scale design (100 TB corpus, 1000 executors):

* The corpus is touched ONCE — a single explode + hash-aggregate builds the
  word-frequency vocabulary, which is the only state the learner ever
  iterates over.  Vocabulary size is sub-linear in corpus size (Heaps' law,
  see ``vocab_growth_heaps``), so the iteration working set is millions of
  rows when the corpus is trillions.
* Each merge round is ONE hash-aggregate over the persisted vocabulary
  (adjacent-pair counts weighted by word frequency) followed by a narrow
  per-row ``replace`` — no shuffle beyond the agg, no growth in plan depth
  because the winning pair is collected to the driver as a SCALAR (one row
  per round, the same driver-touch discipline as the k-means quantizer in
  ``similarity.kmeans_fit`` and the convergence probe in
  ``dedup.label_propagate``).
* Applying the learned merges to score documents is a broadcast-free
  token-keyed join (word → post-merge symbol count): the vocabulary may be
  too big to broadcast at web scale, so it stays a shuffle join on the word
  key.

Merge semantics (engine-portable, oracle-exact): a word is held as its
space-separated symbol sequence; merging pair (l, r) rewrites
``' l r '`` → ``' lr '`` on the space-wrapped sequence with THREE
left-to-right non-overlapping ``replace`` passes.  One pass can miss
alternating occurrences in a chain (``a a a a`` → ``aa a a`` because the
first match consumes the shared space); a second pass catches the
stragglers, and the third is a safety margin so both engines provably reach
the same fixpoint.  Spark's ``replace`` and DuckDB's ``replace`` share
left-to-right non-overlapping semantics (verified: both map
``' a a a a a '`` → ``' aa a aa '``), so the oracle is bit-exact.  Note
this differs from textbook greedy-left BPE on odd chains (textbook gives
``aa aa a``; the delimiter-replace fixpoint gives ``aa a aa``) — the
procedure is a deterministic, order-consistent variant, applied identically
at learn and apply time.

Ties on pair count break on (left ASC, right ASC) so merge tables are
reproducible run-over-run — a hard requirement for tokenizers (the merge
table IS the model artifact).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MERGES = 8

# Lineage-cut cadence for the merge loop: each round stacks one
# three-replace projection onto the vocabulary frame, so an unbroken chain
# grows the logical plan linearly in merges — unnoticeable at the
# fixture's 8, unplannable at a real tokenizer's 32k (Catalyst analysis
# time and plan size blow up long before data does).  An eager
# localCheckpoint every R rounds bounds the live plan at R replace-chains
# (same trade as the BFS frontier cut in analysis/graph.py, measured
# 24 s -> 4 s there; a production cluster would use reliable checkpointing
# on the same cadence).
BPE_CHECKPOINT_EVERY = 16


def word_freqs(docs: DataFrame) -> DataFrame:
    """Corpus word-frequency vocabulary: the single full-corpus pass."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _char_seq(word) -> F.Column:
    """Initial symbol sequence: the word's characters joined by spaces."""
    return F.concat_ws(" ", F.split(word, ""))


def _merge_once(seq: F.Column, left: str, right: str) -> F.Column:
    """Apply one learned merge with the 3-pass wrapped-replace (see module
    docstring for why three passes and why this is engine-portable)."""
    needle = F.lit(f" {left} {right} ")
    repl = F.lit(f" {left}{right} ")
    out = F.concat(F.lit(" "), seq, F.lit(" "))
    for _ in range(3):
        out = F.replace(out, needle, repl)
    return F.trim(out)


def _pair_rows(vocab_seq: DataFrame) -> DataFrame:
    """Ungrouped (l, r, freq) rows — one per adjacent symbol pair of every
    word (split out of :func:`_adjacent_pairs` so the incremental learner
    can feed signed pair rows into a SINGLE merge aggregation)."""
    pairs = F.expr(
        "transform(slice(split(seq, ' '), 1, greatest(size(split(seq, ' ')) - 1, 0)),"
        " (x, i) -> struct(x AS l, split(seq, ' ')[i + 1] AS r))"
    )
    return vocab_seq.select("freq", F.explode(pairs).alias("p")).select(
        F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq"
    )


def _adjacent_pairs(vocab_seq: DataFrame) -> DataFrame:
    """(left, right, freq) for every adjacent symbol pair of every word."""
    return _pair_rows(vocab_seq).groupBy("l", "r").agg(F.sum("freq").alias("cnt"))


def bpe_learn(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = N_MERGES,
    checkpoint_every: int = BPE_CHECKPOINT_EVERY,
    incremental: bool = True,
    plan_probe: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges; returns ``(merges, vocab_final)``.

    ``merges``: (rank, left_sym, right_sym, merged, pair_count) — a literal
    driver-side frame (n_merges rows; the model artifact).
    ``vocab_final``: (word, freq, seq) with all merges applied — the lookup
    table the apply step joins against.

    Driver traffic is exactly ``n_merges`` single-row collects; every other
    byte stays on executors.  The vocabulary is persisted once (DISK_ONLY,
    repo convention), and the sequence frame's lineage is cut every
    ``checkpoint_every`` rounds so the live plan never exceeds that many
    replace-chains regardless of the merge budget (see
    ``BPE_CHECKPOINT_EVERY``) — plan depth is O(R), not O(n_merges).

    ``incremental=True`` (default) maintains the adjacent-pair counts as
    DELTAS from each applied merge instead of a full ``_adjacent_pairs``
    recount per round: only words CONTAINING the merged pair change any
    counts, so round t's aggregation input is the (persisted) pair table
    plus the exploded pairs of the affected words only — a narrow
    ``contains`` filter over the vocabulary replaces the full
    explode+shuffle (the classic sequential-BPE optimization, Sennrich's
    own implementation note, made distributive because pair-count deltas
    are additive).  On a clean corpus the affected set shrinks every
    round while the full recount stays O(total symbols).  The merge
    table is bit-identical either way (pinned in tests/test_bpe.py)."""
    vocab = word_freqs(docs).persist(StorageLevel.DISK_ONLY)
    cur = vocab.select("word", "freq", _char_seq("word").alias("seq"))
    merges: list[tuple] = []
    pc = _adjacent_pairs(cur).localCheckpoint(eager=False) if incremental else None
    for rank in range(1, n_merges + 1):
        source = pc if incremental else _adjacent_pairs(cur)
        top = (
            source.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] is None:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, l, r, l + r, cnt))
        if plan_probe is not None:
            # test hook: the analyzed plan the top-1 collect just ran
            # against (last round wins) — pins the incremental source
            # shape (Contains-filtered deltas over a cached/checkpointed
            # pair table vs the full path's whole-vocab explode)
            plan_probe["rounds"] = rank
            plan_probe["source_plan"] = (
                source._jdf.queryExecution().analyzed().toString()
            )
        if incremental:
            # words whose counts can change are exactly those containing
            # the winning pair; their before/after pair multisets form an
            # additive delta against the standing pair table
            needle = F.lit(f" {l} {r} ")
            affected = cur.filter(
                F.concat(F.lit(" "), F.col("seq"), F.lit(" ")).contains(needle)
            )
            merged_aff = affected.withColumn(
                "seq", _merge_once(F.col("seq"), l, r)
            )
            # SIGNED pair rows: −freq for the pre-merge sequences, +freq
            # for the post-merge ones — so the whole round is ONE union +
            # ONE hash agg (the same single-shuffle shape as a full
            # recount round, but over affected words only)
            signed = affected.select(
                (-F.col("freq")).alias("freq"), "seq"
            ).unionByName(merged_aff.select("freq", "seq"))
            delta = _pair_rows(signed).select(
                "l", "r", F.col("freq").alias("cnt")
            )
            # LAZY localCheckpoint EVERY round: the pair table is the
            # loop-carried state, so without a cut its plan compounds
            # (each round embeds the previous round's union+agg AND the
            # delta's replace-chain projections — measured: driver OOM in
            # plan-string generation by merge ~200).  The lazy cut is
            # materialized by the NEXT round's top-1 collect, so the
            # incremental path adds zero extra jobs over the full recount
            # (pinned in tests/test_bpe.py); the checkpoint blocks of
            # retired rounds are reclaimed by the ContextCleaner once
            # unreferenced (dedup.py convention).
            merged_pc = (
                pc.unionByName(delta)
                .groupBy("l", "r")
                .agg(F.sum("cnt").alias("cnt"))
                .filter(F.col("cnt") > 0)
            )
            if plan_probe is not None:
                # the PRE-cut plan: must show the Contains-filtered
                # vocabulary feeding the delta (incremental evidence)
                plan_probe["delta_plan"] = (
                    merged_pc._jdf.queryExecution().analyzed().toString()
                )
            pc = merged_pc.localCheckpoint(eager=False)
        cur = cur.withColumn("seq", _merge_once(F.col("seq"), l, r))
        if checkpoint_every and rank % checkpoint_every == 0:
            # the checkpointed RDD blocks of earlier cuts are reclaimed by
            # the ContextCleaner once unreferenced (dedup.py convention)
            cur = cur.localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(
        merges, "rank int, left_sym string, right_sym string, merged string, pair_count bigint"
    )
    vocab_final = cur
    vocab_final._wqs_persisted = vocab  # caller releases (repo convention)
    return merges_df, vocab_final


def bpe_token_lengths(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-document token count after applying the learned merges:
    Σ over the document's words of the word's post-merge symbol count.

    The word → symbol-count lookup is a token-keyed shuffle join (the
    vocabulary is not broadcastable at web scale); the per-doc sum is one
    hash-agg.
    """
    _, vocab_final = bpe_learn(spark, docs)
    lens = vocab_final.select(
        "word", F.size(F.split("seq", " ")).alias("n_syms")
    )
    doc_words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )
    out = (
        doc_words.join(lens, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").alias("n_bpe_tokens"))
    )
    out._wqs_persisted = getattr(vocab_final, "_wqs_persisted", None)
    return out
