"""Corpus-construction operators: composed document filters (C4/Gopher
style), token-budget sequence packing, and sliding-window chunking.

These are the steps between "scored" and "training-ready" in an LLM data
pipeline: decide per-doc keep/drop from a chain of named rules, lay the
survivors out into fixed-token-budget training sequences, and cut long
documents into overlapping context windows.  All three are built from
engine-portable primitives (length/replace arithmetic, Knuth multiplicative
hashes, window cumsums) so each has an exact DuckDB oracle.

Scale notes are on each function; none uses RNG, ``df.sample``, or any
partition-order-dependent construct, so outputs are identical on 1 core or
1000 executors and across task retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wolf_quake_spark.analysis.contamination import HASH_MOD, KNUTH
from wolf_quake_spark.analysis.textstats import (
    stopword_scores,
    substring_count,
    token_count,
)


def filter_chain(
    docs: DataFrame, text_col: str = "text", keep_all: bool = False
) -> DataFrame:
    """Per-document verdicts from a chain of named quality rules, C4 /
    Gopher style: each rule is a column of 0/1, ``keep`` is their AND, so
    downstream can both filter (``keep = 1``) and report per-rule drop
    counts — the funnel metric every corpus pipeline logs.

    Rules (integer-exact, portable):
      * ``f_min_tokens``  — ≥ 5 whitespace tokens (too-short fragment gate)
      * ``f_max_tokens``  — ≤ 100000 tokens (runaway-document gate)
      * ``f_word_len``    — mean token length in [2, 12] chars (Gopher's
        mean-word-length band; catches binary junk and char-soup)
      * ``f_stopword``    — ≥ 1 stopword hit in any language profile
        (Gopher's "has function words" signal)
      * ``f_ellipsis``    — "..." occurrences ≤ 10% of tokens (C4 drops
        ellipsis-heavy boilerplate lines)
      * ``f_brace``       — no '{' (C4 drops pages containing code braces)

    100 TB shape: pure narrow projection — no shuffle, no UDF; the whole
    chain rides the parquet scan and Catalyst prunes to (doc_id, text).

    ``keep_all=True`` returns the input columns plus ``keep`` (no per-rule
    verdicts) — the streaming-safe form (pure projection of the stream).
    """
    t = F.col(text_col)
    n_tokens = token_count(t).cast("long")
    n_chars = F.length(t)
    n_spaces = n_chars - F.length(F.replace(t, F.lit(" "), F.lit("")))
    mean_tok_len_x100 = F.when(
        n_tokens > 0, F.floor((n_chars - n_spaces) * 100 / n_tokens)
    ).otherwise(F.lit(0))
    stops = stopword_scores(t)
    any_stop = sum(list(stops.values())[1:], list(stops.values())[0])
    ellipsis = substring_count(t, "...")

    def b(c) -> Column:
        return F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")

    f_min = b(n_tokens >= 5)
    f_max = b(n_tokens <= 100000)
    f_wl = b((mean_tok_len_x100 >= 200) & (mean_tok_len_x100 <= 1200))
    f_stop = b(any_stop >= 1)
    f_ell = b(ellipsis * 10 <= n_tokens)
    f_brace = b(substring_count(t, "{") == 0)
    keep = f_min * f_max * f_wl * f_stop * f_ell * f_brace
    if keep_all:
        return docs.withColumn("keep", keep)
    return docs.select(
        "doc_id",
        f_min.alias("f_min_tokens"),
        f_max.alias("f_max_tokens"),
        f_wl.alias("f_word_len"),
        f_stop.alias("f_stopword"),
        f_ell.alias("f_ellipsis"),
        f_brace.alias("f_brace"),
        keep.alias("keep"),
    )


# Packing salt: decorrelates the pack order from the sampling bucket
# (analysis/sampling.py salt=12345) and the split hash (salt=0).
PACK_SALT = 777


def pack_manifest(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence-packing manifest: where each document
    lands when the corpus is concatenated (in a deterministic shuffled
    order) and cut into fixed ``budget``-token training sequences — the
    GPT-style dataloader layout.

    Documents are assigned to ``n_shards`` independent pack streams by a
    Knuth hash of ``doc_id`` (a real pipeline packs per output shard so no
    global order exists), ordered within the shard by a second hash (the
    deterministic stand-in for "shuffle before packing"), then laid out by
    a window cumsum.  Emitted per doc: the shard, its token offset, and the
    first/last training-sequence index it touches (a doc may straddle a
    boundary — concat-and-chunk splits it, so ``n_bins`` > 1 records that).

    100 TB shape: one narrow projection + one hash-partitioned window
    cumsum per shard — a single shuffle keyed on ``shard``; no global sort,
    no single-partition window (the shard count bounds per-task state and
    scales with the cluster).  Zero-token docs are dropped before packing
    (they occupy no space; keeping them would make start_bin ambiguous).
    """
    h = (F.col("doc_id") * F.lit(KNUTH) + F.lit(PACK_SALT)) % F.lit(HASH_MOD)
    tok = token_count(F.col(text_col)).cast("long")
    base = docs.select(
        "doc_id",
        (h % F.lit(n_shards)).alias("shard"),
        (h % F.lit(1000003)).alias("pos_key"),
        tok.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("pos_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        (end - F.col("n_tokens")).alias("tok_offset"),
        F.floor((end - F.col("n_tokens")) / F.lit(budget)).alias("start_bin"),
        F.floor((end - 1) / F.lit(budget)).alias("end_bin"),
        (
            F.floor((end - 1) / F.lit(budget))
            - F.floor((end - F.col("n_tokens")) / F.lit(budget))
            + 1
        ).alias("n_bins"),
    )


def doc_chunks(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: cut each document into ``size``-char
    windows advancing by ``stride`` (overlap = size - stride) — the
    context-window preparation step for embedding/RAG indexing.

    Chunk starts are ``0, stride, 2*stride, …`` while the start is inside
    the text; the final chunk may be shorter than ``size``.  Empty/NULL
    text emits no chunks.  Offsets are **character**-based in both engines
    (Spark ``substring``/``length`` and DuckDB ``substr``/``length`` count
    code points, not bytes), so the oracle is exact on non-ASCII too.

    100 TB shape: ``sequence`` + ``explode`` is a narrow flatMap — no
    shuffle, no UDF; output rows ≈ n_chars/stride per doc, generated
    streamwise inside the scan stage.
    """
    t = F.col(text_col)
    n = F.length(t)
    starts = F.sequence(
        F.lit(0),
        F.when(n > 0, n - 1).otherwise(F.lit(0)),
        F.lit(stride),
    )
    exploded = (
        docs.filter(t.isNotNull() & (n > 0))
        .select("doc_id", t.alias("_t"), F.explode(starts).alias("start"))
    )
    chunk = F.substring(F.col("_t"), F.col("start") + 1, size)
    return exploded.select(
        "doc_id",
        (F.col("start") / F.lit(stride)).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )
