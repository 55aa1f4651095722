"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation split.

The standard training-data hygiene step (remove eval contamination before
training): shingle both sides, join on the shingle, report per-train-doc hit
counts.  The split is the same deterministic Knuth multiplicative hash used
by the ``train_val_split`` manifest query, so the benchmark set is stable
across runs and cluster sizes.

100 TB shape: the benchmark side of the join is a fixed eval suite — tiny
relative to the corpus — so its distinct-shingle frame is broadcast and the
100 TB train side never shuffles; per-doc hit counts are one hash aggregate
keyed on doc_id.  Joining on ``md5(shingle)`` (32 chars) rather than the raw
n-gram bounds key width regardless of token lengths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.dedup import word_shingles

# Knuth multiplicative hash — must stay identical to the train_val_split
# manifest query so "test" means the same documents everywhere.
KNUTH = 2654435761
HASH_MOD = 4294967296


def split_bucket(doc_id: Column) -> Column:
    """Deterministic 0..999 bucket; <800 train, <900 val, else test."""
    return ((doc_id * F.lit(KNUTH)) % F.lit(HASH_MOD)) % F.lit(1000)


def contamination_report(
    docs: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-train-doc count of distinct word ``n``-grams that also occur
    anywhere in the held-out test split.  Train docs with zero overlap are
    absent (the common case — emit the hits, not the clean majority)."""
    b = split_bucket(F.col("doc_id"))
    train = docs.filter(b < 800).select("doc_id", text_col)
    bench = docs.filter(b >= 900).select("doc_id", text_col)
    tsh = word_shingles(train, n=n, text_col=text_col).select(
        "doc_id", F.md5("shingle").alias("h")
    )
    bsh = (
        word_shingles(bench, n=n, text_col=text_col)
        .select(F.md5("shingle").alias("h"))
        .distinct()
    )
    return (
        tsh.join(F.broadcast(bsh), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
