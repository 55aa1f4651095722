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


def _bloom_words(
    bench_hashes: DataFrame, n_items: int, bits_per_item: int, k: int
) -> tuple[list[int], int]:
    """Build a Bloom bitset (as a list of signed int64 words) from the
    ``h`` column of ``bench_hashes``.

    Bit positions are k independently-seeded ``xxhash64`` values mod m; the
    bitset is assembled by a distributed ``bit_or`` reduce keyed on the word
    index, so the driver only ever collects ≤ m/64 rows regardless of the
    benchmark-set size.  Returns (words, m_bits).
    """
    m = max(1024, 1 << (n_items * bits_per_item - 1).bit_length())
    pos = bench_hashes.select(
        F.explode(
            F.array(
                *[F.pmod(F.xxhash64("h", F.lit(i)), F.lit(m)) for i in range(k)]
            )
        ).alias("p")
    )
    words = (
        pos.selectExpr(
            "cast(p div 64 as int) as w",
            "shiftleft(cast(1 as bigint), cast(p % 64 as int)) as bit",
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    arr = [0] * (m // 64)
    for r in words:
        arr[r["w"]] = r["bits"]
    return arr, m


def bloom_contamination_report(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    bits_per_item: int = 16,
    k: int = 4,
) -> DataFrame:
    """Same output as :func:`contamination_report`, via a broadcast Bloom
    prefilter + exact verify join.

    100 TB shape: when the eval suite's distinct-shingle set is too large to
    broadcast as a hash relation (10^9 shingles ≈ tens of GB of join state
    per executor) it still fits as a Bloom bitset (~2 GB at 16 bits/item,
    FPP ≈ 0.24 % with k=4).  The corpus side stays map-only: k seeded
    xxhash64 probes against the broadcast bitset, all JVM-side SQL — no
    Python, no shuffle.  Only the tiny surviving candidate stream reaches
    the exact verify join, which removes Bloom false positives, so the
    result is *exactly* the exact-join semantics (Bloom filters have no
    false negatives).
    """
    b = split_bucket(F.col("doc_id"))
    train = docs.filter(b < 800).select("doc_id", text_col)
    bench = docs.filter(b >= 900).select("doc_id", text_col)
    bsh = (
        word_shingles(bench, n=n, text_col=text_col)
        .select(F.md5("shingle").alias("h"))
        .distinct()
    )
    bsh = bsh.persist()
    try:
        n_items = bsh.count()
        arr, m = _bloom_words(bsh, n_items, bits_per_item, k)
        spark = docs.sparkSession
        bloom = spark.createDataFrame([(arr,)], "bf array<bigint>")
        tsh = word_shingles(train, n=n, text_col=text_col).select(
            "doc_id", F.md5("shingle").alias("h")
        )
        probe = tsh.crossJoin(F.broadcast(bloom))
        for i in range(k):
            p = f"pmod(xxhash64(h, {i}), {m})"
            probe = probe.filter(
                F.expr(
                    f"(element_at(bf, cast({p} div 64 as int) + 1)"
                    f" & shiftleft(cast(1 as bigint), cast({p} % 64 as int))) != 0"
                )
            )
        return (
            probe.join(F.broadcast(bsh), "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_contaminated_ngrams"))
        )
    finally:
        bsh.unpersist()


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
