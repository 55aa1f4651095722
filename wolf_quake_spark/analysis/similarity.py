"""Similarity search over embedding columns (array<float>).

Determinism note: all scores are computed from integer-quantized components
(round(x*1000) as long), so sums are exact regardless of aggregation order,
and the final cosine is a single correctly-rounded double expression — the
DuckDB oracle reproduces results bit-for-bit.

Scale design:

* ``cosine_scores`` — brute-force baseline: broadcast the query vector,
  one narrow pass (``zip_with`` + ``aggregate``, JVM-side, no shuffle).
* ``ivf_assign`` / ``ivf_search`` — the scale path: a coarse inverted-file
  quantizer (hash-bucketed here; k-means centroids on a real corpus) so a
  query only scans its probe buckets — turns a full scan into a
  partition-pruned one when the table is written bucketed by ``bucket``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1000


def _quant(col: Column) -> Column:
    return F.transform(col, lambda x: F.round(x * SCALE).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_scores(
    embeddings: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine of every row against the query (brute-force baseline)."""
    q = [int(round(x * SCALE)) for x in query_vec]
    qcol = F.array(*[F.lit(v).cast("long") for v in q])
    qn = sum(v * v for v in q)
    e = _quant(F.col(vec_col))
    dot = _dot(e, qcol)
    en = _dot(e, e)
    cos = dot.cast("double") / F.sqrt((en * F.lit(qn)).cast("double"))
    return embeddings.select(
        "vec_id", dot.alias("dot"), F.when(en > 0, cos).otherwise(F.lit(0.0)).alias("cosine")
    )


def topk(embeddings: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    return cosine_scores(embeddings, query_vec).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(k)


def ivf_assign(embeddings: DataFrame, n_buckets: int = 16, vec_col: str = "embedding") -> DataFrame:
    """Coarse quantizer: sign pattern of the first 4 quantized dims → bucket.

    A stand-in for k-means centroids that stays deterministic and
    engine-portable; the *plumbing* (bucketed layout, probe-limited scan) is
    the part that matters at scale.
    """
    e = _quant(F.col(vec_col))
    bits = [
        F.when(F.element_at(e, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(4)
    ]
    bucket = sum(bits[1:], bits[0]) % n_buckets
    return embeddings.withColumn("bucket", bucket.cast("int"))


def neardup_pairs(
    embeddings: DataFrame,
    top: int = 20,
    n_buckets: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed.

    The self-join is restricted to vectors sharing a coarse bucket — the
    standard blocking trick that turns the O(n²) all-pairs problem into
    Σ bucket² work.  At 100 TB the embeddings table is written bucketed by
    ``bucket`` so the join is shuffle-free (co-located); here the bucket
    column keys an ordinary hash join.  Output is the ``top`` most-similar
    pairs with deterministic (cosine desc, ids asc) tiebreaks.
    """
    quant = _quant(F.col(vec_col))
    # self-norm computed once per vector BEFORE the join — per-pair work is
    # then a single dot product instead of three O(dim) aggregates
    assigned = ivf_assign(embeddings, n_buckets, vec_col=vec_col).select(
        "vec_id", "bucket", quant.alias("qe"), _dot(quant, quant).alias("nn")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dot = _dot(F.col("a.qe"), F.col("b.qe"))
    na = F.col("a.nn")
    nb = F.col("b.nn")
    cos = F.when(
        (na > 0) & (nb > 0), dot.cast("double") / F.sqrt((na * nb).cast("double"))
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(top)
    )


def ivf_search(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, n_buckets: int = 16
) -> DataFrame:
    """Probe only the query's bucket, then brute-force inside it."""
    assigned = ivf_assign(embeddings, n_buckets)
    q = [int(round(x * SCALE)) for x in query_vec]
    qbucket = sum((1 << i) if q[i] >= 0 else 0 for i in range(4)) % n_buckets
    probe = assigned.filter(F.col("bucket") == qbucket)
    return topk(probe, query_vec, k=k)
