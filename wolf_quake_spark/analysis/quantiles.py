"""Exact distributed quantiles WITHOUT a global sort: iterative histogram
refinement (the classic "median of a billion numbers" scale pattern,
cf. Munro-Paterson 1980 selection rounds).

Beyond-reference surface (the reference, nicolasauler/wolf_quake, computes
only count/sum aggregates — src/report.rs).  Spark's own exact
``percentile`` aggregate buffers every value per group, and a global
``orderBy`` ships the whole column through one range-partitioned sort —
both are non-starters at 10^12 rows.  This operator answers exact
(discrete) quantiles in O(log_B(n / threshold)) full scans with only
B-row histograms ever reaching the driver:

1. One scan: n, min, max (plus the shared round-1 histogram).
2. Each round buckets the surviving rows into B equal-width cells via a
   pure-column expression, collects the ≤B cell counts (bounded driver
   state, the k-means-centroid convention), and narrows to the single
   cell containing the target rank, accumulating the exact count of rows
   below it.
3. When ≤ ``exact_threshold`` rows survive, the j-th smallest is taken
   with orderBy().limit(j) (TakeOrderedAndProject — a top-j heap, not a
   global sort) and max().

Rank convention matches DuckDB ``quantile_disc``: k = max(1, ceil(q·n)),
value is an ACTUAL data value (no interpolation) — so the result is
oracle-pairable bit-for-bit (the emitted double is copied from the data,
never computed).

Float-edge safety: every narrowing filter is the SAME bucket-index
expression the histogram counted (``floor((v-lo)/width)`` clamped to
B-1), so the row set whose size we recorded and the row set we keep are
identical by construction — boundary ulps can't desynchronize the rank
accounting.  With B=4096 and threshold=100k, 10^12 rows need 2 rounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def _bucket_idx(value_col, lo: float, width: float, buckets: int):
    return F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(buckets - 1),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles=(0.5, 0.9, 0.99),
    buckets: int = 4096,
    exact_threshold: int = 100_000,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact discrete quantiles of ``value_col`` (nulls ignored), returned
    as a small (quantile, value) DataFrame sorted by quantile."""
    spark = df.sparkSession
    vals = df.select(value_col).filter(F.col(value_col).isNotNull())
    vals = vals.persist(StorageLevel.DISK_ONLY)
    stats = vals.agg(
        F.count("*").alias("n"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    ).collect()[0]
    n, g_lo, g_hi = stats.n, stats.lo, stats.hi
    if n == 0:
        vals.unpersist()
        return spark.createDataFrame([], "quantile double, value double")

    # Shared round-1 histogram over the full range, computed once.
    base_width = (g_hi - g_lo) / buckets if g_hi > g_lo else 0.0
    if base_width > 0:
        base_hist = dict(
            vals.groupBy(
                _bucket_idx(value_col, g_lo, base_width, buckets).alias("b")
            )
            .count()
            .collect()
        )
    if base_width == 0.0:  # all values identical — no refinement needed
        vals.unpersist()
        return spark.createDataFrame(
            [(float(q), float(g_lo)) for q in quantiles],
            "quantile double, value double",
        ).orderBy("quantile")

    results = []
    for q in quantiles:
        k = max(1, math.ceil(q * n))
        pred = F.lit(True)
        lo, width, rank_below, in_range = g_lo, base_width, 0, n
        hist = dict(base_hist) if base_width > 0 else {}
        rounds = 0
        while (
            width > 0 and in_range > exact_threshold and rounds < max_rounds
        ):
            cum = rank_below
            for b in range(buckets):
                c = hist.get(b, 0)
                if cum + c >= k:
                    pred = pred & (
                        _bucket_idx(value_col, lo, width, buckets) == b
                    )
                    rank_below = cum
                    in_range = c
                    lo = lo + b * width
                    width = width / buckets
                    break
                cum += c
            else:  # k beyond counted mass (can't happen; guard anyway)
                raise AssertionError("rank accounting desynchronized")
            rounds += 1
            if width > 0 and in_range > exact_threshold:
                hist = dict(
                    vals.filter(pred)
                    .groupBy(
                        _bucket_idx(value_col, lo, width, buckets).alias("b")
                    )
                    .count()
                    .collect()
                )
        j = k - rank_below
        v = (
            vals.filter(pred)
            .orderBy(F.col(value_col).asc())
            .limit(j)
            .agg(F.max(value_col).alias("v"))
            .collect()[0]
            .v
        )
        results.append((float(q), float(v)))
    vals.unpersist()
    return spark.createDataFrame(
        results, "quantile double, value double"
    ).orderBy("quantile")


def exact_quantiles_sql(
    table: str, value_col: str, quantiles=(0.5, 0.9, 0.99)
) -> str:
    """DuckDB mirror of :func:`exact_quantiles`: ``quantile_disc`` shares
    the k = max(1, ceil(q·n)) discrete-rank convention, and the value is
    copied from the data in both engines — bit-identical doubles."""
    selects = [
        f"SELECT CAST({q!r} AS DOUBLE) AS quantile,"
        f" quantile_disc({value_col}, {q!r}) AS value FROM {table}"
        for q in quantiles
    ]
    return " UNION ALL ".join(selects)
