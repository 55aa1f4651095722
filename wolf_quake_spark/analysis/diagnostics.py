"""Plan-time statistics / skew diagnostics — the numbers a 100 TB job
needs BEFORE it shuffles.

Beyond-reference surface (the reference, nicolasauler/wolf_quake, is a
single-threaded parser with no planner).  Two operators:

* :func:`key_skew_report` — the pre-shuffle audit for a join/groupBy key:
  top-key share, rank-based p50/p99 of per-key counts, and the Gini
  coefficient of the key distribution.  This is the number that decides
  "salt or don't salt" (sessionize's mega-conv salting exists because a
  report like this said 0.5+ share on one key).  Percentile ranks and the
  Gini prefix sum both use the distributed two-stage machinery
  (sampling.global_enumerate) — no single-partition window even when the
  key cardinality is huge.

* :func:`join_cardinality_estimate` — the textbook equi-height-histogram
  self-join size estimate Σ_b cnt_b²/ndv_b (uniform-within-bucket
  assumption) next to the EXACT Σ_k c(k)², so the estimation error of the
  optimizer's statistic is itself measured.  Both are hash aggregates; the
  exact side never materializes the join.

Cross-engine determinism: counts, ranks and prefix sums are exact BIGINTs;
the emitted shares/Gini/estimates are closed-form floats over those
integers, rounded far coarser than ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew audit of ``key_col``: (n_keys, total_rows, max_count,
    max_share, p50_count, p99_count, gini)."""
    from wolf_quake_spark.analysis import persisted_handles
    from wolf_quake_spark.analysis.sampling import global_enumerate
    from pyspark.storagelevel import StorageLevel

    counts = (
        df.groupBy(F.col(key_col).alias("k"))
        .agg(F.count("*").alias("c"))
        .persist(StorageLevel.DISK_ONLY)
    )
    ranked = global_enumerate(counts, [F.col("c"), F.col("k")], "pos")
    handles = [counts] + persisted_handles(ranked)
    # Gini over the ascending-count order: G = 2·Σ pos·c/(n·Σc) − (n+1)/n
    tot = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("total_rows"),
        F.max("c").alias("max_count"),
    )
    wsum = ranked.agg(
        F.sum(F.col("pos") * F.col("c")).alias("ws")
    )
    # rank-convention percentiles of per-key counts: value at ceil(q·n)
    pcts = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("pos") == F.ceil(F.lit(0.5) * F.col("n_keys")))
            | (F.col("pos") == F.ceil(F.lit(0.99) * F.col("n_keys")))
        )
        .groupBy()
        .agg(
            F.max(
                F.when(
                    F.col("pos") == F.ceil(F.lit(0.5) * F.col("n_keys")),
                    F.col("c"),
                )
            ).alias("p50_count"),
            F.max(
                F.when(
                    F.col("pos") == F.ceil(F.lit(0.99) * F.col("n_keys")),
                    F.col("c"),
                )
            ).alias("p99_count"),
        )
    )
    gini = F.round(
        2.0
        * F.col("ws").cast("double")
        / (F.col("n_keys").cast("double") * F.col("total_rows"))
        - (F.col("n_keys") + 1).cast("double") / F.col("n_keys"),
        6,
    )
    out = (
        tot.crossJoin(F.broadcast(wsum))
        .crossJoin(F.broadcast(pcts))
        .select(
            "n_keys",
            "total_rows",
            "max_count",
            F.round(
                F.col("max_count").cast("double") / F.col("total_rows"), 6
            ).alias("max_share"),
            "p50_count",
            "p99_count",
            gini.alias("gini"),
        )
    )
    out._wqs_persisted = handles
    return out


def key_skew_report_sql(table: str, key_col: str) -> str:
    """DuckDB mirror of :func:`key_skew_report` — same rank conventions,
    same closed forms and rounding."""
    return f"""
    WITH counts AS (
      SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM {table} GROUP BY 1
    ),
    ranked AS (
      SELECT k, c,
             CAST(row_number() OVER (ORDER BY c, k) AS BIGINT) AS pos
      FROM counts
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS total_rows,
             CAST(MAX(c) AS BIGINT) AS max_count
      FROM counts
    ),
    ws AS (SELECT CAST(SUM(pos * c) AS BIGINT) AS ws FROM ranked),
    pcts AS (
      SELECT MAX(CASE WHEN pos = CAST(ceil(0.5 * n_keys) AS BIGINT)
                      THEN c END) AS p50_count,
             MAX(CASE WHEN pos = CAST(ceil(0.99 * n_keys) AS BIGINT)
                      THEN c END) AS p99_count
      FROM ranked CROSS JOIN tot
    )
    SELECT n_keys, total_rows, max_count,
           round(CAST(max_count AS DOUBLE) / total_rows, 6) AS max_share,
           p50_count, p99_count,
           round(2.0 * CAST(ws AS DOUBLE)
                   / (CAST(n_keys AS DOUBLE) * total_rows)
                 - CAST(n_keys + 1 AS DOUBLE) / n_keys, 6) AS gini
    FROM tot CROSS JOIN ws CROSS JOIN pcts
    """


def join_cardinality_estimate(
    df: DataFrame, key_col: str, buckets: int = 64
) -> DataFrame:
    """Self-join size statistic: exact Σ_k c(k)² next to the bucketed
    histogram estimate Σ_b cnt_b²/ndv_b, with the estimate's relative
    error — one row: (buckets, n_keys, exact_pairs, est_pairs,
    rel_error)."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").alias("c")
    )
    exact = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).alias("exact_pairs"),
    )
    bstats = (
        counts.groupBy((F.col("k") % buckets).alias("b"))
        .agg(
            F.sum("c").alias("cnt_b"),
            F.count("*").alias("ndv_b"),
        )
        .agg(
            F.sum(
                F.col("cnt_b").cast("double")
                * F.col("cnt_b")
                / F.col("ndv_b")
            ).alias("est_raw")
        )
    )
    return (
        exact.crossJoin(F.broadcast(bstats))
        .select(
            F.lit(buckets).alias("buckets"),
            "n_keys",
            "exact_pairs",
            F.round(F.col("est_raw"), 2).alias("est_pairs"),
            F.round(
                (F.col("est_raw") - F.col("exact_pairs"))
                / F.col("exact_pairs"),
                6,
            ).alias("rel_error"),
        )
    )


def join_cardinality_estimate_sql(
    table: str, key_col: str, buckets: int = 64
) -> str:
    """DuckDB mirror of :func:`join_cardinality_estimate`."""
    return f"""
    WITH counts AS (
      SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM {table} GROUP BY 1
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c * c) AS BIGINT) AS exact_pairs
      FROM counts
    ),
    bstats AS (
      SELECT SUM(CAST(cnt_b AS DOUBLE) * cnt_b / ndv_b) AS est_raw
      FROM (SELECT k % {buckets} AS b, CAST(SUM(c) AS BIGINT) AS cnt_b,
                   CAST(COUNT(*) AS BIGINT) AS ndv_b
            FROM counts GROUP BY 1)
    )
    SELECT {buckets} AS buckets, n_keys, exact_pairs,
           round(est_raw, 2) AS est_pairs,
           round((est_raw - exact_pairs) / exact_pairs, 6) AS rel_error
    FROM exact CROSS JOIN bstats
    """
