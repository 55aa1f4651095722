"""Deterministic HyperLogLog distinct-count sketch, fully oracle-paired.

Beyond-reference surface. ``sketch_profile`` already exposes Spark's
built-in ``approx_count_distinct`` (HLL++), but its register hashing is
engine-private, so that registry entry is rows-only.  This module is the
complement: a from-scratch HLL (Flajolet et al. 2007) whose EVERY step —
salted-md5 item hash, register index, leading-zero rank, harmonic mean,
small/large-range corrections — is reproducible in portable SQL, so the
estimate itself is value-hash-checked against DuckDB (same philosophy as
textstats.countmin_term_counts: a sketch you can audit end to end).

Cross-engine determinism, piece by piece:

* Item hash: ``md5('hll' || item)`` — identical hex in any engine.
* Register index: fold of the first ``p/4`` hex nibbles (strpos
  arithmetic, cf. textstats.cm_bucket).
* Rank ρ: the next 8 nibbles fold to a 32-bit value ``v``;
  ``ρ = 33 - length(bin(v))`` for v>0 (both Spark ``bin`` and DuckDB
  ``bin`` emit minimal binary strings, verified), ρ = 33 for v = 0 —
  pure integer/string ops, no floating log2.
* Harmonic sum: ``Σ 2^(-reg)`` is rescaled by 2^40 so every term is the
  exact BIGINT ``1 << (40 - reg)`` (reg ≤ 33) — an integer sum is
  order-independent, immune to float summation-order drift.  Zero
  registers contribute ``(m - hit) << 40``.  Max total ≤ m·2^40 ≤ 2^50,
  exactly representable everywhere.
* The only floats are one final division (deterministic IEEE on identical
  integers) and ``ln`` in the correction branches (libm vs JVM can differ
  by 1 ulp — the estimate is rounded to 4 decimals, same argument as
  textstats.tfidf_top_terms).

Scale shape (100 TB): one narrow projection + one (group, register) hash
aggregate + one group aggregate — the sketch is mergeable constant state
(m registers/group), the classic answer when exact COUNT(DISTINCT) no
longer fits; the exact count is computed alongside here ONLY as the
in-job accuracy audit (drop it at true scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# canonical portable fold lives in portable_hash (one definition repo-wide)
from wolf_quake_spark.portable_hash import HEX as _HEX  # noqa: F401
from wolf_quake_spark.portable_hash import fold as _fold
from wolf_quake_spark.portable_hash import nib as _nib  # noqa: F401


def hll_distinct(
    df: DataFrame,
    group_col: str,
    item_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL distinct estimate of ``item_col`` with in-job audit.

    Returns (grp, m, registers_hit, hll_estimate, exact_distinct,
    rel_error).  ``p`` must be a multiple of 4 (whole hex nibbles).
    """
    if p % 4 != 0:
        raise ValueError("p must be a multiple of 4 (whole hex nibbles)")
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = F.md5(F.concat(F.lit("hll"), F.col(item_col).cast("string")))
    v32 = _fold(h, p // 4, 8)
    rho = F.when(v32 == 0, F.lit(33)).otherwise(33 - F.length(F.bin(v32)))
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            _fold(h, 0, p // 4).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("r"))
    )
    sk = regs.groupBy("grp").agg(
        F.count("*").alias("hit"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - r)")).alias("s_hit"),
    )
    two40 = 1 << 40
    s_total = F.col("s_hit") + (F.lit(m) - F.col("hit")) * F.lit(two40)
    raw = F.lit(alpha * m * m * float(two40)) / s_total
    zeros = F.lit(m) - F.col("hit")
    two32 = float(1 << 32)
    est = (
        F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        )
        .when(
            raw > two32 / 30.0,
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    sketch = sk.select(
        "grp",
        F.lit(m).alias("m"),
        F.col("hit").alias("registers_hit"),
        F.round(est, 4).alias("hll_estimate"),
    )
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(item_col).alias("it"))
        .groupBy("grp")
        .agg(F.countDistinct("it").alias("exact_distinct"))
    )
    return sketch.join(exact, "grp").select(
        "grp",
        "m",
        "registers_hit",
        "hll_estimate",
        "exact_distinct",
        F.round(
            (F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_error"),
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 128,
) -> DataFrame:
    """KMV (k-minimum-values, Beyer et al. 2007) sketches per group plus
    MERGED-sketch set-operation estimates for every unordered group pair:
    distinct |A|, |B|, |A∪B|, |A∩B| and Jaccard — the "audience overlap"
    question HLL alone can't answer (vanilla HLL unions but doesn't
    intersect without inclusion-exclusion error blowup).

    Estimators (h normalized to (0,1] over the 48-bit hash space H):
    D̂(S)   = (k-1) / (h_(k)/H)      when |sketch| = k, else exact |sketch|
    D̂(A∪B) = same on the merged sketch (k smallest of the hash union)
    Ĵ      = |{h ∈ merged-k} ∩ K(A) ∩ K(B)| / |merged|
    D̂(A∩B) = Ĵ · D̂(A∪B)

    Cross-engine determinism: the hash is the same salted-md5 nibble fold
    as :func:`hll_distinct` (exact BIGINT in both engines); per-group
    k-smallest selection is a window over a DISTINCT hash set (ties
    impossible — ordering is total), so the sketch contents are identical
    bit-for-bit; estimates are single divisions of identical integers,
    rounded to 4 decimals.

    Scale shape (100 TB): sketch build = one distinct + one PER-GROUP
    window (partitioned by group, never global); pair stage operates on
    ≤ k rows per group — constant state per group, mergeable, the classic
    pre-aggregation answer for overlap matrices over billions of items.
    The exact union/intersection columns are the in-job accuracy audit
    (drop at true scale).  Groups must be few enough that the pair matrix
    is small (it's |G|² sketches of k rows) — true for the enum-like
    group columns this targets.
    """
    hspace = float(1 << 48)
    h = F.md5(F.concat(F.lit("kmv"), F.col(item_col).cast("string")))
    dh = (
        df.select(F.col(group_col).alias("grp"), _fold(h, 0, 12).alias("h"))
        .distinct()
    )
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    w = Window.partitionBy("grp").orderBy("h")
    # Four consumers below (per-group stats + both pair-tag sides) — persist
    # so the full-table distinct+window runs once, not four times.
    sk = (
        dh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
        .persist(StorageLevel.DISK_ONLY)
    )
    per_grp = sk.groupBy("grp").agg(
        F.count("*").alias("sz"), F.max("h").alias("hk")
    )
    est_of = lambda sz, hk: F.when(  # noqa: E731
        sz < k, sz.cast("double")
    ).otherwise(F.lit(float(k - 1) * hspace) / hk)

    gs = per_grp.select(F.col("grp"))
    pairs = (
        gs.alias("x")
        .join(gs.alias("y"), F.col("x.grp") < F.col("y.grp"))
        .select(F.col("x.grp").alias("g1"), F.col("y.grp").alias("g2"))
    )
    s1 = sk.select(F.col("grp").alias("g1"), "h", F.lit(1).alias("f1"), F.lit(0).alias("f2"))
    s2 = sk.select(F.col("grp").alias("g2"), "h", F.lit(0).alias("f1"), F.lit(1).alias("f2"))
    tagged = pairs.join(s1, "g1").select("g1", "g2", "h", "f1", "f2").unionAll(
        pairs.join(s2, "g2").select("g1", "g2", "h", "f1", "f2")
    )
    merged = (
        tagged.groupBy("g1", "g2", "h")
        .agg(F.max("f1").alias("f1"), F.max("f2").alias("f2"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("g1", "g2").orderBy("h")),
        )
        .filter(F.col("rn") <= k)
    )
    pair_est = merged.groupBy("g1", "g2").agg(
        F.count("*").alias("msz"),
        F.max("h").alias("mhk"),
        F.sum(
            (F.col("f1") * F.col("f2")).cast("long")
        ).alias("both"),
    )
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(item_col).alias("it"))
        .distinct()
    )
    e1 = exact.select(F.col("grp").alias("g1"), "it")
    e2 = exact.select(F.col("grp").alias("g2"), "it")
    exact_pair = (
        e1.join(e2, "it")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(F.count("*").alias("exact_intersection"))
    )
    exact_grp = exact.groupBy("grp").agg(F.count("*").alias("exact_d"))

    ua = per_grp.select(
        F.col("grp").alias("g1"),
        est_of(F.col("sz"), F.col("hk")).alias("est_a_raw"),
    )
    ub = per_grp.select(
        F.col("grp").alias("g2"),
        est_of(F.col("sz"), F.col("hk")).alias("est_b_raw"),
    )
    est_union = F.when(
        F.col("msz") < k, F.col("msz").cast("double")
    ).otherwise(F.lit(float(k - 1) * hspace) / F.col("mhk"))
    jacc = F.col("both").cast("double") / F.col("msz")
    out = (
        pair_est.join(ua, "g1")
        .join(ub, "g2")
        .join(exact_pair, ["g1", "g2"], "left")
        .join(
            exact_grp.select(F.col("grp").alias("g1"), F.col("exact_d").alias("xa")),
            "g1",
        )
        .join(
            exact_grp.select(F.col("grp").alias("g2"), F.col("exact_d").alias("xb")),
            "g2",
        )
        .select(
            "g1",
            "g2",
            F.lit(k).alias("k"),
            F.round("est_a_raw", 4).alias("est_a"),
            F.round("est_b_raw", 4).alias("est_b"),
            F.round(est_union, 4).alias("est_union"),
            F.round(jacc, 4).alias("jaccard_est"),
            F.round(jacc * est_union, 4).alias("est_intersection"),
            (
                F.col("xa")
                + F.col("xb")
                - F.coalesce(F.col("exact_intersection"), F.lit(0))
            ).alias("exact_union"),
            F.coalesce(F.col("exact_intersection"), F.lit(0)).alias(
                "exact_intersection"
            ),
        )
    )
    out._wqs_persisted = sk
    return out


def kmv_set_ops_sql(
    table: str, group_col: str, item_col: str, k: int = 128
) -> str:
    """DuckDB mirror of :func:`kmv_set_ops` — same salted 48-bit hash
    fold, same per-group/per-pair k-smallest windows, same estimator
    branches and 4-decimal rounding."""
    hspace = float(1 << 48)
    h = f"md5('kmv' || CAST({item_col} AS VARCHAR))"
    nib = lambda i: f"(strpos('{_HEX}', substr({h}, {i + 1}, 1)) - 1)"  # noqa: E731
    acc = f"CAST({nib(0)} AS BIGINT)"
    for i in range(1, 12):
        acc = f"({acc} * 16 + {nib(i)})"
    knum = repr(float(k - 1) * hspace)
    return f"""
    WITH dh AS (
      SELECT DISTINCT {group_col} AS grp, {acc} AS h FROM {table}
    ),
    sk AS (
      SELECT grp, h FROM (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM dh
      ) WHERE rn <= {k}
    ),
    pg AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS sz, MAX(h) AS hk
      FROM sk GROUP BY grp
    ),
    pairs AS (
      SELECT x.grp AS g1, y.grp AS g2 FROM pg x JOIN pg y ON x.grp < y.grp
    ),
    tagged AS (
      SELECT p.g1, p.g2, s.h, 1 AS f1, 0 AS f2
      FROM pairs p JOIN sk s ON s.grp = p.g1
      UNION ALL
      SELECT p.g1, p.g2, s.h, 0 AS f1, 1 AS f2
      FROM pairs p JOIN sk s ON s.grp = p.g2
    ),
    merged AS (
      SELECT g1, g2, h, f1, f2 FROM (
        SELECT g1, g2, h, f1, f2,
               row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
        FROM (SELECT g1, g2, h, MAX(f1) AS f1, MAX(f2) AS f2
              FROM tagged GROUP BY g1, g2, h)
      ) WHERE rn <= {k}
    ),
    pe AS (
      SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS msz, MAX(h) AS mhk,
             CAST(SUM(f1 * f2) AS BIGINT) AS both
      FROM merged GROUP BY g1, g2
    ),
    ex AS (SELECT DISTINCT {group_col} AS grp, {item_col} AS it FROM {table}),
    exg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS exact_d FROM ex GROUP BY grp),
    exp_ AS (
      SELECT a.grp AS g1, b.grp AS g2, CAST(COUNT(*) AS BIGINT) AS exact_intersection
      FROM ex a JOIN ex b ON a.it = b.it AND a.grp < b.grp
      GROUP BY 1, 2
    ),
    ue AS (
      SELECT grp, CASE WHEN sz < {k} THEN CAST(sz AS DOUBLE)
                       ELSE CAST({knum} AS DOUBLE) / hk END AS est
      FROM pg
    ),
    eu AS (
      SELECT g1, g2, CASE WHEN msz < {k} THEN CAST(msz AS DOUBLE)
                          ELSE CAST({knum} AS DOUBLE) / mhk END AS u
      FROM pe
    )
    SELECT pe.g1, pe.g2, {k} AS k,
           round(ua.est, 4) AS est_a,
           round(ub.est, 4) AS est_b,
           round(eu.u, 4) AS est_union,
           round(CAST(pe.both AS DOUBLE) / pe.msz, 4) AS jaccard_est,
           round(CAST(pe.both AS DOUBLE) / pe.msz * eu.u, 4) AS est_intersection,
           (xa.exact_d + xb.exact_d - COALESCE(exp_.exact_intersection, 0))
             AS exact_union,
           COALESCE(exp_.exact_intersection, 0) AS exact_intersection
    FROM pe
    JOIN eu ON pe.g1 = eu.g1 AND pe.g2 = eu.g2
    JOIN ue ua ON ua.grp = pe.g1
    JOIN ue ub ON ub.grp = pe.g2
    LEFT JOIN exp_ ON exp_.g1 = pe.g1 AND exp_.g2 = pe.g2
    JOIN exg xa ON xa.grp = pe.g1
    JOIN exg xb ON xb.grp = pe.g2
    """


def hll_distinct_sql(
    table: str, group_col: str, item_col: str, p: int = 8
) -> str:
    """DuckDB mirror of :func:`hll_distinct` — same salted hash, same
    integer register sum, same correction branches, same rounding."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = f"md5('hll' || CAST({item_col} AS VARCHAR))"
    nib = lambda i: f"(strpos('{_HEX}', substr({h}, {i + 1}, 1)) - 1)"  # noqa: E731

    def fold(start: int, n: int) -> str:
        acc = f"CAST({nib(start)} AS BIGINT)"
        for i in range(start + 1, start + n):
            acc = f"({acc} * 16 + {nib(i)})"
        return acc

    reg = fold(0, p // 4)
    v32 = fold(p // 4, 8)
    rho = f"CASE WHEN {v32} = 0 THEN 33 ELSE 33 - length(bin({v32})) END"
    two40 = 1 << 40
    two32 = float(1 << 32)
    # DuckDB parses bare decimal literals as DECIMAL (fixed-point), which
    # both overflows and computes differently from Spark's doubles — every
    # float literal below is CAST AS DOUBLE, and the constant numerator
    # α·m²·2^40 is folded in Python once so both engines divide the SAME
    # repr-round-tripped double by the same exact integer.
    num = alpha * m * m * float(two40)
    dbl = lambda x: f"CAST({x!r} AS DOUBLE)"  # noqa: E731
    return f"""
    WITH regs AS (
      SELECT {group_col} AS grp, {reg} AS reg, CAST(MAX({rho}) AS BIGINT) AS r
      FROM {table} GROUP BY 1, 2
    ),
    sk AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS hit,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(40 - r AS INTEGER)) AS BIGINT) AS s_hit
      FROM regs GROUP BY grp
    ),
    est AS (
      SELECT grp, hit,
             {dbl(num)}
               / (s_hit + ({m} - hit) * CAST({two40} AS BIGINT)) AS raw
      FROM sk
    ),
    fin AS (
      SELECT grp, hit,
             CASE
               WHEN raw <= {dbl(2.5 * m)} AND ({m} - hit) > 0
                 THEN {dbl(float(m))} * ln({dbl(float(m))} / ({m} - hit))
               WHEN raw > {dbl(two32 / 30.0)}
                 THEN -{dbl(two32)} * ln(1.0 - raw / {dbl(two32)})
               ELSE raw
             END AS e
      FROM est
    ),
    ex AS (
      SELECT {group_col} AS grp,
             CAST(COUNT(DISTINCT {item_col}) AS BIGINT) AS exact_distinct
      FROM {table} GROUP BY 1
    )
    SELECT fin.grp, CAST({m} AS INTEGER) AS m,
           hit AS registers_hit,
           round(e, 4) AS hll_estimate,
           exact_distinct,
           round((round(e, 4) - exact_distinct) / exact_distinct, 6) AS rel_error
    FROM fin JOIN ex ON fin.grp = ex.grp
    """
