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

_HEX = "0123456789abcdef"


def _nib(h: Column, i: int) -> Column:
    """Value of hex digit ``i`` (0-based) of hex string ``h``."""
    return F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1


def _fold(h: Column, start: int, n: int) -> Column:
    """Fold ``n`` hex nibbles of ``h`` from ``start`` into a BIGINT."""
    acc = _nib(h, start).cast("long")
    for i in range(start + 1, start + n):
        acc = acc * 16 + _nib(h, i)
    return acc


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
