"""Fellegi-Sunter probabilistic record linkage over blocked pairs.

Beyond-reference surface (the reference, nicolasauler/wolf_quake, has only
exact key joins — src/report.rs assembles per-game tables by player name):
entity resolution over noisy corpora needs the classic Fellegi-Sunter
(JASA 1969) decision model — per-field agreement weights log2(m/u) summed
into a match score, thresholded into match / possible / non-match.

What makes this implementation oracle-pairable end to end:

* The u-probabilities (chance agreement between UNRELATED records) are not
  hand-tuned: for a categorical field with value counts c_v over N rows,
  P(two random records agree) = Σ c_v² / N² — EXACT integer arithmetic
  until one IEEE division, identical in any engine.  This is the standard
  frequency-based u estimate (Winkler 1988).
* The m-probabilities (agreement given a true match) are fixed, declared
  parameters — in production they come from EM over labeled pairs; here
  they are part of the operator contract.
* Per-pair weights are sums of 3 log2 ratios of those scalars; rounded to
  6 decimals, far coarser than any libm-vs-JVM ulp drift (same argument as
  textstats.tfidf_top_terms).

Scale design (100 TB):

* Candidate generation is BLOCKED (first token + coarse length bucket, the
  composite key that fixed the fuzzy-linkage skew — a hot boilerplate
  opener splits across length buckets), never all-pairs; per-block work is
  bounded by block² with blocks narrow projections.
* The three u-scalars are single-row aggregates broadcast onto the pair
  frame — no shuffle added to the pair stage.
* Field comparisons are pure column ops on the joined pair rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (field, m-probability): P(field agrees | records are a true match).
M_PROBS = (("lang", 0.95), ("source", 0.90), ("tok2", 0.70))
UPPER = 2.0  # weight ≥ UPPER → match
LOWER = 0.0  # weight in [LOWER, UPPER) → possible


def _features(docs: DataFrame, text_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return docs.select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.coalesce(toks.getItem(1), F.lit("")).alias("tok2"),
        toks.getItem(0).alias("btok"),
        # floor, not cast: DuckDB CAST(double AS BIGINT) rounds-to-nearest
        # while Spark's cast truncates — floor is the same in both.
        F.floor(F.col("n_chars") / 256).cast("long").alias("blen"),
    )


def _u_scalar(feats: DataFrame, col: str, alias: str) -> DataFrame:
    """Σ c_v²/N² as a 1-row frame: exact BIGINT sums, one division."""
    counts = feats.groupBy(col).agg(F.count("*").alias("c"))
    return counts.agg(
        (
            F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.sum("c") * F.sum("c")).cast("double")
        ).alias(alias)
    )


def fs_link_pairs(
    docs: DataFrame,
    text_col: str = "text",
    m_probs=M_PROBS,
    upper: float = UPPER,
    lower: float = LOWER,
) -> DataFrame:
    """Fellegi-Sunter match scores over composite-blocked candidate pairs.

    Returns (doc_a, doc_b, agree_lang, agree_source, agree_tok2, weight,
    verdict) for every blocked pair, weight rounded to 6 decimals,
    verdict ∈ {match, possible, non_match}.
    """
    from pyspark.storagelevel import StorageLevel

    # Five consumers (three u-scalars + both join sides) — persist so the
    # tokenize/regex projection runs over the corpus once.
    feats = _features(docs, text_col).persist(StorageLevel.DISK_ONLY)
    a = feats.alias("a")
    b = feats.alias("b")
    pairs = (
        a.join(b, ["btok", "blen"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (F.col("a.lang") == F.col("b.lang")).alias("ag_lang"),
            (F.col("a.source") == F.col("b.source")).alias("ag_source"),
            (F.col("a.tok2") == F.col("b.tok2")).alias("ag_tok2"),
        )
    )
    us = (
        _u_scalar(feats, "lang", "u_lang")
        .crossJoin(_u_scalar(feats, "source", "u_source"))
        .crossJoin(_u_scalar(feats, "tok2", "u_tok2"))
    )
    scored = pairs.crossJoin(F.broadcast(us))
    weight = F.lit(0.0)
    for field, m in m_probs:
        u = F.col(f"u_{field}")
        weight = weight + F.when(
            F.col(f"ag_{field}"),
            F.log2(F.lit(m) / u),
        ).otherwise(F.log2(F.lit(1.0 - m) / (F.lit(1.0) - u)))
    w = F.round(weight, 6)
    out = scored.select(
        "doc_a",
        "doc_b",
        F.col("ag_lang").cast("int").alias("agree_lang"),
        F.col("ag_source").cast("int").alias("agree_source"),
        F.col("ag_tok2").cast("int").alias("agree_tok2"),
        w.alias("weight"),
        F.when(w >= upper, F.lit("match"))
        .when(w >= lower, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("verdict"),
    )
    out._wqs_persisted = feats
    return out


def fs_link_pairs_sql(
    table: str = "documents",
    m_probs=M_PROBS,
    upper: float = UPPER,
    lower: float = LOWER,
) -> str:
    """DuckDB mirror of :func:`fs_link_pairs` — same composite blocking,
    same exact-integer u estimates, same log2 weight sum and rounding."""
    u_ctes = ",\n    ".join(
        f"""u_{fld} AS (
      SELECT CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS u
      FROM (SELECT {fld}, CAST(COUNT(*) AS BIGINT) AS c FROM feats GROUP BY {fld})
    )"""
        for fld, _ in m_probs
    )
    terms = " + ".join(
        f"""CASE WHEN ag_{fld}
             THEN log2({m!r} / u_{fld}.u)
             ELSE log2({1.0 - m!r} / (1.0 - u_{fld}.u)) END"""
        for fld, m in m_probs
    )
    crosses = " CROSS JOIN ".join(f"u_{fld}" for fld, _ in m_probs)
    return f"""
    WITH feats AS (
      SELECT doc_id,
             COALESCE(lang, '') AS lang,
             COALESCE(source, '') AS source,
             COALESCE(
               regexp_split_to_array(lower(trim(text)), '\\s+')[2], ''
             ) AS tok2,
             regexp_split_to_array(lower(trim(text)), '\\s+')[1] AS btok,
             CAST(floor(n_chars / 256.0) AS BIGINT) AS blen
      FROM {table}
    ),
    {u_ctes},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (a.lang = b.lang) AS ag_lang,
             (a.source = b.source) AS ag_source,
             (a.tok2 = b.tok2) AS ag_tok2
      FROM feats a JOIN feats b
        ON a.btok = b.btok AND a.blen = b.blen AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT doc_a, doc_b, ag_lang, ag_source, ag_tok2,
             round({terms}, 6) AS weight
      FROM pairs CROSS JOIN {crosses}
    )
    SELECT doc_a, doc_b,
           CAST(ag_lang AS INTEGER) AS agree_lang,
           CAST(ag_source AS INTEGER) AS agree_source,
           CAST(ag_tok2 AS INTEGER) AS agree_tok2,
           weight,
           CASE WHEN weight >= {upper!r} THEN 'match'
                WHEN weight >= {lower!r} THEN 'possible'
                ELSE 'non_match' END AS verdict
    FROM scored
    """
