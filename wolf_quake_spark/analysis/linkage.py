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
  parameters in :func:`fs_link_pairs` (part of that operator's contract);
  :func:`fs_link_pairs_em` instead ESTIMATES m, u and the match prior by
  EM over the blocked pairs' agreement-pattern counts (Winkler 1988) —
  the pairs collapse into at most 2^3 = 8 sufficient-statistic rows
  (one hash-agg, one collect), the EM rounds run on those 8 counts, and
  the weights use the learned parameters.  Identical arithmetic is
  unrolled as oracle CTEs, so the learned weights stay cross-engine
  checkable (8-term float sums differ by ulps at most — far inside the
  6-decimal rounding).
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


EM_ROUNDS = 3
EM_M0 = 0.9  # initial per-field m; u initializes from the frequency u
EM_P0 = 0.05  # initial match prior
EM_CLAMP = 1e-6  # keep every probability inside (0, 1) for the log2


def _em_on_patterns(
    patterns: list[tuple[tuple[int, int, int], int]],
    u0: tuple[float, float, float],
    rounds: int = EM_ROUNDS,
) -> tuple[list[float], list[float], float]:
    """EM for the Fellegi-Sunter mixture on the 8 agreement-pattern counts
    (Winkler 1988): P(gamma) = p * prod m_i^g (1-m_i)^(1-g)
    + (1-p) * prod u_i^g (1-u_i)^(1-g).  Left-to-right multiply order and
    the clamp mirror the oracle CTEs term for term."""
    clamp = lambda x: min(max(x, EM_CLAMP), 1.0 - EM_CLAMP)  # noqa: E731
    m = [EM_M0] * 3
    u = [clamp(x) for x in u0]
    p = EM_P0
    if not patterns or sum(cnt for _, cnt in patterns) == 0:
        # no blocked pairs → no sufficient statistics; keep the initial
        # parameters instead of dividing by a zero denominator (the
        # DuckDB mirror likewise just returns zero scored pairs)
        return m, u, p
    for _ in range(rounds):
        num_m, num_u = [0.0] * 3, [0.0] * 3
        den_m = den_u = 0.0
        tot = 0
        for g, cnt in sorted(patterns):
            pm, pu = p, 1.0 - p
            for i in range(3):
                pm = pm * (m[i] if g[i] else 1.0 - m[i])
                pu = pu * (u[i] if g[i] else 1.0 - u[i])
            w = pm / (pm + pu)
            den_m += w * cnt
            den_u += (1.0 - w) * cnt
            tot += cnt
            for i in range(3):
                if g[i]:
                    num_m[i] += w * cnt
                    num_u[i] += (1.0 - w) * cnt
        m = [clamp(num_m[i] / den_m) for i in range(3)]
        u = [clamp(num_u[i] / den_u) for i in range(3)]
        p = clamp(den_m / tot)
    return m, u, p


def fs_link_pairs_em(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = EM_ROUNDS,
    upper: float = UPPER,
    lower: float = LOWER,
) -> DataFrame:
    """Fellegi-Sunter with EM-ESTIMATED parameters (vs the declared
    m-constants of :func:`fs_link_pairs`): the blocked pairs' agreement
    vectors collapse into at most 8 pattern counts — the mixture's
    sufficient statistics — via one extra hash-agg; EM then runs on those
    8 driver rows (m0 = 0.9, u0 = the exact frequency u, p0 = 0.05,
    probabilities clamped inside (0,1)) and the learned m/u score every
    pair.  Same output shape as :func:`fs_link_pairs`.

    100 TB design: the pattern agg shares the pair frame with the scoring
    pass (persisted), adds one 8-row collect, and EM itself costs
    nothing — the textbook split between distributed sufficient
    statistics and a driver-side M-step (same discipline as the k-means
    driver loop)."""
    from pyspark.storagelevel import StorageLevel

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
        .persist(StorageLevel.DISK_ONLY)
    )
    u_row = (
        _u_scalar(feats, "lang", "u_lang")
        .crossJoin(_u_scalar(feats, "source", "u_source"))
        .crossJoin(_u_scalar(feats, "tok2", "u_tok2"))
        .collect()[0]
    )
    pat_rows = (
        pairs.groupBy("ag_lang", "ag_source", "ag_tok2")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    patterns = [
        (
            (int(r["ag_lang"]), int(r["ag_source"]), int(r["ag_tok2"])),
            int(r["cnt"]),
        )
        for r in pat_rows
    ]
    # an empty corpus yields NULL frequency-u sums — treat as 0 (clamped
    # up to EM_CLAMP inside _em_on_patterns) so the no-pairs path below
    # still returns the empty frame instead of raising
    u0 = tuple(
        0.0 if u_row[k] is None else float(u_row[k])
        for k in ("u_lang", "u_source", "u_tok2")
    )
    m, u, p = _em_on_patterns(patterns, u0, rounds)

    weight = F.lit(0.0)
    for i, field in enumerate(("lang", "source", "tok2")):
        weight = weight + F.when(
            F.col(f"ag_{field}"),
            F.log2(F.lit(m[i]) / F.lit(u[i])),
        ).otherwise(F.log2(F.lit(1.0 - m[i]) / F.lit(1.0 - u[i])))
    w = F.round(weight, 6)
    out = pairs.select(
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
    out._wqs_persisted = [feats, pairs]
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


def fs_link_pairs_em_sql(
    table: str = "documents",
    rounds: int = EM_ROUNDS,
    upper: float = UPPER,
    lower: float = LOWER,
) -> str:
    """DuckDB mirror of :func:`fs_link_pairs_em`: same blocking and pair
    frame, the 8-row agreement-pattern aggregate, and the EM rounds
    unrolled as CTEs with the identical left-to-right arithmetic and
    clamp — the learned parameters agree with the Python M-step to float
    ulps, far inside the weights' 6-decimal rounding."""
    lo, hi = EM_CLAMP, 1.0 - EM_CLAMP
    clamp = lambda x: f"LEAST(GREATEST({x}, {lo!r}), {hi!r})"  # noqa: E731
    fields = ("lang", "source", "tok2")
    # p0: the initial parameter row
    u_init = ", ".join(
        f"{clamp(f'u_{f}.u')} AS u{i + 1}" for i, f in enumerate(fields)
    )
    m_init = ", ".join(f"{EM_M0!r} AS m{i + 1}" for i in range(3))
    crosses = " CROSS JOIN ".join(f"u_{f}" for f in fields)
    em_ctes = [
        f"""p0 AS (SELECT {m_init}, {u_init}, {EM_P0!r} AS p
          FROM {crosses})"""
    ]
    for r in range(1, rounds + 1):
        prev = f"p{r - 1}"
        pm = f"{prev}.p" + "".join(
            f" * (CASE WHEN g{i + 1} = 1 THEN {prev}.m{i + 1}"
            f" ELSE 1.0 - {prev}.m{i + 1} END)"
            for i in range(3)
        )
        pu = f"(1.0 - {prev}.p)" + "".join(
            f" * (CASE WHEN g{i + 1} = 1 THEN {prev}.u{i + 1}"
            f" ELSE 1.0 - {prev}.u{i + 1} END)"
            for i in range(3)
        )
        newm = ", ".join(
            clamp(
                f"SUM(CASE WHEN g{i + 1} = 1 THEN w * cnt ELSE 0.0 END)"
                f" / SUM(w * cnt)"
            )
            + f" AS m{i + 1}"
            for i in range(3)
        )
        newu = ", ".join(
            clamp(
                f"SUM(CASE WHEN g{i + 1} = 1 THEN (1.0 - w) * cnt ELSE 0.0 END)"
                f" / SUM((1.0 - w) * cnt)"
            )
            + f" AS u{i + 1}"
            for i in range(3)
        )
        em_ctes.append(
            f"""e{r} AS (SELECT pat.*, ({pm}) / (({pm}) + ({pu})) AS w
          FROM pat CROSS JOIN {prev}),
    p{r} AS (SELECT {newm}, {newu},
                    {clamp('SUM(w * cnt) / SUM(cnt)')} AS p
             FROM e{r})"""
        )
    last = f"p{rounds}"
    terms = " + ".join(
        f"""CASE WHEN ag_{f}
             THEN log2({last}.m{i + 1} / {last}.u{i + 1})
             ELSE log2((1.0 - {last}.m{i + 1}) / (1.0 - {last}.u{i + 1})) END"""
        for i, f in enumerate(fields)
    )
    u_ctes = ",\n    ".join(
        f"""u_{fld} AS (
      SELECT CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS u
      FROM (SELECT {fld}, CAST(COUNT(*) AS BIGINT) AS c FROM feats GROUP BY {fld})
    )"""
        for fld in fields
    )
    em_block = ",\n    ".join(em_ctes)
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
    pat AS (
      SELECT CAST(ag_lang AS INTEGER) AS g1,
             CAST(ag_source AS INTEGER) AS g2,
             CAST(ag_tok2 AS INTEGER) AS g3,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY 1, 2, 3
    ),
    {em_block},
    scored AS (
      SELECT doc_a, doc_b, ag_lang, ag_source, ag_tok2,
             round({terms}, 6) AS weight
      FROM pairs CROSS JOIN {last}
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
