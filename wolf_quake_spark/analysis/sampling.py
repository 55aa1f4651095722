"""Deterministic stratified sampling for corpus rebalancing.

Downsampling over-represented strata (languages, sources) is a standard
training-data step.  At cluster scale it must NOT use ``df.sample`` or
``rand()``: those are partition-order-dependent, so the kept set changes
with cluster size, task retries, and AQE re-planning — unacceptable for a
reproducible corpus.  A multiplicative hash of the stable document id gives
a sample that is identical on 1 core or 1000 executors, survives re-runs,
and needs no shuffle at all (pure filter, fully pushed into the scan stage).

The salt decorrelates this bucket from the train/val/test split hash
(analysis/contamination.py): a doc's sampling fate is independent of its
split assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.contamination import HASH_MOD, KNUTH


def hash_bucket(doc_id: Column, salt: int = 0) -> Column:
    """Deterministic 0..999 bucket from a stable id (Knuth multiplicative)."""
    return ((doc_id * F.lit(KNUTH) + F.lit(salt)) % F.lit(HASH_MOD)) % F.lit(1000)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.5,
    key: str = "lang",
    salt: int = 12345,
) -> DataFrame:
    """Keep each doc with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep rate in [0, 1]; strata not listed
    use ``default_rate``.  Pure narrow filter — zero shuffle, zero RNG.
    """
    thresh = F.lit(None)
    case = None
    for k in sorted(rates):
        cond = F.col(key) == k
        val = F.lit(int(round(rates[k] * 1000)))
        case = F.when(cond, val) if case is None else case.when(cond, val)
    thresh = (
        case.otherwise(F.lit(int(round(default_rate * 1000))))
        if case is not None
        else F.lit(int(round(default_rate * 1000)))
    )
    return docs.filter(hash_bucket(F.col("doc_id"), salt) < thresh)


def global_enumerate(
    df: DataFrame, order: list[Column], out_col: str = "position"
) -> DataFrame:
    """Total-order global row numbering WITHOUT a single-partition window.

    Three stages, all parallel in the data size:

    1. ``repartitionByRange`` on the sort keys — ascending partition id is
       ascending global order;
    2. partition-local ``row_number`` (parallel across partitions);
    3. global position = local number + offset, where offsets come from a
       per-partition count frame (#partitions rows, broadcast back).

    The only single-partition window runs over that count frame, bounded by
    the partition count, never the data size.  ``order`` must be a total
    order (include a unique tiebreak) or positions are nondeterministic.

    The ranked frame is persisted EAGERLY before the offset pass: the
    offsets job and the final join are two separate jobs over ``local``,
    and without pinning it a re-planned upstream (AQE re-coalesces once a
    cached/shuffled input reports runtime sizes) can assign different
    partition ids between the two evaluations — offsets then belong to a
    different layout than the ranks and positions come out gappy/duplicated
    (caught live: 5000 rows → 4964 distinct positions on a cached
    aggregate input; a parquet-scan input never trips it, which is why the
    original formulation survived training_order's oracle).  The handle
    rides ``_wqs_persisted`` for the caller/registry to release.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 2)
    local = (
        df.repartitionByRange(nparts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*order)),
        )
    ).persist(StorageLevel.DISK_ONLY)
    local.count()  # materialize now — both consumers must see ONE layout
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0)))
        .select("_pid", "_off")
    )
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )
    from wolf_quake_spark.analysis import persisted_handles

    out._wqs_persisted = persisted_handles(df) + [local]
    return out


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order: list[Column],
    out_col: str = "running_total",
) -> DataFrame:
    """Total-order global running sum WITHOUT a single-partition window —
    the prefix-sum sibling of :func:`global_enumerate` (same three stages;
    stage 3's offset is the sum of all earlier partitions' values instead
    of their row counts).  ``order`` must be a total order.

    Same eager persist as :func:`global_enumerate`, same reason: the offset
    pass and the final join are two jobs over ``local``, and a re-planned
    (AQE) shuffled/cached upstream can shift partition ids between them —
    offsets then belong to the wrong layout and the running totals come out
    wrong.  The handle rides ``_wqs_persisted``."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 2)
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        df.repartitionByRange(nparts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lcs", F.sum(value_col).over(local_w))
    ).persist(StorageLevel.DISK_ONLY)
    local.count()  # materialize now — both consumers must see ONE layout
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0)))
        .select("_pid", "_off")
    )
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lcs")).cast("long"))
        .drop("_pid", "_lcs", "_off")
    )
    from wolf_quake_spark.analysis import persisted_handles

    out._wqs_persisted = persisted_handles(df) + [local]
    return out


def training_order(docs: DataFrame, seed: str = "epoch-0") -> DataFrame:
    """Reproducible global shuffle of the corpus into a training order.

    Training runs need the corpus in a pseudo-random order that is identical
    across cluster sizes, task retries, and re-runs — ``df.sample``-style
    RNG or ``rand()`` ordering is partition-dependent and unacceptable.  The
    shuffle key is ``md5(seed || doc_id)``: changing ``seed`` gives a fresh
    epoch permutation, and the enumeration is the two-stage range-partition
    pattern (:func:`global_enumerate`) so no stage touches more than one
    partition's rows at a time.
    """
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return global_enumerate(
        keyed, [F.asc("shuffle_key"), F.asc("doc_id")], out_col="position"
    )


def weighted_sample(
    docs: DataFrame, k: int = 100, weight_col: str = "n_chars"
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets key u^(1/w) for a uniform u and
    weight w, and the top-k keys are a weight-proportional sample — the
    standard one-pass distributed weighted sampler (no sequential draw
    state, so it parallelizes where classic roulette sampling cannot).

    The uniform is md5-derived from doc_id — a 20-bit value v ∈ [1, 2^20]
    mapped to u = (v − 0.5)/2^20, STRICTLY inside (0, 1): A-ES requires the
    open interval (u = 1 would give key 1.0 for any weight, putting md5
    prefix-collision docs ahead of the entire sample regardless of weight;
    u = 0 would zero any key).  20 bits quantizes weight-proportionality to
    ~1e-6 of key space — the same grain as the k-means‖ seeding weights
    (:func:`~wolf_quake_spark.analysis.similarity._hash20`).  The sample is
    reproducible across engines, cluster sizes, and reruns — the same
    determinism bar as :func:`training_order`.  Keys are rounded to 9
    decimals (pow carries ~1 ulp of libm disagreement) with doc_id as the
    total-order tiebreak, so the boundary of the top-k is engine-exact.

    Scale shape: one narrow projection + TakeOrderedAndProject (per-task
    top-k heaps merged on the driver, k rows only — never a global sort).
    """
    h = F.md5(F.col("doc_id").cast("string"))

    def nib(i: int) -> Column:
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1

    v20 = (
        (((nib(0) * 16 + nib(1)) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
    ) + 1
    u = (v20 - F.lit(0.5)) / F.lit(float(1 << 20))
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    return (
        docs.select(
            "doc_id", F.col(weight_col).alias("weight"), key.alias("sample_key")
        )
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(k)
    )


def source_quota_cap(
    docs: DataFrame, quota: int = 10, domain_col: str = "source"
) -> DataFrame:
    """Per-domain quota capping: keep at most ``quota`` docs per domain,
    chosen by a deterministic md5 shuffle within the domain — the standard
    web-corpus balancing step (a handful of crawl domains otherwise
    dominate the token budget).

    The keep-set is hash-ordered, not first-N-by-id, so capping is an
    unbiased per-domain subsample and stable across reruns.  One window
    keyed on the domain: parallel across domains, and the per-domain sort
    is bounded by the largest domain — for a pathological mega-domain the
    same targeted salting as sessionize applies (rank within salted shards,
    then cap at quota/shards), which this synthetic corpus doesn't need.
    Returns the SURVIVORS with their keep_rank (1-based within domain).
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", domain_col)
        .withColumn("keep_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("keep_rank") <= quota)
    )


DSIR_BUCKETS = 1024  # hashed-feature dimensionality (Xie et al. use 10k)


def dsir_scores(
    docs: DataFrame,
    target,
    n_buckets: int = DSIR_BUCKETS,
    select_frac: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance scores (Data Selection via Importance
    Resampling, Xie et al., NeurIPS'23): per-doc log importance ratio of a
    TARGET distribution vs the RAW corpus under hashed unigram bag-of-words
    n-gram models — the standard recipe for tilting a web-scale corpus
    toward a high-quality target domain before training.

    ``target`` is a boolean Column marking the target subset (e.g.
    ``F.col("lang") == "en"``).  Both models are add-one-smoothed
    multinomials over ``n_buckets`` md5-hashed token buckets; a doc's score
    is  Σ_b tf(b) · [ln p̂_target(b) − ln p̂_raw(b)] — higher means more
    target-like.  The paper resamples ∝ exp(score) with Gumbel noise; this
    operator keeps the deterministic core of that: ``selected`` marks the
    top ``select_frac`` of docs by score (ties → lowest doc_id), ranked
    with the distributed two-stage enumeration (:func:`global_enumerate`,
    no single-partition window).  An absolute ``score > 0`` threshold would
    be the wrong selector: smoothing shifts the whole distribution by a
    corpus-dependent constant (on a shared-vocabulary corpus every doc
    scores mildly negative), while the top-fraction rank is shift-invariant
    — exactly what resampling weights care about.  Noise belongs to the
    caller.

    Engine portability: the bucket hash is the strpos-arithmetic md5 nibble
    trick (cf. dedup._hex4_int) and the score is quantized to 6 decimals —
    each ``ln`` carries ≤1 ulp libm disagreement and per-doc sums
    reassociate differently per engine, ~7 orders below the quantum (the
    unigram_logprob_scores argument).

    Scale shape: one (doc, term) hash agg → one (doc, bucket) agg → the two
    models are ≤``n_buckets``-row aggregates joined back BROADCAST → one
    doc-keyed agg.  Corpus totals reach rows as a one-row broadcast
    aggregate, never a driver ``.count()``.  Nothing here is quadratic and
    the model side is constant-size, so the plan is two narrow aggs + one
    scan at any corpus size.
    """
    from wolf_quake_spark.analysis.textstats import term_frequencies

    h = F.md5(F.col("term"))

    def nib(i: int) -> Column:
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1

    bucket = (
        ((nib(0) * 16 + nib(1)) * 16 + nib(2)) * 16 + nib(3)
    ) % n_buckets

    flags = docs.select("doc_id", target.alias("_is_target"))
    bt = (
        term_frequencies(docs, text_col)
        .select("doc_id", bucket.alias("b"), "tf")
        .groupBy("doc_id", "b")
        .agg(F.sum("tf").alias("n"))
    )
    raw = bt.groupBy("b").agg(F.sum("n").alias("cr"))
    tgt = (
        bt.join(flags.filter(F.col("_is_target")), "doc_id")
        .groupBy("b")
        .agg(F.sum("n").alias("ct"))
    )
    totals = raw.agg(F.sum("cr").alias("nr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    )
    bb = float(n_buckets)
    term = F.col("n").cast("double") * (
        F.log(F.coalesce(F.col("ct"), F.lit(0)).cast("double") + 1.0)
        - F.log(F.col("nt").cast("double") + bb)
        - F.log(F.col("cr").cast("double") + 1.0)
        + F.log(F.col("nr").cast("double") + bb)
    )
    from pyspark import StorageLevel

    # the scored frame feeds the rank shuffle, the offset count, and the
    # total — persist once instead of recomputing the tf aggregation 3×
    scored = (
        bt.join(F.broadcast(raw), "b")
        .join(F.broadcast(tgt), "b", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n_tokens"), F.round(F.sum(term), 6).alias("w"))
    ).persist(StorageLevel.DISK_ONLY)
    ranked = global_enumerate(
        scored, [F.desc("w"), F.asc("doc_id")], out_col="_rk"
    )
    n_total = scored.agg(F.count("*").alias("_nt"))
    out = (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            "n_tokens",
            F.col("w").alias("dsir_logratio"),
            (F.col("_rk") <= F.ceil(F.lit(select_frac) * F.col("_nt"))).alias(
                "selected"
            ),
        )
    )
    from wolf_quake_spark.analysis import persisted_handles

    out._wqs_persisted = persisted_handles(ranked) + [scored]
    return out


def temperature_weights(
    docs: DataFrame, group_col: str = "lang", alpha: float = 0.3
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual-LM sampling
    rule, Conneau & Lample 2019 / mT5): given raw group shares p_g, sample
    groups ∝ p_g^α so low-resource groups are up-weighted — α=1 keeps the
    natural mix, α→0 approaches uniform.

    Returns per group: n_docs, natural share p (rounded 6), resampled
    share q = p^α / Σ p^α (rounded 6), the per-DOC sampling weight
    multiplier q/p (rounded 6, >1 means oversample), and the expected doc
    count q·N an epoch of the same size would draw (rounded 4).

    Determinism: p is one IEEE division of exact BIGINTs; ``pow`` and the
    Σ p^α normalizer are float (summation order may differ per engine, a
    ~1e-16 relative drift) but every emitted value is rounded 10 orders
    coarser than that drift (the tfidf_top_terms argument).

    Scale shape (100 TB): one hash aggregate to |G| rows, the normalizer a
    1-row aggregate of that, joined back broadcast — constant-size state
    after the first agg, nothing else touches the corpus.
    """
    counts = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").alias("n_total"),
    )
    from pyspark import StorageLevel

    # Two consumers (normalizer + output rows) — persist so the corpus
    # count aggregate runs once.
    shared = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n_total")).alias("p"),
            F.col("n_total"),
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    norm = shared.agg(
        F.sum(F.pow(F.col("p"), F.lit(alpha))).alias("z")
    )
    out = shared.crossJoin(F.broadcast(norm)).select(
        "grp",
        "n_docs",
        F.round("p", 6).alias("natural_share"),
        F.round(F.pow(F.col("p"), F.lit(alpha)) / F.col("z"), 6).alias(
            "resampled_share"
        ),
        F.round(
            F.pow(F.col("p"), F.lit(alpha)) / F.col("z") / F.col("p"), 6
        ).alias("sample_weight"),
        F.round(
            F.pow(F.col("p"), F.lit(alpha))
            / F.col("z")
            * F.col("n_total"),
            4,
        ).alias("expected_epoch_docs"),
    )
    out._wqs_persisted = shared
    return out


def temperature_weights_sql(
    table: str = "documents", group_col: str = "lang", alpha: float = 0.3
) -> str:
    """DuckDB mirror of :func:`temperature_weights` — same exact-integer
    shares, same pow/normalize arithmetic, same rounding."""
    return f"""
    WITH counts AS (
      SELECT {group_col} AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM {table} GROUP BY 1
    ),
    tot AS (SELECT SUM(n_docs) AS n_total FROM counts),
    shared AS (
      SELECT grp, n_docs,
             CAST(n_docs AS DOUBLE) / n_total AS p, n_total
      FROM counts CROSS JOIN tot
    ),
    norm AS (SELECT SUM(pow(p, {alpha!r})) AS z FROM shared)
    SELECT grp, n_docs,
           round(p, 6) AS natural_share,
           round(pow(p, {alpha!r}) / z, 6) AS resampled_share,
           round(pow(p, {alpha!r}) / z / p, 6) AS sample_weight,
           round(pow(p, {alpha!r}) / z * n_total, 4) AS expected_epoch_docs
    FROM shared CROSS JOIN norm
    """


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    seed: str = "rsv",
) -> DataFrame:
    """Deterministic uniform k-without-replacement sample PER GROUP — the
    distributed reservoir: every row gets a priority from the portable
    keyed hash of its id (group-independent, so within each group the k
    smallest priorities are a uniform k-subset: one global random
    permutation restricted to the group), and a rank window keeps the
    top k.  Re-running on the same corpus reproduces the exact sample —
    the property a training-data pipeline needs for auditable subsets.

    Scale shape: one shuffle on the group key; the ``row_number <= k``
    filter is pushed into the sort as a per-group top-k by Spark's
    WindowGroupLimit (plan-asserted in tests), so mega-groups never
    fully sort — each task keeps a k-row heap, the same boundedness as
    TakeOrderedAndProject.  Returns (group, id, sample_rank 1..k).
    """
    from wolf_quake_spark.portable_hash import fold

    pr = fold(
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 0, 12
    )
    w = Window.partitionBy(group_col).orderBy("_pr", id_col)
    return (
        df.select(group_col, id_col)
        .withColumn("_pr", pr)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(group_col, id_col, "sample_rank")
    )


def reservoir_per_group_sql(
    table: str, group_col: str, id_col: str, k: int, seed: str = "rsv"
) -> str:
    """DuckDB mirror of :func:`reservoir_per_group` (same fold, same
    tiebreak)."""
    from wolf_quake_spark.portable_hash import fold_sql

    pr = fold_sql(f"md5('{seed}' || CAST({id_col} AS VARCHAR))", 0, 12)
    return f"""
    WITH pr AS (
      SELECT {group_col}, {id_col}, {pr} AS _pr FROM {table}
    ),
    r AS (
      SELECT {group_col}, {id_col},
             ROW_NUMBER() OVER (PARTITION BY {group_col}
                                ORDER BY _pr, {id_col}) AS rk
      FROM pr
    )
    SELECT {group_col}, {id_col}, CAST(rk AS INTEGER) AS sample_rank
    FROM r WHERE rk <= {k}
    """
