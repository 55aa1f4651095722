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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1000


def _quant(col: Column) -> Column:
    # explicit float64 BEFORE the multiply: embedding elements are float32,
    # and rounding float32(x)*1000 in single precision disagrees with double
    # at values like 0.3195f (319.5 in f32, 319.4999… in f64) — the oracle
    # SQL carries the same CAST(x AS DOUBLE) so both engines quantize in f64
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _l2(a: Column, b: Column) -> Column:
    """Integer L2² between two quantized arrays — exact and engine-portable
    (the distance every k-means path below shares)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _sqnorm(a: Column) -> Column:
    """Integer squared L2 norm of a quantized array — exact BIGINT."""
    return F.aggregate(
        a, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )


def _cos_score(qe: Column, cvec: Column, nc: Column) -> Column:
    """Cosine RANKING score ``dot / sqrt(|c|²)`` for spherical assignment.

    dot and |c|² are exact BIGINTs (≤ ~10⁸ ≪ 2⁵³, so the casts are exact),
    leaving exactly two IEEE-754 float ops — one correctly-rounded sqrt and
    one division — computed from identical integers in Spark and DuckDB, so
    the score is bit-identical across engines (same determinism argument as
    the ``floor(sum/count)`` centroid rule).  The row norm |x| is omitted:
    constant per row, it cancels in the per-row argmax.  A zero centroid
    (nc = 0) scores 0.0 on both engines instead of dividing by zero."""
    d = _dot(qe, cvec)
    return F.when(
        nc > 0, d.cast("double") / F.sqrt(nc.cast("double"))
    ).otherwise(F.lit(0.0))


def _member_centroids(q: DataFrame, asg: DataFrame) -> DataFrame:
    """Member-mean centroids (cent_id, cvec) recomputed from an assignment:
    ``floor(sum/count)`` per position — the same integer rule as the Lloyd
    updates, so the DuckDB oracles reproduce the vectors bit-for-bit.  ONE
    definition keeps kmeans_search and kmeans_probe_curve in lockstep with
    the oracle's ``cents`` CTE."""
    return (
        q.join(asg, "vec_id")
        .select("cent_id", F.posexplode("qe").alias("pos", "xq"))
        .groupBy("cent_id", "pos")
        .agg(
            F.floor(F.sum("xq").cast("double") / F.count("*"))
            .cast("long")
            .alias("cq")
        )
        .groupBy("cent_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cq"))),
                lambda s: s["cq"],
            ).alias("cvec")
        )
    )


def cosine_scores(
    embeddings: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine of every row against the query (brute-force baseline)."""
    q = [int(round(x * SCALE)) for x in query_vec]
    qcol = F.array(*[F.lit(v).cast("long") for v in q])
    qn = sum(v * v for v in q)
    # hoist the quantized vector: higher-order fns are interpreted, so
    # re-quantizing inside both dot products triples the per-row work
    qe = embeddings.select("vec_id", _quant(F.col(vec_col)).alias("_q"))
    dot = _dot(F.col("_q"), qcol)
    en = _dot(F.col("_q"), F.col("_q"))
    cos = dot.cast("double") / F.sqrt(en.cast("double") * F.lit(float(qn)))
    return qe.select(
        "vec_id", dot.alias("dot"), F.when(en > 0, cos).otherwise(F.lit(0.0)).alias("cosine")
    )


def quantize_int8(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Max-abs int8 quantization of an embedding column, exploded per dim.

    The standard storage-compression step for large embedding corpora:
    ``q8 = round(x / amax * 127)`` with the per-vector scale ``amax``
    recoverable from ``amax_x1000``.  All-JVM narrow projection (transform /
    array_max / posexplode) — embarrassingly parallel, no shuffle; output is
    4× smaller than float32 at 100 TB.  Float ops are double-precision with
    an expression structure the DuckDB oracle mirrors literally, so results
    are bitwise-identical across engines.
    """
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(e, lambda x: F.abs(x.cast("double"))))
    rows = embeddings.select(
        "vec_id",
        F.posexplode(e).alias("pos", "x"),
        amax.alias("amax"),
    )
    q8 = (
        F.when(F.col("amax") > 0, F.round(F.col("x") / F.col("amax") * 127))
        .otherwise(F.lit(0.0))
        .cast("int")
    )
    return rows.select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("dim"),
        q8.alias("q8"),
        F.round(F.col("amax") * 1000).cast("long").alias("amax_x1000"),
    )


def topk(embeddings: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    return cosine_scores(embeddings, query_vec).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(k)


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 8,
    pool: int = 20,
    lam: float = 0.7,
    mu: float = 0.3,
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein,
    SIGIR'98): greedily select ``k`` results from the cosine top-``pool``
    candidates, each step maximizing ``lam·rel(d) − mu·max_{s∈S} sim(d, s)``
    — relevance traded against redundancy with what's already picked.  The
    near-dup-heavy retrieval case (this corpus has literal near-copies) is
    exactly where plain top-k returns k copies of one document.

    Plan split: the CORPUS-scale work (quantize, integer dots, top-``pool``
    by cosine with vec_id tiebreak) is one distributed TakeOrderedAndProject
    pass; the greedy selection then runs driver-side over the collected
    ``pool`` rows — a constant-size frame, the same boundedness class as
    collecting k centroids in the Lloyd loop (NOT a data-path collect; the
    greedy is inherently sequential in k and the candidate set is
    O(pool) ≪ corpus by construction).  At 100 TB the pool collect is
    ``pool`` rows regardless of corpus size.

    Engine exactness: rel and pairwise sims are ``dot/sqrt(n_a·n_b)`` with
    exact-BIGINT dots/norms (products < 2⁵³, so the int→double conversions
    are exact) and ``lam``/``mu`` are passed as independent double literals
    to BOTH engines (never ``1−lam``, which is not 0.3 in float64) — every
    comparison the greedy makes is over bit-identical doubles, ties broken
    on lowest vec_id, so the DuckDB oracle's unrolled greedy
    (``_mmr_sql``) reproduces the selection exactly.

    Returns (sel_rank 1..k, vec_id, relevance rounded 6) as a DataFrame.
    """
    import math

    qv = [int(round(x * SCALE)) for x in query_vec]
    qn = sum(v * v for v in qv)
    qcol = F.array(*[F.lit(v).cast("long") for v in qv])
    qe = embeddings.select("vec_id", _quant(F.col(vec_col)).alias("_q"))
    dot = _dot(F.col("_q"), qcol)
    en = _sqnorm(F.col("_q"))
    cos = dot.cast("double") / F.sqrt(en.cast("double") * F.lit(float(qn)))
    cands = (
        qe.select(
            "vec_id",
            "_q",
            en.alias("en"),
            F.when(en > 0, cos).otherwise(F.lit(0.0)).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(pool)
        .collect()
    )
    byid = {r["vec_id"]: r for r in cands}

    def sim(a: int, b: int) -> float:
        ra, rb = byid[a], byid[b]
        if ra["en"] == 0 or rb["en"] == 0:
            return 0.0
        d = sum(x * y for x, y in zip(ra["_q"], rb["_q"]))
        return d / math.sqrt(float(ra["en"] * rb["en"]))

    remaining = sorted(byid)
    selected: list[tuple[int, int, float]] = []  # (rank, vec_id, rel)
    for rank in range(1, min(k, len(remaining)) + 1):
        if rank == 1:
            best = max(remaining, key=lambda v: (byid[v]["rel"], -v))
        else:
            sel_ids = [v for _, v, _ in selected]
            best = max(
                remaining,
                key=lambda v: (
                    lam * byid[v]["rel"] - mu * max(sim(v, s) for s in sel_ids),
                    -v,
                ),
            )
        selected.append((rank, best, byid[best]["rel"]))
        remaining.remove(best)

    out = embeddings.sparkSession.createDataFrame(
        selected, "sel_rank int, vec_id long, relevance double"
    )
    return out.select(
        "sel_rank", "vec_id", F.round("relevance", 6).alias("relevance")
    )


TARGET_OCCUPANCY = 64  # target vectors per coarse bucket

# Bucket-count ceiling: 2^24 = 16.7M buckets keeps occupancy <= TARGET for
# corpora up to ~10^9 vectors — the cap no longer binds before the sign-bit
# supply does (one embedding dim per bit, so bits <= dim; dim=64 here).  The
# old cap of 8 bits froze bucket count at 256, degrading the bucketed
# self-join toward O(n²/256) past ~16k vectors; with the derived count the
# Σ bucket² candidate work stays ~linear (n · TARGET) at any corpus size
# below the ceiling.  Out-of-range element_at is an error under ANSI mode,
# so the cap must stay <= the embedding dimensionality.
MAX_BUCKET_BITS = 24


def derived_n_buckets(
    n_vecs: int, target_occupancy: int = TARGET_OCCUPANCY, max_bits: int = MAX_BUCKET_BITS
) -> int:
    """Scale-aware bucket count: smallest power of two giving ≤ ``target``
    vectors per bucket.  Keeping occupancy bounded keeps the bucketed
    self-join's Σ bucket² work *linear* in corpus size (a fixed bucket count
    would be O(n²/k)); derivation matches the DuckDB oracle's
    ``ceil(log2(greatest(n/target, 2)))`` formula exactly."""
    import math

    bits = max(1, math.ceil(math.log2(max(n_vecs / target_occupancy, 2.0))))
    return 1 << min(bits, max_bits)


def ivf_assign(
    embeddings: DataFrame, n_buckets: int | None = None, vec_col: str = "embedding"
) -> DataFrame:
    """Coarse quantizer: sign pattern of the first log2(n_buckets) quantized
    dims → bucket.

    ``n_buckets=None`` derives the count from the corpus size
    (``derived_n_buckets`` — one cheap count job, query-side not data-path)
    so occupancy stays bounded as the table grows.  A stand-in for k-means
    centroids that stays deterministic and engine-portable; the *plumbing*
    (bucketed layout, probe-limited scan) is the part that matters at scale.
    """
    if n_buckets is None:
        n_buckets = derived_n_buckets(embeddings.count())
    nbits = max(1, (n_buckets - 1).bit_length())
    # sign test needs only the raw float's sign — no need to materialize the
    # quantized array per bit (round(x*1000) >= 0 iff x >= -0.0005; ids are
    # bit-for-bit the quantized form's because the oracle mirrors the same
    # rounding: we keep the quantized comparison but evaluate it on one
    # element, not by building the full transformed array nbits times)
    bits = [
        F.when(
            F.round(F.element_at(F.col(vec_col), i + 1).cast("double") * SCALE).cast(
                "long"
            )
            >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i in range(nbits)
    ]
    bucket = sum(bits[1:], bits[0]) % n_buckets
    return embeddings.withColumn("bucket", bucket.cast("int"))


def _sign_bucket(vec: list[float], n_buckets: int) -> int:
    """Driver-side twin of ``ivf_assign``'s bucket function for a query vector."""
    nbits = max(1, (n_buckets - 1).bit_length())
    q = [int(round(x * SCALE)) for x in vec]
    return sum((1 << i) for i in range(nbits) if q[i] >= 0) % n_buckets


def neardup_pairs(
    embeddings: DataFrame,
    top: int = 20,
    n_buckets: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed.

    The self-join is restricted to vectors sharing a coarse bucket — the
    standard blocking trick that turns the O(n²) all-pairs problem into
    Σ bucket² work.  With the default scale-derived bucket count
    (occupancy ≤ ``TARGET_OCCUPANCY``) that work grows *linearly* with the
    corpus.  At 100 TB the embeddings table is written bucketed by
    ``bucket`` so the join is shuffle-free (co-located); here the bucket
    column keys an ordinary hash join.  Output is the ``top`` most-similar
    pairs with deterministic (cosine desc, ids asc) tiebreaks.
    """
    # self-norm computed once per vector BEFORE the join — per-pair work is
    # then a single dot product instead of three O(dim) aggregates; the
    # quantized array is hoisted to its own projection first (HOFs are
    # interpreted — see srp_signatures)
    assigned = (
        ivf_assign(embeddings, n_buckets, vec_col=vec_col)
        .select("vec_id", "bucket", _quant(F.col(vec_col)).alias("qe"))
        .withColumn("nn", _dot(F.col("qe"), F.col("qe")))
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dot = _dot(F.col("a.qe"), F.col("b.qe"))
    na = F.col("a.nn")
    nb = F.col("b.nn")
    cos = F.when(
        (na > 0) & (nb > 0), dot.cast("double") / F.sqrt(na.cast("double") * nb.cast("double"))
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


# --- k-means IVF quantizer (Lloyd iterations as DataFrame ops) -------------

KMEANS_MAX_K = 65536  # past this, use hierarchical (two-level) quantization


def derived_k(n_vecs: int, max_k: int = KMEANS_MAX_K) -> int:
    """Scale-aware centroid count: the canonical IVF ``nlist ≈ √n`` rule,
    clamped to [2, max_k].  √n balances the two costs that bound a coarse
    quantizer — the broadcast centroid table (k rows per assignment pass)
    and per-cell occupancy (n/k vectors brute-forced per probe) — both grow
    as √n.  Mirrors the oracle's ``greatest(least(round(sqrt(n)),65536),2)``
    exactly (IEEE sqrt is correctly rounded, so both engines agree)."""
    import math

    return max(2, min(int(round(math.sqrt(n_vecs))), max_k))


def _hash20(col: Column) -> Column:
    """Deterministic 20-bit integer weight in [1, 2^20] from the first five
    md5 hex chars — strpos/instr arithmetic only, so the DuckDB oracle
    reproduces it without engine-specific hex casts (cf. dedup._hex4_int)."""
    h = F.md5(col.cast("string"))

    def v(i: int) -> Column:
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1

    out = v(0)
    for i in range(1, 5):
        out = out * 16 + v(i)
    return out + 1


def kmeans_assign(
    embeddings: DataFrame,
    k: int | None = None,
    iters: int = 2,
    vec_col: str = "embedding",
    derive_k=None,
    metric: str = "l2",
) -> DataFrame:
    """Real IVF coarse quantizer: k-means over quantized vectors, entirely in
    DataFrame ops (no UDF, no collect of the data — only k-sized frames come
    to the driver, which is the textbook k-means driver loop).

    ``k=None`` derives the centroid count from the corpus size (√n rule,
    :func:`derived_k`) so the quantizer tracks corpus growth instead of
    freezing at a demo constant.

    ``metric="cos"`` switches the Lloyd ASSIGNMENT to spherical k-means
    (argmax cosine instead of argmin L2² — the right objective when the
    downstream search metric is cosine, as every ANN path here is): scores
    are ``dot/sqrt(|c|²)`` with exact-integer inputs (see :func:`_cos_score`
    for the engine-exactness argument), ties break on lowest cent_id, and
    centroid updates stay the same integer floor-means — normalizing them
    would only rescale, which cancels in cosine.  Seeding stays the L2
    k-means‖ pass for both metrics (a spread heuristic, not part of the
    objective; keeping it integer-exact avoids a wide-decimal cost pass).

    Seeding is k-means‖-style (Bahmani et al., VLDB'12) rather than "first k
    vectors": constant passes, oversample, weighted reduce —
    1. one cost pass against the min-vec_id vector: d²(x, c₀);
    2. oversample ℓ = 2k candidates by the deterministic cost-proportional
       rank ``d² · hash20(vec_id)`` (integer product — exact, engine-portable;
       the hash plays the uniform draw's role in sampling ∝ d²), taken with
       a distributed TakeOrdered, not a single-partition window;
    3. one weight pass: every vector votes for its nearest candidate, and
       the k heaviest candidates become the seeds (cent_id = weight rank).
       Duplicate-vector candidates can collapse, so k is an upper bound.
    Versus first-k seeding the seeds land spread across the data's dense
    regions instead of wherever vec_ids 0..k-1 happen to sit.

    Lloyd iterations run up to ``iters`` rounds with a convergence probe:
    the per-round assignment signature (order-independent xxhash64 sum) plus
    total cost — two scalars to the driver; an unchanged pair is a fixpoint
    (assignment fixed ⇒ centroid update deterministic ⇒ all further rounds
    no-ops), so early exit stays bit-identical to the oracle's fixed
    ``iters`` unroll.

    Deterministic and engine-exact: distances are integer L2² over the
    quantized components, argmin ties break on lowest centroid id, and
    centroid updates use ``floor(sum/count)`` (one correctly-rounded double
    division) — the DuckDB oracle reproduces assignments bit-for-bit.

    Returns (vec_id, cent_id).  At 100 TB each pass is one narrow
    broadcast-join scan + a (cent_id, pos) aggregation of k·dim rows; past
    ``KMEANS_MAX_K`` centroids the broadcast stops fitting and the quantizer
    should go hierarchical (coarse k-means over √k cells, then per-cell).
    """
    from pyspark import StorageLevel

    spark = embeddings.sparkSession
    # persisted: the quantized frame feeds the seeding's cost/near passes
    # plus every Lloyd assignment — without it each pass re-reads parquet
    # and re-quantizes (measured 7.9 s → 4.1 s at sf0.1).  Handle exposed
    # as _wqs_persisted on the result; the registry/bench release it.
    q = embeddings.select("vec_id", _quant(F.col(vec_col)).alias("qe")).persist(
        StorageLevel.DISK_ONLY
    )
    if k is None:
        # derive_k lets callers swap the √n rule (e.g. the two-level
        # quantizer's n^¼ coarse rule) without a second full-input count
        k = (derive_k or derived_k)(q.count())
    else:
        q.count()

    l2 = _l2

    # --- k-means|| seeding ---------------------------------------------
    c0 = q.orderBy("vec_id").limit(1).select(F.col("qe").alias("c0"))
    cost = q.crossJoin(F.broadcast(c0)).select(
        "vec_id", "qe", l2(F.col("qe"), F.col("c0")).alias("d2")
    )
    cand = (
        cost.select("vec_id", "qe", (F.col("d2") * _hash20(F.col("vec_id"))).alias("w"))
        .orderBy(F.desc("w"), F.asc("vec_id"))
        .limit(2 * k)
        .select(F.col("vec_id").alias("cand_id"), F.col("qe").alias("cvec"))
    )
    near = (
        q.crossJoin(F.broadcast(cand))
        .select("vec_id", "cand_id", l2(F.col("qe"), F.col("cvec")).alias("dist"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cand_id")).alias("m"))
        .select(F.col("m.cand_id").alias("cand_id"))
    )
    seed_rows = (
        near.groupBy("cand_id")
        .agg(F.count("*").alias("wt"))
        .orderBy(F.desc("wt"), F.asc("cand_id"))
        .limit(k)
        .collect()
    )
    seed_map = spark.createDataFrame(
        [(r["cand_id"], i) for i, r in enumerate(seed_rows)], "cand_id long, cent_id int"
    )
    cents = (
        q.join(F.broadcast(seed_map), q["vec_id"] == seed_map["cand_id"])
        .select("cent_id", F.col("qe").alias("cvec"))
    )

    def assign(cframe: DataFrame) -> DataFrame:
        if metric == "cos":
            # spherical Lloyd step: argmax cosine(x, c) — equivalently argmax
            # dot(x, c/|c|), so centroids stay UNNORMALIZED integer means
            # (magnitude cancels; only the mean's direction matters).  Ties
            # break on LOWEST cent_id via max(struct(score, -cent_id)) —
            # scores are bit-identical across engines (see _cos_score), so
            # this matches the oracle's ORDER BY sc DESC, cent_id.
            cf = cframe.select(
                "cent_id", "cvec", _sqnorm(F.col("cvec")).alias("nc")
            )
            scored = q.crossJoin(F.broadcast(cf)).select(
                "vec_id",
                "qe",
                "cent_id",
                _cos_score(F.col("qe"), F.col("cvec"), F.col("nc")).alias("sc"),
            )
            return (
                scored.groupBy("vec_id", "qe")
                .agg(
                    F.max(
                        F.struct(
                            F.col("sc"), (-F.col("cent_id")).alias("nci")
                        )
                    ).alias("m")
                )
                .select(
                    "vec_id",
                    "qe",
                    (-F.col("m.nci")).cast("int").alias("cent_id"),
                    F.col("m.sc").alias("dist"),
                )
            )
        scored = q.crossJoin(F.broadcast(cframe)).select(
            "vec_id", "qe", "cent_id", l2(F.col("qe"), F.col("cvec")).alias("dist")
        )
        return (
            scored.groupBy("vec_id", "qe")
            .agg(F.min(F.struct("dist", "cent_id")).alias("m"))
            .select(
                "vec_id", "qe", F.col("m.cent_id").alias("cent_id"),
                F.col("m.dist").alias("dist"),
            )
        )

    prev_sig = None
    for _ in range(iters):
        a = assign(cents).persist(StorageLevel.DISK_ONLY)
        sig_row = a.agg(
            # decimal(38) sum: full-range xxhash64 values overflow a BIGINT
            # sum under ANSI mode; decimal stays exact to ~10^19 rows.
            # The signature must be ORDER-INSENSITIVE AND EXACT: a float
            # cost sum (cos-metric dist is a double) can differ between
            # bit-identical assignment rounds just from partial-agg combine
            # order, silently defeating the early exit — so the probe is
            # the exact hash sum plus the exact row count, nothing float.
            F.sum(F.xxhash64("vec_id", "cent_id").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("c"),
        ).collect()[0]
        sig = (sig_row["s"], sig_row["c"])
        if sig == prev_sig:
            a.unpersist()
            break  # fixpoint — further rounds are no-ops on both engines
        prev_sig = sig
        upd = (
            a.select("cent_id", F.posexplode("qe").alias("pos", "xq"))
            .groupBy("cent_id", "pos")
            .agg(F.floor(F.sum("xq").cast("double") / F.count("*")).cast("long").alias("cq"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cq"))), lambda s: s["cq"]
                ).alias("cvec")
            )
        )
        # empty clusters keep their previous centroid; the k-row update frame
        # is collected to the driver (k·dim ints — the standard Lloyd loop)
        new_rows = {r["cent_id"]: r["cvec"] for r in upd.collect()}
        old_rows = {r["cent_id"]: r["cvec"] for r in cents.collect()}
        merged = [(c, new_rows.get(c, old_rows[c])) for c in sorted(old_rows)]
        cents = spark.createDataFrame(merged, "cent_id int, cvec array<long>")
        a.unpersist()

    out = assign(cents).select("vec_id", "cent_id")
    out._wqs_persisted = q
    # the final Lloyd centroid frame (k driver rows): the materialized
    # IVFADC index stores it so NEW vectors can be assigned with the very
    # same argmin the build ran — nearest member-mean disagrees on
    # boundary vectors, which would break encode/stored-code parity
    out._wqs_centroids = cents
    return out


def derived_coarse_k(n_vecs: int) -> int:
    """Level-1 fan-out for the two-level quantizer: the √ rule applied to
    the √n rule (k₁ ≈ n^¼), so each LEVEL of the tree broadcasts at most
    ~√K centroids where K is the flat √n cell count.  Mirrors the oracle's
    ``greatest(round(power(n, 0.25)), 2)``."""
    return max(2, int(round(n_vecs**0.25)))


def kmeans_assign_two_level(
    embeddings: DataFrame,
    iters: int = 2,
    sub_iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Hierarchical (two-level) k-means quantizer — the scale path past
    ``KMEANS_MAX_K``, where a flat centroid table no longer broadcasts.

    Level 1 is :func:`kmeans_assign` with k₁ = n^¼ centroids (k-means‖
    seeding, convergence probe — everything the flat quantizer does).
    Level 2 then runs an INDEPENDENT k-means INSIDE EVERY CELL AT ONCE,
    entirely as grouped DataFrame ops — no driver loop over cells:

    * per-cell k₂ = max(1, round(√n_cell)) — the √n rule applied
      recursively, so sub-cell occupancy tracks cell size;
    * seeding: the first k₂ vec_ids of each cell (one per-cell window).
      k-means‖ buys global spread, which level 1 already provided; within
      an already-coherent cell, rank seeding is the standard cheap choice;
    * Lloyd rounds: the centroid table is keyed (cell, sub_id) and JOINED
      ON cell — each vector meets only its own cell's k₂ candidates, so
      the scored row count is Σ n_c·k₂_c ≈ n·√occupancy, never n·K.
      Updates (floor(sum/count) per position) and empty-sub carry-over are
      LEFT-JOIN frames, never collected: unlike the flat quantizer there
      is no driver-side centroid merge at all.  ``sub_iters`` is a fixed
      unroll (matching the oracle CTE chain bit-for-bit; no probe needed
      at two rounds).

    100 TB: level-1 broadcast is k₁ = n^¼ rows; the level-2 centroid
    relation is Σk₂ rows shuffled once per round on cell_id — a hash join
    against the (also cell-keyed) vector frame, so adding cells adds
    parallelism instead of broadcast pressure.  Total leaf cells Σ√n_c
    comfortably exceeds the 65536 flat cap while no single join side ever
    holds more than one cell's centroids per task.

    Deterministic and engine-exact like the flat path: integer L2² on the
    ×1000 quantization, argmin ties to the lowest sub_id, floor updates.
    Returns (vec_id, cell_id, sub_id).  ``_wqs_persisted`` carries the
    quantized frame and the persisted level-1 assignment.
    """
    from pyspark import StorageLevel

    # derive_k hook: one count (of the persisted quantized frame) serves
    # both the coarse-k derivation and the materialization — no separate
    # full-input count here
    coarse = kmeans_assign(
        embeddings, iters=iters, vec_col=vec_col, derive_k=derived_coarse_k
    )
    q = coarse._wqs_persisted  # (vec_id, qe) DISK_ONLY — reuse, don't requantize
    cells = coarse.select("vec_id", F.col("cent_id").alias("cell_id")).persist(
        StorageLevel.DISK_ONLY
    )
    cells.count()

    v = q.join(cells, "vec_id")  # vec_id, qe, cell_id
    l2 = _l2

    k2 = cells.groupBy("cell_id").agg(
        F.greatest(F.round(F.sqrt(F.count("*"))).cast("int"), F.lit(1)).alias("k2")
    )
    w = Window.partitionBy("cell_id").orderBy("vec_id")
    seeds = (
        cells.withColumn("rn", F.row_number().over(w))
        .join(k2, "cell_id")
        .filter(F.col("rn") <= F.col("k2"))
        .select("vec_id", "cell_id", (F.col("rn") - 1).cast("int").alias("sub_id"))
    )
    cents = q.join(seeds, "vec_id").select(
        "cell_id", "sub_id", F.col("qe").alias("cvec")
    )

    def assign(cframe: DataFrame) -> DataFrame:
        scored = v.join(cframe, "cell_id").select(
            "vec_id", "qe", "cell_id", "sub_id",
            l2(F.col("qe"), F.col("cvec")).alias("dist"),
        )
        return (
            scored.groupBy("vec_id", "qe", "cell_id")
            .agg(F.min(F.struct("dist", "sub_id")).alias("m"))
            .select("vec_id", "qe", "cell_id", F.col("m.sub_id").alias("sub_id"))
        )

    for _ in range(sub_iters):
        a = assign(cents)
        upd = (
            a.select("cell_id", "sub_id", F.posexplode("qe").alias("pos", "xq"))
            .groupBy("cell_id", "sub_id", "pos")
            .agg(
                F.floor(F.sum("xq").cast("double") / F.count("*"))
                .cast("long")
                .alias("cq")
            )
            .groupBy("cell_id", "sub_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cq"))),
                    lambda s: s["cq"],
                ).alias("nvec")
            )
        )
        # empty subs keep their previous centroid — a LEFT JOIN, not a
        # driver merge (the centroid relation may exceed any broadcast cap)
        cents = (
            cents.join(upd, ["cell_id", "sub_id"], "left")
            .select(
                "cell_id", "sub_id",
                F.coalesce("nvec", "cvec").alias("cvec"),
            )
        )

    out = assign(cents).select("vec_id", "cell_id", "sub_id")
    out._wqs_persisted = [q, cells]
    return out


def kmeans_search(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 3,
    iters: int = 2,
    vec_col: str = "embedding",
    metric: str = "l2",
) -> DataFrame:
    """Real IVF search over SEMANTIC cells: assign the corpus with the
    k-means quantizer, probe the ``n_probes`` cells whose member-mean
    centroids are nearest the query, brute-force cosine inside those cells
    only — classic FAISS-style IVF probing.

    What this buys over sign buckets is a TUNABLE recall/scan-fraction
    curve: measured on this corpus (``ann_recall_probe_curve``), recall@10
    climbs monotonically 0.3 → 0.8 as probes go 3 → 8 of 22 cells at
    sf0.01 (0.3 → 0.7 of 45 cells at sf0.1), while the sign-bucket path is
    stuck — its only budget knob is Hamming radius, and radius 2 already
    re-scans half the corpus at 32 buckets.  At the SAME 3-probe budget
    semantic cells do NOT beat sign buckets here (this synthetic corpus's
    cosine neighborhoods are diffuse across cells); the curve, not a magic
    probe count, is the operational answer.

    Centroids are recomputed from the final assignment (member means,
    ``floor(sum/count)`` — the same integer rule as the Lloyd updates, so
    the oracle reproduces them bit-for-bit).  Probe selection is a k-row
    frame sorted by integer L2² with cent_id tiebreak; candidates reach the
    cosine scan via one broadcast semi-join.  At 100 TB: scan cost drops
    from n to ~n·(n_probes/k); with the table written bucketed by cent_id
    the probe set prunes partitions instead of filtering rows.
    """
    from pyspark import StorageLevel

    asg = kmeans_assign(embeddings, iters=iters, vec_col=vec_col, metric=metric)
    q = asg._wqs_persisted  # (vec_id, qe) DISK_ONLY — shared quantized frame
    asg = asg.persist(StorageLevel.DISK_ONLY)

    cents = _member_centroids(q, asg)
    qlit = F.array(*[F.lit(int(round(x * SCALE))).cast("long") for x in query_vec])
    cd = (
        (-_cos_score(qlit, F.col("cvec"), _sqnorm(F.col("cvec")))).alias("d")
        if metric == "cos"
        else _l2(F.col("cvec"), qlit).alias("d")
    )
    probes = (
        cents.select("cent_id", cd)
        .orderBy("d", "cent_id")
        .limit(n_probes)
        .select("cent_id")
    )
    cand = asg.join(F.broadcast(probes), "cent_id").select("vec_id")
    out = (
        cosine_scores(
            embeddings.join(cand, "vec_id", "left_semi"), query_vec, vec_col
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
    out._wqs_persisted = [q, asg]
    return out


def kmeans_probe_curve(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    probes: tuple[int, ...] = (3, 5, 8),
    iters: int = 2,
    vec_col: str = "embedding",
    metric: str = "l2",
) -> DataFrame:
    """Recall@k of :func:`kmeans_search` at SEVERAL probe budgets in one
    job — the recall/scan-fraction calibration curve an IVF deployment
    tunes against, instead of a single take-it-or-leave-it recall number.

    One assignment, one cell ranking, one cosine pass over the largest
    probe set; each budget then takes its top-k by a window PARTITIONED on
    the budget value — bounded by (#budgets × largest probe set), never the
    corpus.  Output: (n_probes, n_overlap, recall_at_k) per budget, with
    zero-overlap budgets kept (LEFT join back to the budget list).
    """
    from pyspark import StorageLevel

    asg = kmeans_assign(embeddings, iters=iters, vec_col=vec_col, metric=metric)
    q = asg._wqs_persisted
    asg = asg.persist(StorageLevel.DISK_ONLY)

    cents = _member_centroids(q, asg)
    qlit = F.array(*[F.lit(int(round(x * SCALE))).cast("long") for x in query_vec])
    maxp = max(probes)
    # cell ranking must use the SAME metric as the quantizer: cosine cells
    # are angular wedges, so the nearest wedges to the query are the ones
    # whose centroid DIRECTION is closest (negated cosine score keeps the
    # shared ascending orderBy; query norm is constant and cancels)
    cd = (
        (-_cos_score(qlit, F.col("cvec"), _sqnorm(F.col("cvec")))).alias("d")
        if metric == "cos"
        else _l2(F.col("cvec"), qlit).alias("d")
    )
    ranked = (
        cents.select("cent_id", cd)
        .orderBy("d", "cent_id")
        .limit(maxp)
        .select(
            "cent_id",
            F.row_number()
            .over(Window.orderBy("d", "cent_id"))
            .cast("int")
            .alias("rc"),
        )
    )
    cand = asg.join(F.broadcast(ranked), "cent_id").select("vec_id", "rc")
    scored = cosine_scores(
        embeddings.join(cand.select("vec_id"), "vec_id", "left_semi"),
        query_vec,
        vec_col,
    ).join(cand, "vec_id")
    pv = embeddings.sparkSession.createDataFrame(
        [(int(p),) for p in probes], "n_probes int"
    )
    perp = scored.join(F.broadcast(pv), F.col("rc") <= F.col("n_probes"))
    wk = Window.partitionBy("n_probes").orderBy(F.desc("cosine"), F.asc("vec_id"))
    tk = (
        perp.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("n_probes", "vec_id")
    )
    brute = (
        cosine_scores(embeddings, query_vec, vec_col)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )
    hits = tk.join(brute, "vec_id").groupBy("n_probes").agg(
        F.count("*").alias("n_hits")
    )
    out = pv.join(hits, "n_probes", "left").select(
        "n_probes",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_overlap"),
        F.round(F.coalesce("n_hits", F.lit(0)) / float(k), 6).alias(
            f"recall_at_{k}"
        ),
    )
    out._wqs_persisted = [q, asg]
    return out


# --- SRP-LSH (signed random projections, cosine LSH) -----------------------
#
# The classic LSH family for cosine similarity (Charikar 2002), complementing
# the IVF path: B deterministic pseudo-random hyperplanes give a B-bit
# signature whose Hamming distance estimates the angle between vectors.
# Hyperplane coefficients are md5-derived integers generated driver-side and
# embedded as literals in BOTH engines, so the oracle is exact and no per-row
# hashing happens at runtime.

SRP_BITS = 16

# Derived-banding bounds for srp_neardup_pairs: band width (bits per band)
# grows with corpus size exactly like the IVF bucket count, so each band's
# 2^width buckets keep occupancy <= TARGET_OCCUPANCY and the band self-join's
# Σ bucket² candidate work stays ~linear at any n.  A *fixed* 2×8-bit scheme
# froze bucket count at 256 per band — O(n²/256) past ~16k vectors.  Width is
# floored at 4 (below that the bands stop discriminating at all) and capped
# at 16 (bands × width <= 32 signature bits — already 4G buckets per band,
# far past where recall, not cost, becomes the binding constraint).
SRP_MIN_WIDTH = 4
SRP_MAX_WIDTH = 16


def srp_derived_width(
    n_vecs: int,
    target_occupancy: int = TARGET_OCCUPANCY,
    min_width: int = SRP_MIN_WIDTH,
    max_width: int = SRP_MAX_WIDTH,
) -> int:
    """Scale-aware SRP band width: smallest bit count giving ≤ ``target``
    vectors per band bucket, clamped to [min_width, max_width]; mirrors the
    DuckDB oracle's ``greatest(least(ceil(log2(greatest(n/target,2))),16),4)``
    formula exactly."""
    import math

    bits = max(1, math.ceil(math.log2(max(n_vecs / target_occupancy, 2.0))))
    return max(min_width, min(bits, max_width))


def srp_hyperplanes(dim: int, n_bits: int = SRP_BITS, seed: str = "srp") -> list[list[int]]:
    """Deterministic hyperplane coefficients in [-32768, 32767]."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}:{h}:{d}".encode()).hexdigest()[:4], 16) - 32768
            for d in range(dim)
        ]
        for h in range(n_bits)
    ]


def srp_signatures(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = SRP_BITS,
    vec_col: str = "embedding",
) -> DataFrame:
    """B-bit SRP signature per vector — one narrow JVM-side pass.

    Each bit is ``sign(<quantized vec, hyperplane>)`` computed with
    ``zip_with``/``aggregate`` against a literal coefficient array: no
    shuffle, no UDF, no join — at 100 TB this pipelines inside the scan.

    The quantized vector is hoisted into its own projection first:
    higher-order array functions are interpreted (not codegen'd), so
    re-evaluating ``_quant`` inside each of the ``n_bits`` dot products
    triples the per-row work — hoisting measured 0.92 s → 0.32 s for 5k
    64-dim vectors at local[32].  (An Arrow/numpy matmul variant measured
    0.21 s steady-state but pays ~1.5 s of Python-worker startup per fresh
    executor; the pure-JVM form wins for a stage this cheap.)
    """
    planes = srp_hyperplanes(dim, n_bits)
    q = embeddings.select("vec_id", _quant(F.col(vec_col)).alias("_q"))
    bits = []
    for h, coefs in enumerate(planes):
        c = F.array(*[F.lit(v).cast("long") for v in coefs])
        bits.append(
            F.when(_dot(F.col("_q"), c) >= 0, F.lit(1 << h)).otherwise(F.lit(0))
        )
    sig = sum(bits[1:], bits[0])
    return q.select("vec_id", sig.cast("long").alias("srp_sig"))


def srp_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    top: int = 20,
    n_bits: int | None = None,
    bands: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs via SRP-LSH banding + exact verification.

    The B-bit signature splits into ``bands`` equal bands; vectors sharing a
    band are candidates (complete for signature Hamming distance <
    ``bands`` by pigeonhole), then the exact quantized cosine is computed
    per candidate pair with pre-hoisted self-norms.  Candidate volume is
    bounded by band-bucket sizes — never all pairs.

    ``n_bits=None`` (the default) derives the band width from the corpus
    size (``srp_derived_width`` — one count job, query-side not data-path)
    so per-band bucket occupancy stays ≤ ``TARGET_OCCUPANCY`` as the corpus
    grows; pass an explicit ``n_bits`` (a multiple of ``bands``) to pin it.
    """
    from pyspark import StorageLevel

    if n_bits is None:
        n_bits = bands * srp_derived_width(embeddings.count())
    width = n_bits // bands
    mask = (1 << width) - 1
    quant = _quant(F.col(vec_col))
    sig = srp_signatures(embeddings, dim, n_bits, vec_col=vec_col)
    # persisted: the signature+norm frame feeds both sides of the band
    # self-join, and the 16-hyperplane projection would otherwise be
    # recomputed per plan branch (same sharing rationale as verified_pairs;
    # caller releases via result._wqs_persisted — bench.py does)
    assigned = (
        embeddings.join(sig, "vec_id")
        .select("vec_id", "srp_sig", quant.alias("qe"))
        .withColumn("nn", _dot(F.col("qe"), F.col("qe")))
        .persist(StorageLevel.DISK_ONLY)
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("srp_sig"), b * width).bitwiseAND(mask).alias("band_val"),
        )
        for b in range(bands)
    ]
    bexp = assigned.select(
        "vec_id", "qe", "nn", F.explode(F.array(*band_structs)).alias("b")
    ).select("vec_id", "qe", "nn", "b.band_id", "b.band_val")
    a = bexp.alias("a")
    bb = bexp.alias("b")
    dot = _dot(F.col("a.qe"), F.col("b.qe"))
    na, nb = F.col("a.nn"), F.col("b.nn")
    cos = F.when(
        (na > 0) & (nb > 0), dot.cast("double") / F.sqrt(na.cast("double") * nb.cast("double"))
    ).otherwise(F.lit(0.0))
    out = (
        a.join(bb, ["band_id", "band_val"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.first("cosine").alias("cosine"))  # dedupe multi-band hits
        .orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(top)
    )
    out._wqs_persisted = assigned
    return out


def semdedup_prune(
    embeddings: DataFrame,
    threshold: float = 0.3,
    k: int | None = None,
    iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    embedding space with the k-means coarse quantizer, then inside each
    cluster drop every vector that is ≥ ``threshold`` cosine-similar to a
    lower-``vec_id`` vector of the same cluster.

    One row per vector: (vec_id, cent_id, is_kept).  The deterministic
    lowest-id-dominates rule replaces the paper's centroid-distance greedy
    pass — same pruning shape, engine-exact, one pass.

    Scale shape: the expensive pairwise-cosine step is CONFINED to k-means
    cells — with the √n-derived k, Σ cell² ≈ n^1.5 bounded by cell size,
    never all-pairs; the cells are exactly the IVF layout the corpus is
    already bucketed by, so at 100 TB the pair join is cell-local
    (shuffle-free on a bucketed layout).  Norms and quantized vectors are
    hoisted before the join (HOFs are interpreted — see srp_signatures).
    """
    from pyspark import StorageLevel

    assign = kmeans_assign(embeddings, k=k, iters=iters, vec_col=vec_col)
    qpers = assign._wqs_persisted  # the already-persisted (vec_id, qe) frame
    # persist the assignment: it feeds BOTH sides of the self-join AND the
    # final keep/drop join — unpersisted, the whole Lloyd assignment pass
    # re-ran 3× per action (visible as 3 BroadcastNestedLoopJoins in the
    # committed plan fingerprint).  The quantized vectors come from the
    # persisted frame kmeans_assign already built, not a fresh requantize.
    assign = assign.persist(StorageLevel.DISK_ONLY)
    q = qpers.withColumn("nn", _dot(F.col("qe"), F.col("qe")))
    j = assign.join(q, "vec_id")
    a = j.alias("a")
    b = j.alias("b")
    dot = _dot(F.col("a.qe"), F.col("b.qe"))
    na, nb = F.col("a.nn"), F.col("b.nn")
    cos = dot.cast("double") / F.sqrt(na.cast("double") * nb.cast("double"))
    dominated = (
        a.join(b, F.col("a.cent_id") == F.col("b.cent_id"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .filter((na > 0) & (nb > 0) & (cos >= threshold))
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    out = (
        assign.join(dominated.withColumn("_dom", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id", "cent_id", F.col("_dom").isNull().alias("is_kept")
        )
    )
    out._wqs_persisted = [qpers, assign]
    return out


def ivf_search(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_buckets: int | None = None,
    multi_probe: bool = True,
) -> DataFrame:
    """IVF search: scan only the query's probe buckets, brute-force inside.

    ``multi_probe=True`` probes the Hamming-≤1 neighborhood of the query's
    sign pattern (1 + log2(n_buckets) buckets) — the standard multi-probe
    recall fix for points near a quantization boundary, still scanning only
    an O(log n_buckets / n_buckets) fraction of the table.  On a
    bucket-partitioned layout the probe filter becomes partition pruning.
    """
    if n_buckets is None:
        n_buckets = derived_n_buckets(embeddings.count())
    nbits = max(1, (n_buckets - 1).bit_length())
    qbucket = _sign_bucket(query_vec, n_buckets)
    probes = [qbucket]
    if multi_probe:
        probes += [(qbucket ^ (1 << i)) % n_buckets for i in range(nbits)]
    assigned = ivf_assign(embeddings, n_buckets)
    probe = assigned.filter(F.col("bucket").isin(sorted(set(probes))))
    return topk(probe, query_vec, k=k)


def knn_classify(
    embeddings: DataFrame,
    k: int = 5,
    holdout_mod: int = 10,
    iters: int = 2,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label classification THROUGH the IVF index — the ANN machinery
    driving an end task (label transfer / weak supervision over an
    embedding corpus) instead of a raw neighbor list.

    Every ``vec_id % holdout_mod == 0`` vector is a PROBE whose label is
    hidden; the rest are the labeled index.  Since probes are part of the
    k-means corpus, each probe's cell assignment IS its (1-probe) IVF
    routing — no separate centroid ranking pass.  Candidates are the
    labeled vectors in the probe's own cell (equi-join on cent_id — the
    same bounded Σ cell² shape as every bucketed join here, never
    probe × corpus), scored by exact quantized cosine, cut to the top ``k``
    by (cosine desc, vec_id), and majority-voted with the deterministic
    (votes desc, label asc) tie-break.

    Returns (vec_id, true_label, pred_label, n_votes, correct) — one row
    per probe that had at least one in-cell labeled neighbor (a probe alone
    in its cell yields no row, identically in both engines).

    At 100 TB: the quantizer is the corpus-scaled k-means (hierarchical
    variant past the broadcast cap); the classify pass adds one cell-keyed
    equi-join + per-probe window over in-cell candidates + one vote agg —
    all key-partitioned, cost Σ probes_c · cand_c over cells, the IVF
    occupancy target keeping each term bounded.  Raising recall = assign
    probes to multiple nearby cells (multi-probe), which only widens the
    equi-join input, not the shape.
    """
    from pyspark import StorageLevel

    asg = kmeans_assign(embeddings, iters=iters, vec_col=vec_col)
    q = asg._wqs_persisted  # (vec_id, qe) DISK_ONLY — shared quantized frame
    aq = (
        asg.join(q, "vec_id")
        .join(embeddings.select("vec_id", label_col), "vec_id")
        .persist(StorageLevel.DISK_ONLY)
    )
    is_probe = F.col("vec_id") % holdout_mod == 0
    pr = aq.filter(is_probe).select(
        F.col("vec_id").alias("pid"),
        "cent_id",
        F.col("qe").alias("pqe"),
        F.col(label_col).alias("true_label"),
    )
    ca = aq.filter(~is_probe).select(
        F.col("vec_id").alias("cid"),
        "cent_id",
        F.col("qe").alias("cqe"),
        F.col(label_col).alias("cand_label"),
    )
    np_, nc = _sqnorm(F.col("pqe")), _sqnorm(F.col("cqe"))
    dot = _dot(F.col("pqe"), F.col("cqe"))
    cos = F.when(
        (np_ > 0) & (nc > 0),
        dot.cast("double") / F.sqrt(np_.cast("double") * nc.cast("double")),
    ).otherwise(F.lit(0.0))
    from pyspark.sql import Window

    scored = pr.join(ca, "cent_id").select(
        "pid", "true_label", "cid", "cand_label", cos.alias("cos")
    )
    top = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("pid").orderBy(F.desc("cos"), F.asc("cid"))
        ),
    ).filter(F.col("rn") <= k)
    votes = top.groupBy("pid", "true_label", "cand_label").agg(
        F.count("*").alias("nv")
    )
    pred = votes.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("pid").orderBy(F.desc("nv"), F.asc("cand_label"))
        ),
    ).filter(F.col("rn") == 1)
    out = pred.select(
        F.col("pid").alias("vec_id"),
        "true_label",
        F.col("cand_label").alias("pred_label"),
        F.col("nv").cast("long").alias("n_votes"),
        F.when(F.col("true_label") == F.col("cand_label"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("correct"),
    )
    out._wqs_persisted = [q, aq]
    return out


# --- Product quantization (PQ) ---------------------------------------------

PQ_M = 4  # subspaces per vector (codes per row); dim must divide evenly
PQ_MAX_KS = 256  # classic 8-bit code ceiling per subspace codebook


def derived_ks(n_vecs: int, max_ks: int = PQ_MAX_KS) -> int:
    """Scale-aware codewords-per-subspace: sqrt(n) clamped to [2, 256].

    Every vector trains every subspace codebook, so the sqrt rule gives each
    codeword ~sqrt(n) training points (FAISS warns below ~39/centroid); 256
    is the classic 8-bit PQ code width -- past that, add subspaces (more
    codes/vector) rather than wider codebooks, which is the published PQ
    scaling recipe (Jegou et al., TPAMI'11 SS3).  Mirrors the oracle's
    ``greatest(least(round(sqrt(n)), 256), 2)`` — the same sqrt rule as
    :func:`derived_k`, reused so the rounding/clamping convention has ONE
    definition."""
    return derived_k(n_vecs, max_k=max_ks)


def pq_train(
    embeddings: DataFrame,
    m: int = PQ_M,
    iters: int = 2,
    ks: int | None = None,
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization trainer (Jegou et al., TPAMI'11): split each
    quantized vector into ``m`` contiguous subspaces and run an independent
    small k-means per subspace -- ALL subspaces trained in one set of
    DataFrame jobs by carrying ``sub_id`` as a grouping key (the same
    all-cells-at-once trick as :func:`kmeans_assign_two_level`).

    Returns ``(codes, codebook)``:

    * ``codes`` -- (vec_id, sub_id, code_id): the per-subspace assignment,
      i.e. each vector compressed to ``m`` small integers (n x m rows,
      the exploded form both the ADC scan and the oracle compare on);
    * ``codebook`` -- (sub_id, code_id, cvec): the m x ks codeword table
      (array<long>, quantized ints), always broadcast-sized (<= m*256 rows).

    Determinism/engine-exactness: integer L2-squared distances over the
    quantized components, argmin ties to the LOWEST code_id, centroid
    updates ``floor(sum/count)``, seeding is a derandomized random sample
    (the ks vec_ids with the smallest ``_hash20`` rank -- random-subset init
    is the standard PQ recipe; the md5 rank plays the uniform draw's role,
    and the DuckDB oracle reproduces it with the same strpos arithmetic).
    A convergence probe (exact xxhash64 assignment signature) allows early
    exit bit-identical to the oracle's fixed ``iters`` unroll, exactly as in
    :func:`kmeans_assign`.

    100 TB design: each Lloyd round is one broadcast join over the persisted
    sub-vector frame (n*m narrow rows) + a (sub_id, code_id, sub_pos)
    aggregation of m*ks*(dim/m) = ks*dim rows; only the m*ks codeword table
    ever reaches the driver (the textbook PQ trainer loop).  The trained
    codes are the 256x-compressed representation ADC search scans INSTEAD of
    raw vectors -- the memory/bandwidth step that makes billion-scale
    similarity scans feasible (IVF prunes candidates, PQ shrinks what is
    scanned)."""
    n = embeddings.count()
    if ks is None:
        ks = derived_ks(n)
    dim = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    qframe = embeddings.select("vec_id", _quant(F.col(vec_col)).alias("qe"))
    return _pq_core(qframe, m, iters, ks, dim // m)


def _pq_core(
    qframe: DataFrame, m: int, iters: int, ks: int, w: int
) -> tuple[DataFrame, DataFrame]:
    """PQ trainer core over a pre-quantized ``(vec_id, qe)`` frame — shared
    by :func:`pq_train` (raw vectors) and :func:`ivfpq_search` (coarse-cell
    RESIDUALS, the IVFADC composition)."""
    from pyspark import StorageLevel

    spark = qframe.sparkSession
    # persisted: feeds every Lloyd assignment + the update joins + the final
    # encode -- without it each pass re-reads parquet and re-quantizes.
    subs = (
        qframe
        .select(
            "vec_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.struct(
                        s.cast("int").alias("sub_id"),
                        F.slice("qe", s * F.lit(w) + 1, w).alias("svec"),
                    ),
                )
            ).alias("e"),
        )
        .select("vec_id", F.col("e.sub_id").alias("sub_id"), F.col("e.svec").alias("svec"))
        .persist(StorageLevel.DISK_ONLY)
    )

    # derandomized random-sample seeding: ks smallest (hash, vec_id) --
    # distributed TakeOrdered, then a ks-row driver map for code_id ranks
    seed_rows = (
        qframe.select("vec_id", _hash20(F.col("vec_id")).alias("h"))
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(ks)
        .collect()
    )
    seed_map = spark.createDataFrame(
        [(r["vec_id"], i) for i, r in enumerate(seed_rows)], "seed_id long, code_id int"
    )
    cb = (
        subs.join(F.broadcast(seed_map), subs["vec_id"] == seed_map["seed_id"])
        .select("sub_id", "code_id", F.col("svec").alias("cvec"))
    )

    def assign(cframe: DataFrame) -> DataFrame:
        scored = subs.join(F.broadcast(cframe), "sub_id").select(
            "vec_id", "sub_id", "code_id", _l2(F.col("svec"), F.col("cvec")).alias("dist")
        )
        return (
            scored.groupBy("vec_id", "sub_id")
            .agg(F.min(F.struct("dist", "code_id")).alias("mn"))
            .select("vec_id", "sub_id", F.col("mn.code_id").alias("code_id"))
        )

    prev_sig = None
    for _ in range(iters):
        a = assign(cb).persist(StorageLevel.DISK_ONLY)
        sig_row = a.agg(
            F.sum(F.xxhash64("vec_id", "sub_id", "code_id").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("c"),
        ).collect()[0]
        sig = (sig_row["s"], sig_row["c"])
        if sig == prev_sig:
            a.unpersist()
            break  # fixpoint: further rounds no-op on both engines
        prev_sig = sig
        upd = (
            a.join(subs, ["vec_id", "sub_id"])
            .select("sub_id", "code_id", F.posexplode("svec").alias("sub_pos", "xq"))
            .groupBy("sub_id", "code_id", "sub_pos")
            .agg(F.floor(F.sum("xq").cast("double") / F.count("*")).cast("long").alias("cq"))
            .groupBy("sub_id", "code_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub_pos", "cq"))), lambda s: s["cq"]
                ).alias("cvec")
            )
        )
        # empty codewords carry their previous centroid; the m*ks codeword
        # table is collected to the driver (standard PQ trainer loop)
        new_rows = {(r["sub_id"], r["code_id"]): r["cvec"] for r in upd.collect()}
        old_rows = {(r["sub_id"], r["code_id"]): r["cvec"] for r in cb.collect()}
        merged = [(s, c, new_rows.get((s, c), old_rows[(s, c)])) for s, c in sorted(old_rows)]
        cb = spark.createDataFrame(merged, "sub_id int, code_id int, cvec array<long>")
        a.unpersist()

    codes = assign(cb)
    codes._wqs_persisted = subs
    return codes, cb


def pq_adc_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    m: int = PQ_M,
    iters: int = 2,
    k: int = 100,
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: precompute the m x ks
    lookup table of exact integer sub-distances query<->codeword, then score
    every vector as the SUM of m table lookups -- never touching the raw
    vectors at scan time.  This is the PQ payoff: the scan reads n*m small
    ints instead of n*dim floats (32x less data at m=4/dim=64), and the
    distance math drops from dim multiplies to m broadcast-hash lookups.

    Exact-integer end to end (quantized components, BIGINT partial
    distances), so the DuckDB oracle reproduces the top-k bit-for-bit; ties
    break on vec_id.  One broadcast join + one hash agg + TakeOrdered -- no
    wide shuffle."""
    codes, cb = pq_train(embeddings, m=m, iters=iters, vec_col=vec_col)
    qq = [int(round(x * SCALE)) for x in query_vec]
    w = len(qq) // m
    qcol = F.array(*[F.lit(v).cast("long") for v in qq])
    lut = cb.select(
        "sub_id",
        "code_id",
        _l2(F.col("cvec"), F.slice(qcol, F.col("sub_id") * w + 1, w)).alias("pd2"),
    )
    out = (
        codes.join(F.broadcast(lut), ["sub_id", "code_id"])
        .groupBy("vec_id")
        .agg(F.sum("pd2").cast("long").alias("adc_d2"))
        .orderBy(F.asc("adc_d2"), F.asc("vec_id"))
        .limit(k)
    )
    out._wqs_persisted = getattr(codes, "_wqs_persisted", None)
    return out


def exact_l2_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact integer-L2 top-k vec_ids for a query — the ground-truth arm
    every compression/probing recall gauge compares against (shared by
    :func:`pq_recall_at_k` and the IVFADC recall registry entry)."""
    qq = [int(round(x * SCALE)) for x in query_vec]
    qcol = F.array(*[F.lit(v).cast("long") for v in qq])
    return (
        embeddings.select("vec_id", _quant(F.col(vec_col)).alias("qe"))
        .select("vec_id", _l2(F.col("qe"), qcol).alias("d2"))
        .orderBy(F.asc("d2"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )


def pq_recall_at_k(
    embeddings: DataFrame,
    query_vec: list[float],
    m: int = PQ_M,
    iters: int = 2,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ trust gauge: recall@k of the ADC top-k against the exact integer
    L2-squared top-k for the same query -- the compression-loss measurement
    every PQ deployment reads before swapping the raw-vector scan out (the
    L2/compression analog of ``ann_recall_at_k``).  Both arms are bounded
    top-k plans; the comparison is a k x k id join reduced to one row."""
    adc = pq_adc_topk(embeddings, query_vec, m=m, iters=iters, k=k, vec_col=vec_col)
    exact = exact_l2_topk(embeddings, query_vec, k=k, vec_col=vec_col)
    out = adc.select("vec_id").join(exact, "vec_id").agg(
        F.count("*").cast("long").alias("n_overlap"),
        F.round(F.count("*") / float(k), 6).alias(f"recall_at_{k}"),
    )
    out._wqs_persisted = getattr(adc, "_wqs_persisted", None)
    return out


def ivfpq_search(
    embeddings: DataFrame,
    query_vec: list[float],
    m: int = PQ_M,
    iters: int = 2,
    n_probes: int = 3,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC (Jegou et al., TPAMI'11 SS5): the canonical billion-scale ANN
    index, composing the two quantizers this module already has --

    1. COARSE: the k-means IVF quantizer assigns every vector a cell
       (:func:`kmeans_assign`); member-mean cell centroids are recomputed
       with the same integer floor-mean rule the search path uses.
    2. FINE: product quantization over the RESIDUALS ``x - centroid(x)``
       (:func:`_pq_core` on the residual frame) -- residuals are tighter
       than raw vectors, which is why IVFADC beats flat PQ at equal code
       budget.
    3. SEARCH: probe the ``n_probes`` nearest cells; build one ADC lookup
       table PER PROBED CELL against the query's cell-specific residual
       ``q - centroid(cell)``; score candidates by m table lookups and
       take the top k.

    Everything stays exact-integer (quantized components, BIGINT partial
    distances, floor-mean centroids, lowest-id tiebreaks), so the DuckDB
    oracle reproduces the top-k bit-for-bit.  At 100 TB: the scan touches
    only ``n * n_probes / k_cells`` code rows (cell pruning) of m small
    ints each (code compression) -- with the codes written bucketed by
    ``cent_id``, the probe set prunes partitions instead of filtering.
    """
    from pyspark import StorageLevel

    asg = kmeans_assign(embeddings, iters=iters, vec_col=vec_col)
    q = asg._wqs_persisted  # (vec_id, qe) DISK_ONLY
    asg = asg.persist(StorageLevel.DISK_ONLY)
    cents = _member_centroids(q, asg).persist(StorageLevel.DISK_ONLY)

    n = q.count()
    dim = len(q.select("qe").first()["qe"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    w = dim // m
    ks = derived_ks(n)

    # residual frame: x - centroid(cell(x)), exact integer subtraction
    resid = (
        q.join(asg, "vec_id")
        .join(F.broadcast(cents), "cent_id")
        .select("vec_id", F.zip_with("qe", "cvec", lambda x, y: x - y).alias("qe"))
    )
    codes, cb = _pq_core(resid, m, iters, ks, w)
    subs_handle = codes._wqs_persisted

    # --- search -----------------------------------------------------------
    qlit = F.array(*[F.lit(int(round(x * SCALE))).cast("long") for x in query_vec])
    probes = (
        cents.select("cent_id", "cvec", _l2(F.col("cvec"), qlit).alias("d"))
        .orderBy("d", "cent_id")
        .limit(n_probes)
        .select("cent_id", F.col("cvec").alias("cellvec"))
    )
    # per-cell ADC lookup table: codeword vs the query's CELL residual,
    # n_probes x m x ks rows -- broadcast-sized by construction
    cbv = cb.select("sub_id", "code_id", F.col("cvec").alias("codeword"))
    sub_q = F.slice(qlit, F.col("sub_id") * w + 1, w)
    sub_c = F.slice(F.col("cellvec"), F.col("sub_id") * w + 1, w)
    lut = probes.crossJoin(F.broadcast(cbv)).select(
        "cent_id",
        "sub_id",
        "code_id",
        _l2(F.col("codeword"), F.zip_with(sub_q, sub_c, lambda x, y: x - y)).alias("pd2"),
    )
    out = (
        codes.join(asg, "vec_id")
        .join(F.broadcast(lut), ["cent_id", "sub_id", "code_id"])
        .groupBy("vec_id")
        .agg(F.sum("pd2").cast("long").alias("adc_d2"))
        .orderBy(F.asc("adc_d2"), F.asc("vec_id"))
        .limit(k)
    )
    out._wqs_persisted = [q, asg, cents, subs_handle]
    return out


def hard_negatives(
    embeddings: DataFrame,
    holdout_mod: int = 10,
    iters: int = 2,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-pair mining over the IVF cells: for every anchor
    (``vec_id % holdout_mod == 0``) find, among the OTHER vectors in its
    own k-means cell, the most-similar SAME-label vector (the positive)
    and the most-similar DIFFERENT-label vector (the HARD negative) — the
    per-anchor triplet (anchor, positive, hard negative) that trains
    embedding models far better than random negatives (in-batch/random
    negatives are trivially far; the hard ones sit right at the decision
    boundary, and cell-mates are exactly the near-boundary candidates).

    Cell-bounded like :func:`knn_classify` — the candidate join is
    cent_id-keyed (Σ anchors_c × cand_c, never anchors × corpus), cosine
    is exact quantized-integer, argmax ties break on lowest candidate id,
    and anchors lacking a same-label or different-label cell-mate drop
    (identically in both engines).  Returns one row per minable anchor:
    (vec_id, label, pos_id, pos_cos, neg_id, neg_cos, margin)."""
    from pyspark import StorageLevel

    asg = kmeans_assign(embeddings, iters=iters, vec_col=vec_col)
    q = asg._wqs_persisted
    aq = (
        asg.join(q, "vec_id")
        .join(embeddings.select("vec_id", label_col), "vec_id")
        .persist(StorageLevel.DISK_ONLY)
    )
    is_anchor = F.col("vec_id") % holdout_mod == 0
    pr = aq.filter(is_anchor).select(
        F.col("vec_id").alias("pid"),
        "cent_id",
        F.col("qe").alias("pqe"),
        F.col(label_col).alias("label"),
    )
    ca = aq.filter(~is_anchor).select(
        F.col("vec_id").alias("cid"),
        "cent_id",
        F.col("qe").alias("cqe"),
        F.col(label_col).alias("cand_label"),
    )
    np_, nc = _sqnorm(F.col("pqe")), _sqnorm(F.col("cqe"))
    dot = _dot(F.col("pqe"), F.col("cqe"))
    cos = F.when(
        (np_ > 0) & (nc > 0),
        dot.cast("double") / F.sqrt(np_.cast("double") * nc.cast("double")),
    ).otherwise(F.lit(0.0))
    scored = pr.join(ca, "cent_id").select(
        "pid", "label", "cid", "cand_label", cos.alias("cos")
    )

    def best(side: DataFrame, prefix: str) -> DataFrame:
        # argmax cosine, lowest-cid tiebreak, via one ordered struct-max
        return (
            side.groupBy("pid", "label")
            .agg(F.max(F.struct(F.col("cos"), (-F.col("cid")).alias("nid"))).alias("m"))
            .select(
                "pid",
                "label",
                (-F.col("m.nid")).alias(f"{prefix}_id"),
                F.col("m.cos").alias(f"{prefix}_cos"),
            )
        )

    pos = best(scored.filter(F.col("cand_label") == F.col("label")), "pos")
    neg = best(scored.filter(F.col("cand_label") != F.col("label")), "neg")
    out = (
        pos.join(neg, ["pid", "label"])
        .select(
            F.col("pid").alias("vec_id"),
            "label",
            "pos_id",
            F.round("pos_cos", 6).alias("pos_cos"),
            "neg_id",
            F.round("neg_cos", 6).alias("neg_cos"),
            F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
        )
    )
    out._wqs_persisted = [q, aq]
    return out
