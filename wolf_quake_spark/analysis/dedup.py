"""Deduplication operators for training-data pipelines.

All hashing is md5-based so results are engine-portable (the DuckDB oracle
reproduces them exactly); at 100 TB every operator below is shuffle-minimal:

* exact / normalized dedup — one hash-groupBy (map-side partial agg);
* MinHash+LSH — shingle explode is narrow; the only shuffle is the
  per-doc signature groupBy, and band buckets are a second small agg over
  (doc, band) rows (k·n rows, k tiny).  Candidate pairs come from joining
  docs within a bucket — bounded by bucket size, the standard LSH trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis import WS_SPLIT

DEFAULT_K = 8  # minhash permutations
DEFAULT_BANDS = 4  # → rows-per-band = K // BANDS


def exact_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc md5 of the raw text (exact-duplicate key)."""
    return docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        exact_hash(docs, text_col)
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


def normalized_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-collapsed, lowercased rolling fingerprint (near-exact dup key)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), WS_SPLIT, " ")))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def shingle_array(words_col, n: int = 3):
    """Array of word n-gram shingles from a word-array column.

    Built as ``arrays_zip`` over n shifted ``slice``s of the word array —
    a constant number of array ops per row.  (The naive
    ``transform(sequence(...), j -> element_at(words, j+i))`` form
    re-evaluates the split per element and is O(words²) per doc: measured
    ~9 s for 5,000 docs vs sub-second for this formulation.)
    """
    sz = F.greatest(F.size(words_col) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(words_col, i + 1, sz).alias(str(i)) for i in range(n)]
    )
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc (docs shorter than n words → none)."""
    words = F.split(F.trim(F.col(text_col)), WS_SPLIT)
    w = docs.select("doc_id", words.alias("_w"))
    return (
        w.select("doc_id", F.explode(shingle_array(F.col("_w"), n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    k: int = DEFAULT_K,
    shingle_n: int = 3,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """k-permutation MinHash over word shingles.

    Permutation i is simulated by md5(i || shingle) (portable across
    engines); the signature component is the lexicographic min — the
    standard min-wise independent family trick, exact enough for LSH.

    ``shingles`` lets callers share one (persisted) shingle frame across
    several consumers — Catalyst does not reuse the explode+distinct
    exchange across the self-join branches on its own (measured: 8 separate
    Generate/Exchange pairs in the verified-pairs plan without it).
    """
    sh = shingles if shingles is not None else word_shingles(docs, n=shingle_n, text_col=text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.col("shingle")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(
    docs: DataFrame,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band_id, band_hash): docs sharing a band_hash are candidates."""
    rows = k // bands
    sig = minhash_signatures(
        docs, k=k, shingle_n=shingle_n, text_col=text_col, shingles=shingles
    )
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat(*parts)).alias("band_hash"))
        )
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def lsh_buckets(docs: DataFrame, **kw) -> DataFrame:
    """Bucket occupancy — the scale-path view (no pair explosion)."""
    return (
        lsh_bands(docs, **kw)
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def candidate_pairs(
    docs: DataFrame,
    max_bucket: int | None = None,
    observation=None,
    **kw,
) -> DataFrame:
    """Near-duplicate candidate pairs via band-bucket self-join.

    ``max_bucket`` drops band buckets with more than that many docs from
    pair generation (the stopband cap that bounds a degenerate bucket's
    O(bucket²) contribution — same trade as winnow's ``max_df``); the
    default generates pairs from every bucket.  ``observation`` (a
    ``pyspark.sql.Observation``) surfaces the cap's effect as metrics
    computed inside the same job — ``buckets_total``, ``buckets_dropped``,
    ``postings_dropped`` — so a silently-capped run is visible in the run
    manifest instead of reading as full coverage.  Cost: the bucket-size
    aggregate + a LEFT SEMI prune, only paid when either option is set.
    """
    bands = lsh_bands(docs, **kw)
    if max_bucket is None and observation is None:
        return _pairs_of(bands)
    sizes = bands.groupBy("band_id", "band_hash").agg(F.count("*").alias("_n"))
    cap = max_bucket
    handle = None
    if observation is not None:
        over = F.lit(False) if cap is None else (F.col("_n") > cap)
        sizes = sizes.observe(
            observation,
            F.count(F.lit(1)).alias("buckets_total"),
            F.sum(F.when(over, 1).otherwise(0)).alias("buckets_dropped"),
            F.sum(F.when(over, F.col("_n")).otherwise(0)).alias("postings_dropped"),
        )
        # Fire the metrics with a dedicated top-level action on the observed
        # frame BEFORE any join consumes it: a CollectMetrics node that ends
        # up inside a broadcast exchange (small semi-join side) executes on
        # the broadcast path and never reports, and one cloned into both
        # sides of a self-join aborts the read — persist+count sidesteps
        # both, and downstream consumes the (tiny) cached size table.
        from pyspark import StorageLevel

        sizes = sizes.persist(StorageLevel.DISK_ONLY)
        sizes.count()
        handle = sizes
    if cap is not None:
        sizes = sizes.filter(F.col("_n") <= cap)
    bands = bands.join(
        sizes.select("band_id", "band_hash"), ["band_id", "band_hash"], "left_semi"
    )
    out = _pairs_of(bands)
    if handle is not None:
        out._wqs_persisted = handle
    return out


def _pairs_of(bands: DataFrame) -> DataFrame:
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def verified_pairs(
    docs: DataFrame,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    text_col: str = "text",
    max_bucket: int | None = None,
    observation=None,
) -> DataFrame:
    """LSH candidate pairs verified with exact shingle Jaccard, end to end.

    Computes the shingle frame ONCE and persists it (DISK_ONLY — see
    BENCH.md on MemoryStore contention) for the five consumers in the plan
    (minhash signatures, both join sides, set sizes, intersection); without
    sharing, Catalyst re-runs the explode+distinct per branch.

    The persisted handle is exposed as ``result._wqs_persisted`` so callers
    MUST ``unpersist()`` it once the result is materialized in long-lived
    sessions (bench.py does).  Spark's CacheManager holds a strong JVM
    reference to a persisted plan, so Python GC does NOT reclaim it; an
    unreleased handle costs session-lifetime disk-cache blocks (DISK_ONLY —
    no executor memory, but real disk).  Note the attribute does not survive
    further DataFrame transformations (each returns a new object).
    """
    from pyspark import StorageLevel

    sh = word_shingles(docs, n=shingle_n, text_col=text_col).persist(
        StorageLevel.DISK_ONLY
    )
    pairs = candidate_pairs(
        docs,
        k=k,
        bands=bands,
        shingle_n=shingle_n,
        text_col=text_col,
        shingles=sh,
        max_bucket=max_bucket,
        observation=observation,
    )
    out = ngram_jaccard(docs, pairs, shingle_n=shingle_n, shingles=sh)
    from wolf_quake_spark.analysis import persisted_handles

    handles = [sh] + persisted_handles(pairs)
    out._wqs_persisted = handles if len(handles) > 1 else sh
    return out


def fuzzy_key_pairs(
    docs: DataFrame,
    prefix_len: int = 32,
    max_edits: int = 5,
    text_col: str = "text",
    length_bucket: int = 8,
    salt: int | None = None,
    hot_block_size: int = 1024,
    max_block: int | None = None,
    observation=None,
) -> DataFrame:
    """Entity-resolution-style fuzzy matching: document pairs whose
    normalized text prefix is within ``max_edits`` Levenshtein edits,
    candidate-blocked on a COMPOSITE key (first token, length bucket).

    The classic blocked record-linkage shape: normalize → block (cheap
    equality key) → verify (expensive edit distance) only within blocks —
    never all-pairs.  First-token-only blocking is skew-prone (boilerplate
    openers put every "terms ..." doc in one block → one O(block²) task);
    the composite key splits each token block by ``floor(len/length_bucket)``
    with the B side exploded to the bucket's ±1 neighborhood.  Because
    Levenshtein ≥ |len difference|, any pair within ``max_edits`` edits sits
    in the same or an adjacent bucket whenever ``length_bucket > max_edits``
    — so the OUTPUT is provably identical to single-key blocking (the same
    restate-don't-weaken trade as purchase_window_clicks' range join) while
    candidate volume drops from Σ token-block² to Σ (token,bucket)-block².
    Each unordered pair is generated exactly once: the A side carries only
    its own bucket, the B side its {-1,0,+1} neighborhood, and exactly one
    B-emission matches A's bucket.

    ``salt=S`` additionally splits the A side of blocks LARGER than
    ``hot_block_size`` across S deterministic salts (``doc_id % S``), with
    the B side of those blocks replicated S-fold — the targeted skew-join
    salting also used for mega-conversations in sessionize.  Output is
    unchanged (each pair still meets exactly once, at A's salt); per-task
    verify work for a hot block drops ~S-fold.  The hot-block list is one
    aggregate broadcast back — tiny by construction.  Edit distance runs
    JVM-side as THRESHOLD Levenshtein (the 3-arg banded form, O(d·len) per
    pair instead of O(len²) — it abandons a pair the moment the running
    distance exceeds ``max_edits``).

    Growth honesty: blocked candidate volume is Σ block² — ~linear only
    while the blocking-key VOCABULARY grows with the corpus.  On a corpus
    whose opener vocabulary saturates (measured on the synthetic fixture:
    10× docs → 94× candidates, while true output grew 10.5×), token blocks
    grow linearly and candidates quadratically.  Remedies, outermost first:
    ``max_block`` drops blocks larger than the cap from pair generation
    (the same stopband trade as LSH's ``max_bucket`` / winnow's ``max_df``),
    with ``observation`` reporting ``blocks_total`` / ``blocks_dropped`` /
    ``postings_dropped`` from the same job so capped coverage is auditable;
    the exact-filter upgrade path is rare-gram prefix filtering (Ed-Join,
    Xiao et al. VLDB'08) or segment pigeonhole (PassJoin), which keep
    candidates output-bound at the cost of a gram index.
    """
    if length_bucket <= max_edits:
        raise ValueError("length_bucket must exceed max_edits for exactness")
    key = F.substring(
        F.lower(F.regexp_replace(F.col(text_col), WS_SPLIT, " ")), 1, prefix_len
    )
    keyed = docs.select(
        "doc_id",
        key.alias("k"),
        F.split(key, " ")[0].alias("block"),
        F.floor(F.length(key) / length_bucket).alias("lb"),
    ).filter(F.col("k") != "")
    obs_handle = None
    if max_block is not None or observation is not None:
        sizes = keyed.groupBy("block").agg(F.count("*").alias("_n"))
        if observation is not None:
            over = (
                F.lit(False) if max_block is None else (F.col("_n") > max_block)
            )
            sizes = sizes.observe(
                observation,
                F.count(F.lit(1)).alias("blocks_total"),
                F.sum(F.when(over, 1).otherwise(0)).alias("blocks_dropped"),
                F.sum(F.when(over, F.col("_n")).otherwise(0)).alias(
                    "postings_dropped"
                ),
            )
            # dedicated top-level action on the observed frame — see
            # candidate_pairs (broadcast-buried CollectMetrics never reports)
            from pyspark import StorageLevel

            sizes = sizes.persist(StorageLevel.DISK_ONLY)
            sizes.count()
            obs_handle = sizes
        if max_block is not None:
            sizes = sizes.filter(F.col("_n") <= max_block)
        keyed = keyed.join(sizes.select("block"), "block", "left_semi")
    if salt:
        hot = (
            keyed.groupBy("block")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > hot_block_size)
            .select("block")
        )
        keyed = keyed.join(F.broadcast(hot).withColumn("_hot", F.lit(True)), "block", "left")
        a_salt = F.when(F.col("_hot").isNotNull(), F.col("doc_id") % salt).otherwise(
            F.lit(0)
        )
        b_salts = F.when(
            F.col("_hot").isNotNull(), F.array(*[F.lit(s) for s in range(salt)])
        ).otherwise(F.array(F.lit(0)))
    else:
        a_salt = F.lit(0)
        b_salts = F.array(F.lit(0))
    a = keyed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("k").alias("ka"),
        "block",
        F.col("lb").alias("lbj"),
        a_salt.cast("long").alias("s"),
    )
    b = keyed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("k").alias("kb"),
        "block",
        F.explode(F.array(F.col("lb") - 1, F.col("lb"), F.col("lb") + 1)).alias("lbj"),
        b_salts.alias("_ss"),
    ).select(
        "doc_b", "kb", "block", "lbj", F.explode("_ss").alias("_s")
    ).select(
        "doc_b", "kb", "block", "lbj", F.col("_s").cast("long").alias("s")
    )
    # threshold form: banded O(d·len) DP that returns -1 past the budget
    ed = F.levenshtein("ka", "kb", max_edits).cast("long")
    out = (
        a.join(b, ["block", "lbj", "s"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ed.alias("edits"))
        .filter(F.col("edits") >= 0)
    )
    if obs_handle is not None:
        out._wqs_persisted = obs_handle
    return out


def crossdup_pairs(
    docs: DataFrame,
    is_new,
    threshold: float = 0.5,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Incremental ingestion dedup: near-dup pairs between a NEW batch and
    the EXISTING corpus only — the shape a daily crawl actually needs
    (is today's doc a near-dup of anything already kept?), which the
    self-join family (:func:`verified_pairs`) cannot express without paying
    the corpus×corpus candidate cost again on every ingest.

    ``is_new`` is a boolean Column splitting the frame.  Same MinHash/LSH
    machinery as the self-join path — one shared shingle frame feeds both
    the signatures and the exact-Jaccard verify — but the band-bucket join
    is new×corpus, so within-corpus and within-batch bucket pairs never
    materialize: candidate volume is Σ_bucket n_new·n_corpus instead of
    Σ n², the right asymptotics when the daily batch is ≪ the corpus.
    At 100 TB the corpus side's bands/shingles are written once and reused
    per ingest (this function recomputes them only because the registry
    query is self-contained).

    Returns (doc_new, doc_corpus, jaccard ≥ threshold).  The shared shingle
    frame rides ``_wqs_persisted``.
    """
    from pyspark import StorageLevel

    sh = word_shingles(docs, n=shingle_n, text_col=text_col).persist(
        StorageLevel.DISK_ONLY
    )
    bf = lsh_bands(
        docs, k=k, bands=bands, shingle_n=shingle_n, text_col=text_col, shingles=sh
    )
    flags = docs.select("doc_id", is_new.alias("_new"))
    tagged = bf.join(flags, "doc_id")
    a = tagged.filter(F.col("_new")).select(
        F.col("doc_id").alias("doc_a"), "band_id", "band_hash"
    )
    b = tagged.filter(~F.col("_new")).select(
        F.col("doc_id").alias("doc_b"), "band_id", "band_hash"
    )
    cand = (
        a.join(b, ["band_id", "band_hash"]).select("doc_a", "doc_b").distinct()
    )
    jac = ngram_jaccard(docs, cand, shingle_n=shingle_n, shingles=sh)
    out = jac.filter(F.col("jaccard") >= threshold).select(
        F.col("doc_a").alias("doc_new"),
        F.col("doc_b").alias("doc_corpus"),
        "jaccard",
    )
    out._wqs_persisted = sh
    return out


def passjoin_pairs(
    docs: DataFrame,
    max_edits: int = 3,
    prefix_len: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """EXACT edit-distance self-join via PassJoin segment pigeonhole
    (Li, Deng & Feng, ICDE'11) — every unordered doc pair whose normalized
    ``prefix_len``-char key is within ``max_edits`` Levenshtein edits, with
    NO heuristic blocking and NO caps.

    This is the exact-filter upgrade path named in :func:`fuzzy_key_pairs`:
    token blocking is skew-prone and only finds pairs sharing an opener,
    while PassJoin is output-complete.  Pigeonhole: split each indexed key
    into ``τ+1`` contiguous segments (τ = ``max_edits``); τ edits can touch
    at most τ segments, so a match must contain at least one segment EXACTLY,
    shifted by at most τ positions (each edit moves downstream text ≤ 1).

    Plan shape (all JVM expressions, two narrow explodes + one equi-join):

    * index side — τ+1 rows per doc ``(la, i, seg)`` where ``la`` is the
      key length and ``seg`` the i-th even-partition segment (first
      ``τ+1−(la mod τ+1)`` segments get ``la div τ+1`` chars, the rest one
      more);
    * probe side — for each candidate source length ``la ∈ [l−τ, l+τ]``
      (edit distance ≥ length difference) and each segment index, the
      substrings of this key in the ±τ start-position window, built as
      ``transform(filter(sequence(...)))`` so the window clamps without a
      type-ambiguous empty-array branch;
    * equi-join on ``(la, i, seg)`` → canonicalize the unordered pair
      (swapping the carried keys with the ids so the distinct collapses
      both directions) → verify with THRESHOLD ``levenshtein(k1, k2, τ)``.

    100 TB: candidates are bounded by docs sharing an exact ``~prefix/τ+1``-
    char substring at a compatible position — output-bound on natural text
    (vs Σ block² for token blocking), no CartesianProduct, one shuffle for
    the join and one for the pair distinct.  Probe fan-out is
    ``(2τ+1)²(τ+1)`` ≈ 200 skinny rows/doc at τ=3 — linear in corpus size.
    The multi-match-aware window of the paper (shift bounded by edits
    *remaining* per side) would cut probe fan-out ~2×; the ±τ window used
    here is its provable superset, so exactness is unaffected.

    Oracle honesty: the registry oracle for this operator is BRUTE FORCE
    (all pairs within the provable |Δlen| ≤ τ bound) — it verifies the
    pigeonhole implementation against ground truth rather than mirroring it.
    Keys shorter than τ+1 chars are excluded on both sides (segments would
    be empty; such keys are degenerate for edit-distance linkage).
    """
    tau = int(max_edits)
    kseg = tau + 1
    key = F.substring(
        F.lower(F.regexp_replace(F.col(text_col), WS_SPLIT, " ")), 1, prefix_len
    )
    keyed = (
        docs.select("doc_id", key.alias("k"))
        .withColumn("l", F.length("k"))
        .filter(F.col("l") > tau)
    )

    # Even-partition arithmetic for a key of length L (0-indexed segment i):
    #   base = L div kseg, r = L mod kseg
    #   len_i = base + (i >= kseg - r), start_i = i*base + max(0, i-(kseg-r))
    def _leni(L: str) -> str:
        return (
            f"(({L} div {kseg}) + (CASE WHEN i >= {kseg} - ({L} % {kseg})"
            f" THEN 1 ELSE 0 END))"
        )

    def _starti(L: str) -> str:
        return (
            f"(i * ({L} div {kseg})"
            f" + greatest(0, i - ({kseg} - ({L} % {kseg}))))"
        )

    idx_expr = (
        f"transform(sequence(0, {tau}), i -> named_struct("
        f"'i', CAST(i AS INT), "
        f"'seg', substring(k, CAST({_starti('l')} AS INT) + 1,"
        f" CAST({_leni('l')} AS INT))))"
    )
    idx = keyed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("k").alias("ka"),
        F.col("l").cast("int").alias("la"),
        F.explode(F.expr(idx_expr)).alias("s"),
    ).select("doc_a", "ka", "la", F.col("s.i").alias("i"), F.col("s.seg").alias("seg"))

    probe_expr = (
        f"flatten(transform(sequence(greatest({kseg}, l - {tau}), l + {tau}), la -> "
        f"flatten(transform(sequence(0, {tau}), i -> "
        f"transform("
        f"  filter(sequence({_starti('la')} - {tau}, {_starti('la')} + {tau}),"
        f"         p -> p >= 0 AND p <= l - {_leni('la')}),"
        f"  p -> named_struct("
        f"'la', CAST(la AS INT), 'i', CAST(i AS INT), "
        f"'seg', substring(k, CAST(p AS INT) + 1, CAST({_leni('la')} AS INT))))"
        f"))))"
    )
    probe = keyed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("k").alias("kb"),
        F.explode(F.expr(probe_expr)).alias("s"),
    ).select(
        "doc_b",
        "kb",
        F.col("s.la").alias("la"),
        F.col("s.i").alias("i"),
        F.col("s.seg").alias("seg"),
    )

    a_first = F.col("doc_a") < F.col("doc_b")
    cand = (
        idx.join(probe, ["la", "i", "seg"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("pa"),
            F.greatest("doc_a", "doc_b").alias("pb"),
            F.when(a_first, F.col("ka")).otherwise(F.col("kb")).alias("k1"),
            F.when(a_first, F.col("kb")).otherwise(F.col("ka")).alias("k2"),
        )
        .distinct()
    )
    ed = F.levenshtein("k1", "k2", tau).cast("long")
    return (
        cand.select(
            F.col("pa").alias("doc_a"),
            F.col("pb").alias("doc_b"),
            ed.alias("edits"),
        )
        .filter(F.col("edits") >= 0)
    )


def edjoin_pairs(
    docs: DataFrame,
    max_edits: int = 2,
    q: int = 2,
    prefix_len: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """EXACT edit-distance self-join via Ed-Join q-gram prefix filtering
    (Xiao, Wang & Lin, VLDB'08) — the second exact-filter family next to
    :func:`passjoin_pairs`, trading PassJoin's positional segment probe for
    a GLOBAL-RARITY gram prefix: candidates must share one of each key's
    ``q·τ+1`` globally-rarest q-grams, so hot grams ("the ", "ing ") never
    generate candidates unless a key has nothing rarer.

    Exactness chain (count filter → prefix filter, both classical):

    * each of the ``τ`` edits destroys at most ``q`` positional q-grams, so
      keys within τ edits share ≥ ``max(|G_s|,|G_t|) − qτ`` grams as
      MULTISETS (Gravano et al., VLDB'01 count filter);
    * multiset intersection is made a set intersection by occurrence
      numbering — element = (gram, k-th occurrence), so Σ min counts is
      literal equi-join equality;
    * prefix-filter lemma (Chaudhuri et al., ICDE'06): under any global
      total order, two sets with overlap ≥ α intersect within their first
      ``|set| − α + 1`` elements; with α = max(|G|) − qτ that bound is
      ≤ ``qτ+1`` on both sides.  The order used is (df, gram, occ) — ties
      impossible because (gram, occ) IS the element identity.
    Keys shorter than ``q(τ+1)`` chars have |G| ≤ qτ where the count filter
    is vacuous, so they are excluded on BOTH sides (mirrored by the
    brute-force oracle) — same degenerate-key rule as PassJoin's ``l > τ``.

    Plan shape: one explode to positional grams (~prefix_len skinny rows
    per doc), a bounded per-(doc, gram) occurrence window, one (gram, occ)
    hash-agg for global document frequency, a per-doc collect_list →
    array_sort → slice (≤ prefix_len structs per group — bounded, never a
    corpus-wide window) for the rarity prefix, then the prefix×prefix
    equi-join on (gram, occ) with the |Δlen| ≤ τ filter, pair
    canonicalization exactly as PassJoin, and THRESHOLD
    ``levenshtein(k1, k2, τ)`` verify.

    100 TB: candidate volume is Σ over PREFIX grams of df² — the global
    rarity order concentrates the prefix on low-df grams, the textbook
    Ed-Join bound (vs PassJoin's exact-substring-at-position bound; the two
    families shine on different data — Ed-Join on long keys with rare
    content, PassJoin on short keys where segments are long).  Everything
    is JVM expressions: two shuffles for the df agg + join, one for the
    prefix groupBy, one for the candidate join, one for the pair distinct.

    Oracle honesty: the registry oracle is BRUTE FORCE over the |Δlen| ≤ τ
    bound — it certifies output-completeness of the prefix filter against
    ground truth, not a mirror of it.
    """
    from pyspark.sql.window import Window

    tau = int(max_edits)
    pre_n = q * tau + 1
    key = F.substring(
        F.lower(F.regexp_replace(F.col(text_col), WS_SPLIT, " ")), 1, prefix_len
    )
    keyed = (
        docs.select("doc_id", key.alias("k"))
        .withColumn("l", F.length("k").cast("int"))
        .filter(F.col("l") >= q * (tau + 1))
    )
    grams = keyed.select(
        "doc_id",
        "k",
        "l",
        F.posexplode(
            F.expr(f"transform(sequence(1, l - {q} + 1), p -> substring(k, p, {q}))")
        ).alias("p0", "g"),
    )
    occ = F.row_number().over(
        Window.partitionBy("doc_id", "g").orderBy("p0")
    )  # bounded frame: occurrences of one gram within one <=prefix_len key
    els = grams.select("doc_id", "k", "l", "g", occ.cast("int").alias("occ"))
    df_tab = els.groupBy("g", "occ").agg(F.count("*").alias("df"))
    prefix = (
        els.join(df_tab, ["g", "occ"])
        .groupBy("doc_id", "k", "l")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("df", "g", "occ"))), 1, pre_n
            ).alias("pre")
        )
        .select("doc_id", "k", "l", F.explode("pre").alias("e"))
        .select("doc_id", "k", "l", F.col("e.g").alias("g"), F.col("e.occ").alias("occ"))
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("k").alias("ka"),
        F.col("l").alias("la"), "g", "occ",
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("k").alias("kb"),
        F.col("l").alias("lb"), "g", "occ",
    )
    a_first = F.col("doc_a") < F.col("doc_b")
    cand = (
        a.join(b, ["g", "occ"])
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= tau)
        )
        .select(
            F.least("doc_a", "doc_b").alias("pa"),
            F.greatest("doc_a", "doc_b").alias("pb"),
            F.when(a_first, F.col("ka")).otherwise(F.col("kb")).alias("k1"),
            F.when(a_first, F.col("kb")).otherwise(F.col("ka")).alias("k2"),
        )
        .distinct()
    )
    ed = F.levenshtein("k1", "k2", tau).cast("long")
    return (
        cand.select(
            F.col("pa").alias("doc_a"),
            F.col("pb").alias("doc_b"),
            ed.alias("edits"),
        )
        .filter(F.col("edits") >= 0)
    )


def ppjoin_pairs(
    docs: DataFrame,
    t_num: int = 3,
    t_den: int = 5,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """EXACT Jaccard set-similarity self-join via prefix filtering (the
    All-Pairs/PPJoin family: Bayardo, Ma & Srikant WWW'07; Xiao, Wang, Lin
    & Yu WWW'08) over per-document word-SHINGLE sets (the same distinct
    ``shingle_n``-gram sets the MinHash family signs) — the third
    exact-filter join family next to PassJoin/Ed-Join (those bound EDIT
    distance on a prefix key; this bounds SET similarity on the full
    shingle set, the semantics MinHash/LSH only approximate — so a PPJoin
    row is the exact ground truth the LSH rows estimate).

    Threshold is the exact fraction ``t_num/t_den`` (default 3/5 = 0.6) so
    every comparison is integer arithmetic — no IEEE boundary can
    include/exclude a pair differently across engines.

    Candidate generation (the scale argument):

    1. tokens are globally ordered RAREST-FIRST by (document frequency,
       token) — one groupBy(token) count, broadcast back via join;
    2. each doc keeps only its PREFIX under that order: the first
       ``|s| - ceil(t*|s|) + 1`` tokens.  Completeness proof (probe-prefix
       vs full-set form): for a qualifying pair with |a| <= |b| (ties on
       doc_id), J >= t implies |inter| >= t*|union| >= t*|a|; a's suffix
       holds only ``ceil(t*|a|) - 1 < t*|a| <= |inter|`` tokens, so at
       least one common token sits in a's PREFIX — joining prefix(smaller
       side) x all-tokens(larger side) on the token misses nothing;
    3. the join applies the provable size bound ``t*|b| <= |a|`` (integer
       form ``t_den*|a| >= t_num*|b|``), then dedups candidates.

    Candidate volume is sum over tokens of prefix_count x token_count —
    rarest-first ordering puts only RARE tokens in prefixes, which is the
    whole point of the family: frequent tokens (the O(n^2) threat) never
    generate candidates.  Verification joins each candidate to the two
    per-doc sorted token arrays and computes the exact intersection — one
    narrow array op per candidate.  No CartesianProduct, no caps, no
    heuristics: the DuckDB oracle is BRUTE FORCE over the |size|-ratio
    bound, so a green row certifies output-completeness against ground
    truth, not self-consistency.

    At 100 TB: token-frequency agg, per-doc window rank, and the bucketed
    candidate join are all key-partitioned shuffles; per-doc state is
    bounded by doc length.  Skewed tokens cannot explode candidates
    because a token appears in a PREFIX only while it is globally rare.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # three consumers (global-df agg, ranked prefix join, verify arrays) —
    # persist the shingle explode once, handle released by the registry
    toks = (
        word_shingles(docs, n=shingle_n, text_col=text_col)
        .withColumnRenamed("shingle", "tok")
        .persist(StorageLevel.DISK_ONLY)
    )
    # global rarest-first order: (df asc, tok asc) — deterministic
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("tok"))
            ),
        )
        .withColumn("sz", F.count("*").over(Window.partitionBy("doc_id")))
    )
    # prefix length |s| - ceil(t|s|) + 1; ceil(t_num*s/t_den) via floordiv
    ceil_ts = F.floor((F.lit(t_num) * F.col("sz") + F.lit(t_den - 1)) / F.lit(t_den))
    prefix = ranked.filter(F.col("pos") <= F.col("sz") - ceil_ts + 1).select(
        F.col("doc_id").alias("pa"), F.col("tok").alias("tok"), F.col("sz").alias("sa")
    )
    allt = ranked.select(
        F.col("doc_id").alias("pb"), F.col("tok").alias("tok"), F.col("sz").alias("sb")
    )
    # probe prefix of the SMALLER side (ties: lower doc_id) against all
    # tokens of the larger; size bound t*|b| <= |a| in integer form
    cand = (
        prefix.join(allt, "tok")
        .filter(
            (
                (F.col("sa") < F.col("sb"))
                | ((F.col("sa") == F.col("sb")) & (F.col("pa") < F.col("pb")))
            )
            & (F.lit(t_den) * F.col("sa") >= F.lit(t_num) * F.col("sb"))
        )
        .select("pa", "pb")
        .distinct()
    )
    arrs = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("tok")).alias("ts"), F.count("*").alias("sz")
    )
    aa = arrs.select(
        F.col("doc_id").alias("pa"), F.col("ts").alias("ta"), F.col("sz").alias("na")
    )
    bb = arrs.select(
        F.col("doc_id").alias("pb"), F.col("ts").alias("tb"), F.col("sz").alias("nb")
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    out = (
        cand.join(aa, "pa")
        .join(bb, "pb")
        .withColumn("n_inter", inter.cast("long"))
        .filter(
            F.lit(t_den) * F.col("n_inter")
            >= F.lit(t_num) * (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .select(
            F.least("pa", "pb").alias("doc_a"),
            F.greatest("pa", "pb").alias("doc_b"),
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    out._wqs_persisted = toks
    return out


def line_dedup(
    docs: DataFrame,
    words_per_line: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """C4-style corpus-wide LINE deduplication with document reassembly
    (Raffel et al., JMLR'20 §2.2 "we discard all but one of any three-
    sentence span occurring more than once"): every exact-duplicate line is
    dropped EVERYWHERE except its first occurrence (lowest (doc_id, line
    index) wins — deterministic, order-independent), and surviving lines
    are reassembled per document in original order.

    This corpus has no newlines, so a "line" is a fixed ``words_per_line``
    word window (deterministic chunking shared with doc_chunks); on real
    data the chunker is one `split`-expression swap.  Unlike
    ``dup_ngram_spans`` (a per-doc duplication SIGNAL), this is the
    destructive cleanup op itself, returning the cleaned corpus.

    Plan: one explode to (doc_id, lidx, line) instances, one groupBy(line)
    min-struct for the global first occurrence, one equi-join back to keep
    survivors, one per-doc collect_list/array_sort/array_join to
    reassemble, LEFT join so fully-deduplicated docs survive with empty
    text.  100 TB: all hash aggregations on the line string — at real
    scale key the agg on ``xxhash64(line)`` and keep the string only for
    the final verify, C4's own trick; candidate volume is corpus line
    count, never pairwise.

    Returns (doc_id, clean_text, n_kept, n_dropped).
    """
    words = F.split(F.trim(F.col(text_col)), WS_SPLIT)
    W = int(words_per_line)
    chunks = F.expr(
        f"transform(sequence(0, CAST(ceil(size(_w) / {W}.0) AS INT) - 1),"
        f" i -> array_join(slice(_w, i * {W} + 1, {W}), ' '))"
    )
    inst = (
        docs.select("doc_id", words.alias("_w"))
        .filter(F.size("_w") > 0)
        .select("doc_id", F.posexplode(chunks).alias("lidx", "line"))
    )
    firsts = inst.groupBy("line").agg(
        F.min(F.struct("doc_id", "lidx")).alias("m")
    )
    kept = (
        inst.join(firsts, "line")
        .filter(
            (F.col("doc_id") == F.col("m.doc_id"))
            & (F.col("lidx") == F.col("m.lidx"))
        )
        .select("doc_id", "lidx", "line")
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lidx", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = inst.groupBy("doc_id").agg(F.count("*").alias("n_total"))
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("n_total", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def minhash_estimate(
    docs: DataFrame,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Estimator-accuracy table: per LSH candidate pair, the exact shingle
    Jaccard next to the MinHash signature-agreement estimate (matching
    components out of k).

    The table a pipeline operator reads before trusting signature-only
    dedup at a given threshold (E[est/k] = J by min-wise independence; the
    spread at small k is what this measures).  Same shared-shingle plan as
    :func:`verified_pairs` plus two signature joins keyed on doc id; the
    persisted shingle handle is exposed as ``_wqs_persisted`` (caller
    unpersists).
    """
    from pyspark import StorageLevel

    sh = word_shingles(docs, n=shingle_n, text_col=text_col).persist(
        StorageLevel.DISK_ONLY
    )
    pairs = candidate_pairs(
        docs, k=k, bands=bands, shingle_n=shingle_n, text_col=text_col, shingles=sh
    )
    jac = ngram_jaccard(docs, pairs, shingle_n=shingle_n, shingles=sh)
    sig = minhash_signatures(
        docs, k=k, shingle_n=shingle_n, text_col=text_col, shingles=sh
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)]
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)]
    )
    est = None
    for i in range(k):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        est = term if est is None else est + term
    out = (
        jac.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", "jaccard", est.cast("long").alias(f"est_x{k}")
        )
    )
    out._wqs_persisted = sh
    return out


SIMHASH_BITS = 16  # md5-derived, engine-portable (4 hex chars)


def _word_bit(word, j):
    """Bit j (0..15, MSB-first) of the first 16 bits of md5(word).

    Built from strpos/floor/% only so the DuckDB oracle reproduces it
    exactly — no engine-specific hex-to-int casts.
    """
    digit = F.substring(F.md5(word), 1 + j // 4, 1)
    v = F.instr(F.lit("0123456789abcdef"), digit) - 1
    return F.floor(v / (1 << (3 - j % 4))) % 2


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over the distinct-word feature set.

    Classic Charikar sketch: each feature votes ±1 per bit position, the
    fingerprint keeps the sign of the per-bit sum (ties → 0).  One narrow
    explode plus a single per-doc hash aggregate — a linear scan at 100 TB;
    near-dup candidates are fingerprints within small Hamming distance,
    found by banding the 16 bits exactly like LSH.
    """
    words = F.split(F.trim(F.col(text_col)), WS_SPLIT)
    w = (
        docs.select("doc_id", F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    votes = [
        F.sum(_word_bit(F.col("word"), j) * 2 - 1).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = w.groupBy("doc_id").agg(*votes)
    bit_terms = [
        F.when(F.col(f"s{j}") > 0, F.lit(1 << (SIMHASH_BITS - 1 - j))).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    ]
    fingerprint = sum(bit_terms[1:], bit_terms[0])
    return sums.select("doc_id", fingerprint.cast("long").alias("simhash"))


# --- 64-bit SimHash --------------------------------------------------------
#
# The 16-bit `simhash` above saturates (collision flood) once the corpus has
# ≳65k distinct near-dup classes; the 64-bit variant below is the at-scale
# fingerprint.  It is materialized as four 16-bit words (sh0..sh3, MSB-first)
# so both engines stay in signed-64 arithmetic, plus the canonical 16-hex-char
# fingerprint string; the words double as the LSH bands for candidate pairing.

SIMHASH64_WORDS = 4  # 4 × 16 bits


def _hex4_int(h, off: int):
    """Integer value of the 4 hex chars of ``h`` at 1-based offset ``off``.

    strpos-based so the DuckDB oracle reproduces it without engine-specific
    hex casts (same trick as ``_word_bit``)."""
    def v(i):
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, off + i, 1)) - 1

    return ((v(0) * 16 + v(1)) * 16 + v(2)) * 16 + v(3)


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit Charikar SimHash over the distinct-word feature set.

    Per word the first 16 md5 hex chars give four 16-bit hash words
    (one projection, before the aggregate); each of the 64 bits votes ±1 and
    the fingerprint keeps the sign of the per-bit sum (ties → 0).  Still one
    narrow explode + a single per-doc hash aggregate — a linear scan at
    100 TB, with 2^64 fingerprint space instead of 2^16.

    Output: ``doc_id, sh0..sh3`` (16-bit words, MSB-first) and
    ``simhash_hex`` (the 16-char fingerprint).
    """
    words = F.split(F.trim(F.col(text_col)), WS_SPLIT)
    w = (
        docs.select("doc_id", F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    h = F.md5(F.col("word"))
    proj = w.select(
        "doc_id", *[_hex4_int(h, 1 + 4 * i).alias(f"w{i}") for i in range(SIMHASH64_WORDS)]
    )
    votes = [
        F.sum((F.floor(F.col(f"w{i}") / (1 << (15 - j))) % 2) * 2 - 1).alias(f"s{16 * i + j}")
        for i in range(SIMHASH64_WORDS)
        for j in range(16)
    ]
    sums = proj.groupBy("doc_id").agg(*votes)
    word_cols = []
    for i in range(SIMHASH64_WORDS):
        terms = [
            F.when(F.col(f"s{16 * i + j}") > 0, F.lit(1 << (15 - j))).otherwise(F.lit(0))
            for j in range(16)
        ]
        word_cols.append(sum(terms[1:], terms[0]).cast("long").alias(f"sh{i}"))
    out = sums.select("doc_id", *word_cols)
    hex_col = F.concat(
        *[F.lpad(F.lower(F.hex(F.col(f"sh{i}"))), 4, "0") for i in range(SIMHASH64_WORDS)]
    )
    return out.withColumn("simhash_hex", hex_col)


def simhash64_neardup_pairs(docs: DataFrame, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """SimHash near-duplicate pairs via Hamming banding.

    The four 16-bit fingerprint words are the LSH bands: by pigeonhole, any
    pair within Hamming distance 3 shares at least one unchanged band, so
    ``max_hamming<=3`` is *complete* (no missed pairs) while the band join
    keeps candidate generation bounded by band-bucket sizes — never all
    pairs.  Candidates are verified with the exact distance
    (``Σ bit_count(sh_a XOR sh_b)``).
    """
    from pyspark import StorageLevel

    # persist the fingerprint frame: it feeds four plan branches (both band
    # sides, both verify sides) and the 64-vote aggregate would otherwise be
    # recomputed per branch (same sharing rationale as verified_pairs;
    # DISK_ONLY per BENCH.md).  Handle exposed as on verified_pairs.
    sh = (
        simhash64(docs, text_col=text_col)
        .select("doc_id", *[f"sh{i}" for i in range(SIMHASH64_WORDS)])
        .persist(StorageLevel.DISK_ONLY)
    )
    band_structs = [
        F.struct(F.lit(i).alias("band_id"), F.col(f"sh{i}").alias("band_val"))
        for i in range(SIMHASH64_WORDS)
    ]
    bands = sh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band_id", "b.band_val")
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"sh{i}").alias(f"sa{i}") for i in range(SIMHASH64_WORDS)]
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"sh{i}").alias(f"sb{i}") for i in range(SIMHASH64_WORDS)]
    )
    ham_terms = [
        F.bit_count(F.col(f"sa{i}").bitwiseXOR(F.col(f"sb{i}")))
        for i in range(SIMHASH64_WORDS)
    ]
    hamming = sum(ham_terms[1:], ham_terms[0])
    out = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    out._wqs_persisted = sh
    return out


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity on shingle sets for verified candidate pairs."""
    sh = shingles if shingles is not None else word_shingles(docs, n=shingle_n)
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    ab = (
        pairs.join(a, "doc_a").join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        ab.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
    )


# ===========================================================================
# Winnowing (rolling k-gram window-min document fingerprints)
# ===========================================================================
# Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
# Fingerprinting" (SIGMOD 2003) — the MOSS algorithm.  Character k-grams of
# the whitespace-normalized text are hashed; a sliding window of `w`
# consecutive k-gram hashes selects each window's minimum, and the distinct
# selected hashes are the document's fingerprints.  Guarantee: any shared
# substring of length >= w + k - 1 yields at least one shared fingerprint,
# while storage is ~2/(w+1) of the k-gram count.
#
# The reference has no analog (wolf_quake fingerprints nothing); this is one
# of the LLM-training-pipeline operators the target adds on top of the
# reference surface (normalized_fingerprint above is the whole-doc hash;
# winnowing is the substring-robust variant).
#
# Hash choice: md5-hex prefix with LEXICOGRAPHIC window-min, like the
# MinHash family above, so the DuckDB oracle reproduces results exactly.  A
# production 100 TB deployment would swap the per-position md5 for a true
# Karp-Rabin polynomial rolling hash (O(1) per position instead of O(k));
# the plan shape — narrow per-row array ops, one explode, no shuffle until
# the consumer aggregates — is identical, and even with md5 the stage is
# embarrassingly parallel and scan-bound.

WINNOW_K = 8   # k-gram length (chars, after whitespace normalization)
WINNOW_W = 4   # window size in k-grams; guarantee threshold = w + k - 1


def winnow_fingerprints(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fingerprint) — distinct winnowed k-gram hashes per doc.

    Pure Catalyst: normalize -> per-position k-gram md5 array (transform
    over a bound attribute, so the normalized string is computed once per
    row) -> window minima (transform + slice + array_min, O(len * w) string
    compares per row) -> array_distinct -> explode.  No UDF, no shuffle;
    docs shorter than k chars produce no fingerprints, docs with 1..w-1
    k-grams produce exactly one (min of all — the clamped first window).
    """
    # The hashing stage is COMPUTE-bound (one md5 per char position ≈
    # len(text) hashes/row), not byte-bound, so the scan's byte-derived
    # partitioning under-parallelizes it: a single small parquet file of
    # long documents puts all hash work on one core.  Spread narrow inputs
    # across the cluster (the shuffled payload is just the raw text); at
    # real scale the input is already wide and the shuffle is skipped.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), WS_SPLIT, " ")))
    n = docs.select("doc_id", norm.alias("_norm"))
    empty = F.array().cast("array<string>")
    hashes = F.when(
        F.length("_norm") >= k,
        F.transform(
            F.sequence(F.lit(1), F.length("_norm") - (k - 1)),
            lambda i: F.md5(F.col("_norm").substr(i, F.lit(k))).substr(
                F.lit(1), F.lit(8)
            ),
        ),
    ).otherwise(empty)
    h = n.select("doc_id", hashes.alias("_h"))
    n_windows = F.greatest(F.size("_h") - (w - 1), F.lit(1))
    fps = F.when(
        F.size("_h") >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(F.col("_h"), j, w)),
            )
        ),
    ).otherwise(empty)
    return h.select("doc_id", F.explode(fps).alias("fingerprint"))


def winnow_neardup_pairs(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    max_df: int = 50,
    text_col: str = "text",
    observation=None,
) -> DataFrame:
    """(doc_a, doc_b, shared_fps) — doc pairs sharing >= min_shared winnowed
    fingerprints, via a postings-list self-join.

    Scale shape: the join key is the fingerprint, so pair work is bounded by
    sum(df^2) over fingerprint document-frequencies, NOT all-pairs.  The
    ``max_df`` cap drops boilerplate fingerprints (shared headers, templated
    text) whose postings would otherwise explode quadratically — the same
    trick as stopword-shingle removal in MinHash pipelines; at 100 TB the
    cap is what keeps the self-join linear-ish.  Pass ``observation`` (a
    ``pyspark.sql.Observation``) to surface what the cap silently dropped —
    ``fingerprints_total`` / ``fingerprints_dropped`` / ``postings_dropped``
    — computed by the same job (a CollectMetrics node on the frequency
    aggregate, no extra pass).
    """
    fp = winnow_fingerprints(docs, k=k, w=w, text_col=text_col)
    freq = fp.groupBy("fingerprint").agg(F.count("*").alias("_df"))
    out_handle = None
    if observation is not None:
        over = F.col("_df") > max_df
        freq = freq.observe(
            observation,
            F.count(F.lit(1)).alias("fingerprints_total"),
            F.sum(F.when(over, 1).otherwise(0)).alias("fingerprints_dropped"),
            F.sum(F.when(over, F.col("_df")).otherwise(0)).alias("postings_dropped"),
        )
        # dedicated top-level action on the observed frame — see
        # candidate_pairs for why (broadcast-buried / self-join-cloned
        # CollectMetrics never reports); the frequency table is small
        from pyspark import StorageLevel

        freq = freq.persist(StorageLevel.DISK_ONLY)
        freq.count()
        out_handle = freq
    kept = freq.filter(F.col("_df") <= max_df).select("fingerprint")
    pruned = fp.join(kept, "fingerprint")
    a = pruned.alias("a")
    b = pruned.alias("b")
    out = (
        a.join(b, "fingerprint")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    if out_handle is not None:
        out._wqs_persisted = out_handle
    return out


def dedup_components(
    docs: DataFrame,
    threshold: float = 0.5,
    max_iter: int = 20,
    **kw,
) -> DataFrame:
    """Near-duplicate cluster assignment: connected components over the
    verified LSH pair graph, one row per document.

    ``component_id`` is the smallest ``doc_id`` reachable through pairs with
    Jaccard >= ``threshold``; ``is_canonical`` marks the one keeper per
    cluster (the dedup survivor — filtering on it IS the dedup step).

    Algorithm: iterative min-label propagation (the Pregel formulation of
    connected components, cf. GraphX's ``ConnectedComponents``): every doc
    starts labeled with itself; each round every edge forwards its source's
    label to its destination and each doc keeps the minimum.  Rounds needed =
    graph diameter; near-dup clusters are shallow (a handful of variants of
    one page), so this converges in a few rounds.  Convergence is detected
    from the per-round ``SUM(component_id)`` — labels only ever decrease, so
    an unchanged sum is a fixpoint; that is ONE scalar to the driver per
    round, not a data collect.

    100 TB notes: each round is one join (edges ⋈ labels, both sides hash-
    partitioned on the same key) plus one min-groupBy — no all-pairs work;
    label frames are persisted DISK_ONLY and the previous round is released
    eagerly.  For adversarial graphs with long chains, switch to the
    large-star/small-star algorithm (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14), which converges in O(log^2 n) rounds
    independent of diameter; plain propagation is the right default for
    near-dup graphs because their diameter is tiny.  On a real cluster,
    ``labels.localCheckpoint()`` every ~5 rounds truncates the growing
    lineage (no-op needed at the round counts seen here).
    """
    vp = verified_pairs(docs, **kw)
    from wolf_quake_spark.analysis import persisted_handles

    pairs = vp.filter(F.col("jaccard") >= threshold)
    return label_propagate(
        docs.select("doc_id"),
        pairs,
        max_iter=max_iter,
        release_after_edges=persisted_handles(vp),
    )


def dedup_apply(docs: DataFrame, threshold: float = 0.5, **kw) -> DataFrame:
    """Apply the near-dup dedup: one row per surviving (canonical) document
    with the cluster size and the characters the collapse removed.

    This is the step that actually shrinks the corpus: everything
    non-canonical in a component is dropped, and ``chars_removed`` is the
    bytes-saved accounting a curation pipeline reports per keeper.  Scale
    shape: components ⋈ documents is a same-key hash join on doc_id followed
    by one hash aggregate on component_id — two shuffles beyond the
    component computation itself, no driver-side state.
    """
    comp = dedup_components(docs, threshold=threshold, **kw).select(
        "doc_id", "component_id"
    )
    joined = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        joined.groupBy("component_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(
                F.when(F.col("doc_id") == F.col("component_id"), F.lit(0))
                .otherwise(F.col("n_chars"))
            ).alias("chars_removed"),
        )
        .select(
            F.col("component_id").alias("doc_id"), "n_members", "chars_removed"
        )
    )


def label_propagate(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iter: int = 20,
    release_after_edges=None,
) -> DataFrame:
    """Connected-components core: min-label propagation over an undirected
    pair graph (``pairs``: doc_a/doc_b) covering ``nodes`` (doc_id).

    Separated from :func:`dedup_components` so the iteration is testable on
    a hand-built deterministic graph (LSH candidate generation is
    probabilistic in which *low*-similarity pairs it surfaces).  See
    :func:`dedup_components` for semantics and the at-scale discussion.
    """
    from pyspark import StorageLevel

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("doc_id")))
        .persist(StorageLevel.DISK_ONLY)
    )
    edges.count()  # materialize so upstream caches can be released now
    if release_after_edges is not None:
        handles = (
            release_after_edges
            if isinstance(release_after_edges, (list, tuple))
            else [release_after_edges]
        )
        for h in handles:
            h.unpersist()

    labels = nodes.select("doc_id", F.col("doc_id").alias("component_id")).persist(
        StorageLevel.DISK_ONLY
    )
    prev = labels.agg(F.sum("component_id")).collect()[0][0]
    for _round in range(max_iter):
        msgs = edges.join(
            labels.withColumnRenamed("doc_id", "src"), "src"
        ).select("doc_id", "component_id")
        new_labels = labels.union(msgs).groupBy("doc_id").agg(
            F.min("component_id").alias("component_id")
        )
        # every 5th round, truncate lineage instead of just persisting: each
        # round's plan nests the previous one, and a long-diameter graph
        # (hundreds of rounds) otherwise OOMs the driver on plan
        # canonicalization alone — the GraphX-Pregel checkpoint cadence
        if (_round + 1) % 5 == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist(StorageLevel.DISK_ONLY)
        cur = new_labels.agg(F.sum("component_id")).collect()[0][0]
        # real release on persist rounds; a NO-OP on the every-5th
        # localCheckpoint rounds, whose blocks the ContextCleaner reclaims
        # once the reference drops (see label_propagate_star)
        labels.unpersist()
        labels = new_labels
        if cur == prev:
            break
        prev = cur
    edges.unpersist()
    out = labels.withColumn(
        "is_canonical", F.col("component_id") == F.col("doc_id")
    )
    out._wqs_persisted = labels
    return out


def label_propagate_star(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the diameter-robust backend to :func:`label_propagate`.

    Plain min-label propagation needs diameter-many rounds: an adversarial
    chain of D near-dup links takes D joins.  The star operations instead
    rewire the edge set itself toward a union of stars centered on each
    component's minimum node, converging in O(log² n) rounds INDEPENDENT of
    diameter:

    * large-star (per node u): connect every neighbor v > u to
      m = min(N(u) ∪ {u}) — strictly-larger neighbors hop to the local min;
    * small-star (per node u over its ≤-neighbors L): connect u and every
      v ∈ L to m = min(L) — the local star flattens onto its min.

    Both rounds are one groupBy-min plus one same-key join over the current
    edge list — the identical shuffle shape as a plain-propagation round, so
    cost per round matches while round COUNT drops from O(diameter) to
    O(log² n).  Convergence is detected from the canonical edge set's
    (count, order-independent hash-sum) — two scalars to the driver per
    round; at the fixpoint the edges ARE disjoint stars (paper Thm 2), so
    labels read off directly: component_id = star center (self for
    singletons).  Edge frames are persisted DISK_ONLY with eager release,
    exactly like label_propagate's label frames.

    Same output contract as :func:`label_propagate` (doc_id, component_id,
    is_canonical) — property-tested equal on chains, cliques and random
    graphs; the round count is exposed as ``result._wqs_rounds``.
    """
    # localCheckpoint (not persist): each round's edge set feeds the next
    # round through MULTIPLE plan branches (both union directions, the min
    # aggregate, the join), so without truncation the logical plan grows
    # ~4× per round and Catalyst canonicalization OOMs around round 8-10.
    # Eager local checkpointing materializes the round's edges to executor
    # storage AND cuts the lineage to a leaf — the standard iterative-
    # algorithm pattern (same reason GraphX checkpoints Pregel state).
    cur = (
        pairs.select(
            F.least("doc_a", "doc_b").alias("u"), F.greatest("doc_a", "doc_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def sig(edges: DataFrame):
        r = edges.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    prev = sig(cur)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over both edge directions
        b = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            b.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", F.col("u")).alias("m"))
        )
        ls = (
            b.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over hi→lo edges (ls is canonical u<v: hi=v, lo=u);
        # m = min lo-neighbor; emit (m, hi) and (m, lo) for lo != m
        sm = ls.groupBy("v").agg(F.min("u").alias("m"))
        withm = ls.join(sm, "v")
        ss = (
            withm.select(F.col("m").alias("u"), F.col("v").alias("v"))
            .union(
                withm.filter(F.col("u") != F.col("m")).select(
                    F.col("m").alias("u"), F.col("u").alias("v")
                )
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur_sig = sig(ss)
        # NOTE on release: Dataset.unpersist() is a NO-OP for a
        # localCheckpointed frame (the persisted RDD lives outside the
        # CacheManager and isn't reachable from PySpark).  Dropping the
        # reference here is the real release mechanism: Spark's
        # ContextCleaner unpersists GC'd checkpoint RDDs asynchronously —
        # the same deferred-reclaim contract GraphX Pregel runs under.
        # Peak storage is therefore ~2 rounds of edges, not 1.
        cur = ss
        if cur_sig == prev:
            break
        prev = cur_sig

    lab = (
        cur.select(F.col("v").alias("doc_id"), F.col("u").alias("component_id"))
        .groupBy("doc_id")
        .agg(F.min("component_id").alias("component_id"))
    )
    out = (
        nodes.join(lab, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", F.col("doc_id")).alias("component_id"),
        )
        .withColumn("is_canonical", F.col("component_id") == F.col("doc_id"))
    )
    out._wqs_persisted = cur
    out._wqs_rounds = rounds
    return out


def dup_ngram_spans(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """Exact-substring duplication signal (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape):
    for each document, the fraction of its word ``n``-gram start positions
    whose n-gram occurs ≥ 2 times anywhere in the corpus (intra- or
    cross-document).  High ``dup_frac`` docs are the memorization-risk
    candidates that the suffix-array method removes span-wise; the n-gram
    start-position fraction is its hash-join-friendly approximation.

    Docs with fewer than ``n`` tokens emit no n-grams and are absent from
    the output (no denominator).

    100 TB shape: explode is narrow; one doc-keyed window (lead) builds the
    grams in a single shuffle; the gram-keyed duplicate set is a hash agg
    with map-side partials, and the join back is LEFT SEMI against only the
    *duplicated* grams — typically a small fraction of all grams, so the
    join's build side shrinks with corpus cleanliness.  The gram frame is
    persisted DISK_ONLY across its three consumers (dup set, denominator,
    semi join); handle exposed as ``result._wqs_persisted``.
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    raw = F.split(F.col(text_col), " ")
    tok = docs.select(
        "doc_id", F.posexplode(raw).alias("pos", "term")
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", k).over(w) for k in range(1, n)]
    grams = (
        tok.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("gram"),
            F.lead("term", n - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
        .persist(StorageLevel.DISK_ONLY)
    )
    dupg = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    perdoc = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    dupcnt = (
        grams.join(dupg, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("dup_ngrams"))
    )
    out = perdoc.join(dupcnt, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("dup_ngrams"), F.lit(0)).alias("dup_ngrams"),
        F.round(
            F.coalesce(F.col("dup_ngrams"), F.lit(0)).cast("double")
            / F.col("n_grams").cast("double"),
            6,
        ).alias("dup_frac"),
    )
    out._wqs_persisted = grams
    return out


def _dense_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, pos, term) with DENSE 0-based positions after dropping
    empty split artifacts — the position arithmetic of the exact-substring
    family (run grouping, coverage windows) needs gap-free indexes."""
    from pyspark.sql.window import Window

    raw = F.split(F.col(text_col), " ")
    tok = docs.select(
        "doc_id", F.posexplode(raw).alias("_rawpos", "term")
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("_rawpos")
    return tok.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        "term",
    )


def _dup_start_flags(tokens: DataFrame, n: int) -> DataFrame:
    """Start positions of corpus-duplicated ``n``-token windows.

    Returns (doc_id, pos, dup) where dup=1 iff the n-gram starting at
    this dense token position occurs at >= 2 (doc, pos) instances
    anywhere in the corpus (intra- OR cross-document — self-repetition
    duplicates too, the Lee et al. tool's behavior).

    The gram frame has two consumers (the duplicate-set agg and the semi
    join), so it is persisted DISK_ONLY (dup_ngram_spans precedent) and
    the handle rides on the result's ``_wqs_persisted``.

    100 TB shuffle shape (the C4/Lee trick, EXACT here): the corpus-wide
    duplicate agg is keyed on ``xxhash64(gram)`` — an 8-byte shuffle key
    instead of the n-token string — and only the surviving candidate
    subset (grams whose HASH repeats; duplicates plus rare collisions) is
    re-grouped by the full string to confirm.  The string shuffle is thus
    proportional to the corpus's duplication, not its size, and a hash
    collision can only ADD a candidate that the string re-check then
    rejects — never drop one, so exactness is preserved (the brute-force
    parity tests run through this path)."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", k).over(w) for k in range(1, n)]
    grams = (
        tokens.select(
            "doc_id",
            "pos",
            F.concat_ws("\x1f", *parts).alias("gram"),
            F.lead("term", n - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
        .withColumn("_gh", F.xxhash64("gram"))
        .persist(StorageLevel.DISK_ONLY)
    )
    dup_h = (
        grams.groupBy("_gh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("_gh")
    )
    cand = grams.join(dup_h, "_gh", "left_semi")
    dupg = (
        cand.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    out = cand.join(dupg, "gram", "left_semi").select(
        "doc_id", "pos", F.lit(1).alias("dup")
    )
    out._wqs_persisted = grams
    return out


def _covered_tokens(tokens: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos, term, _cov): _cov=1 iff the token lies inside some
    corpus-duplicated substring of length >= n — equivalently, some
    duplicated n-gram START lies in [pos-n+1, pos], a doc-keyed sliding
    MAX of the start flag over the trailing n rows (positions are dense,
    so the ROW window is exact)."""
    from pyspark.sql.window import Window

    flags = _dup_start_flags(tokens, n)
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(n - 1), 0)
    out = tokens.join(flags, ["doc_id", "pos"], "left").select(
        "doc_id",
        "pos",
        "term",
        F.max(F.coalesce("dup", F.lit(0))).over(w).alias("_cov"),
    )
    out._wqs_persisted = flags._wqs_persisted
    return out


def exact_substring_spans(
    docs: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """ExactSubstr removal spans (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" SS4.1, reference tool
    google-research/deduplicate-text-datasets): every MAXIMAL token span
    of length >= ``n`` whose content occurs at >= 2 positions corpus-wide,
    per document — the spans the suffix-array method cuts out.  EVERY
    occurrence is reported (the released tool's self-deduplication
    behavior: a twice-occurring substring loses both copies), which keeps
    the operator deterministic and order-independent with no global
    occurrence ranking.

    Equivalence that makes this a hash-join plan instead of a suffix
    array: a token lies in some duplicated substring of length >= n iff
    it is covered by a duplicated window of length EXACTLY n (any longer
    duplicate contains a duplicated n-window over each of its tokens;
    any duplicated n-window IS a duplicated substring).  So duplicated
    n-gram START positions are computed corpus-wide, and maximal runs of
    consecutive starts [s..e] become removal spans [s, e+n-1].

    The reported spans are the DISJOINT maximal covered intervals (two
    duplicated windows closer than n merge into one removal span — the
    range-merge the reference tool applies before cutting), so
    :func:`exact_substring_clean` drops exactly the tokens these spans
    name.

    Plan: one doc-keyed window builds the n-grams (single shuffle), the
    duplicate set is a gram-keyed hash agg with map-side partials, a LEFT
    SEMI join keeps only duplicated starts (build side shrinks with
    corpus cleanliness), coverage is a doc-keyed sliding MAX over the
    trailing n rows (dense positions make the row window exact), and the
    run grouping is the pos - row_number trick inside the same doc-keyed
    partitioning.  100 TB: key the duplicate agg on ``xxhash64(gram)``
    and verify survivors against the string — the C4/Lee trick;
    candidate volume is corpus gram count, never pairwise.

    Returns (doc_id, span_start, span_end, n_tokens), spans inclusive
    over dense 0-based token positions (empty split artifacts dropped)."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    tokens = _dense_tokens(docs, text_col).persist(StorageLevel.DISK_ONLY)
    covered = _covered_tokens(tokens, n)
    grams_handle = covered._wqs_persisted
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = covered.filter(F.col("_cov") == 1).withColumn(
        "_grp", F.col("pos") - (F.row_number().over(w) - 1)
    )
    out = (
        runs.groupBy("doc_id", "_grp")
        .agg(F.min("pos").alias("span_start"), F.max("pos").alias("span_end"))
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("n_tokens"),
        )
    )
    out._wqs_persisted = [tokens, grams_handle]
    return out


def exact_substring_clean(
    docs: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """The DESTRUCTIVE ExactSubstr cleanup (Lee et al. 2022): drop every
    token covered by any corpus-duplicated substring of length >= ``n``
    and reassemble each document from its surviving tokens in original
    order — the operation RefinedWeb/Dolma actually run on their corpora,
    vs :func:`dup_ngram_spans` which only scores the duplication.

    Coverage without materializing spans: token p is covered iff some
    duplicated n-gram START lies in [p-n+1, p], i.e. a doc-keyed sliding
    MAX of the start flag over the trailing n rows — dense positions make
    the row window exact.  One extra doc-keyed window over the token
    frame; reassembly is the ``line_dedup`` collect_list/array_sort
    pattern, LEFT-joined so fully-erased docs survive with empty text.

    Returns (doc_id, clean_text, n_kept, n_dropped)."""
    from pyspark import StorageLevel

    tokens = _dense_tokens(docs, text_col).persist(StorageLevel.DISK_ONLY)
    covered = _covered_tokens(tokens, n)
    kept = covered.filter(F.col("_cov") == 0)
    per_doc = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = tokens.groupBy("doc_id").agg(F.count("*").alias("n_total"))
    out = (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("n_total", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )
    out._wqs_persisted = [tokens, covered._wqs_persisted]
    return out
