"""Text analysis for training-data pipelines: token counting, quality
scoring, stopword/language heuristics — all built from exact, engine-portable
primitives (length/replace arithmetic, no regex-engine-specific behavior) so
every metric has a DuckDB oracle.  Everything is a narrow projection +
hash-aggregate: linear scans at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis import WS_SPLIT

STOPWORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "y"],
    "fr": ["le", "et", "les"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (empty text → 0)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS_SPLIT)))


# GPT-2-ish pre-tokenizer, reduced to constructs whose semantics agree
# between Java regex (Spark) and RE2 (DuckDB): letter runs, digit runs,
# single punctuation marks.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenization count (regex word/number/punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)).cast("long")


def occurrence_count(text: Column, word: str) -> Column:
    """Exact count of ' word ' occurrences via length arithmetic (portable)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def stopword_scores(text: Column) -> dict[str, Column]:
    out = {}
    for lang, words in STOPWORDS.items():
        cols = [occurrence_count(text, w) for w in words]
        out[lang] = sum(cols[1:], cols[0])
    return out


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hit counts, deterministic tie order
    (en > de > es > fr), 'und' (undetermined) when all scores are zero."""
    scores = stopword_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def substring_count(text: Column, needle: str) -> Column:
    """Count of non-overlapping ``needle`` occurrences via length/replace
    arithmetic — exact and portable (both engines scan left-to-right)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


# Character-trigram profiles per language: function-word fragments that can
# occur mid-token, the classic char-n-gram LID signal (vs whole-word
# stopword hits in ``lang_id``).  Kept tiny and literal so both engines
# evaluate the identical expression tree.
NGRAM_PROFILES = {
    "en": ["the", " an", "of "],
    "de": ["der", "und", "ie "],
    "es": ["el ", "los", " y "],
    "fr": ["le ", " et", "les"],
}


def ngram_scores(text: Column) -> dict[str, Column]:
    out = {}
    for lang, grams in NGRAM_PROFILES.items():
        cols = [substring_count(text, g) for g in grams]
        out[lang] = sum(cols[1:], cols[0])
    return out


def lang_id_ngram(text: Column) -> Column:
    """Argmax of per-language char-trigram profile hit counts; deterministic
    tie order (en > de > es > fr), 'und' when every score is zero.  A narrow
    all-JVM projection (length/replace only) — linear scan at any scale."""
    scores = ngram_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(NGRAM_PROFILES)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def term_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(doc, term) counts — the inverted-index building block.

    Tokenization is a plain single-space split (the portable lowest common
    denominator between Spark ``split`` and DuckDB ``string_split``); empty
    tokens from leading/trailing/double spaces are dropped.  Shape at scale:
    one explode (narrow) + one hash aggregate with map-side partials keyed
    on (doc_id, term) — the classic first stage of distributed indexing.
    """
    t = F.col(text_col)
    tok = docs.select(
        "doc_id", F.explode(F.split(t, " ")).alias("term")
    ).filter(F.col("term") != "")
    return tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """TF-IDF with an inverted-index plan: tf per (doc, term), document
    frequency per term, idf = ln(N / df), top-``k`` terms per doc.

    Determinism across engines: the per-doc ranking orders by the INTEGER
    keys (tf DESC, df ASC, term ASC) — never by the floating tfidf value,
    whose last-ulp could differ between libm implementations and flip ties.
    The tfidf value itself is quantized to 6 decimals because ``ln`` is NOT
    correctly rounded everywhere (Java ``Math.log`` vs C libm disagree by
    1 ulp on real inputs — observed at sf0.01); after rounding, a 1-ulp
    input discrepancy flips the output only when the true value sits within
    1 ulp of a .5e-6 boundary (~1e-10 per value), so the bit-exact value
    hash agrees.

    Scale shape: explode → (doc_id, term) hash agg → term-keyed df agg →
    tf ⋈ df on term (df side is |vocab| rows — AQE broadcasts it when small)
    → one doc_id-partitioned window for the top-k.  All exchanges are on
    high-cardinality keys; nothing is driver-side (N comes from a broadcast
    one-row aggregate, not ``.count()``).
    """
    tf = term_frequencies(docs, text_col)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
            "rank",
        )
    )


def unigram_logprob_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean negative log-likelihood under the corpus's own unigram
    LM — the perplexity-filtering quality signal (CCNet-style; a KenLM
    n-gram scorer has the identical plan shape, with the model table joined
    on the n-gram instead of the token).

    No smoothing is needed: docs are scored under the LM trained on the
    same corpus, so every token has count ≥ 1.  The nll is quantized to
    6 decimals: each ``ln`` carries ≤1 ulp of libm disagreement and the
    per-doc sum is reassociated differently per engine/partitioning, but
    the accumulated error (~1e-14 relative) is 7 orders below the quantum.

    Scale shape: one (doc, term) hash agg → one term-keyed corpus agg →
    tf ⋈ model on term (vocab-sized model side; the 100 TB classic) → one
    doc-keyed agg.  Total corpus size reaches rows via a broadcast one-row
    aggregate, never ``.count()`` on the driver.
    """
    tf = term_frequencies(docs, text_col)
    model = tf.groupBy("term").agg(F.sum("tf").alias("cw"))
    total = model.agg(F.sum("cw").alias("corpus_tokens"))
    scored = tf.join(model, "term").crossJoin(F.broadcast(total))
    ll = F.sum(
        F.col("tf").cast("double")
        * F.log(F.col("cw").cast("double") / F.col("corpus_tokens").cast("double"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"), ll.alias("_ll"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(-F.col("_ll") / F.col("n_tokens").cast("double"), 6).alias(
                "mean_nll"
            ),
        )
    )


def _doc_bigram_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """Per-doc adjacent-pair frequencies over the empty-filtered token
    sequence: (doc_id, w1, w2, bf).  Shared by the exact-conditional and
    Kneser-Ney bigram scorers so their token/bigram definition can't
    drift."""
    t = F.col(text_col)
    toks = F.filter(F.split(t, " "), lambda x: x != "")
    n_bg = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_bg),
        F.slice(toks, 2, n_bg),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("bf"))
    )


def bigram_logprob_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean negative log-likelihood under the corpus's own bigram
    LM — the order-2 step up from :func:`unigram_logprob_scores`, with the
    same KenLM-shaped plan (model join keyed on the n-gram).

    Conditional probability P(w2|w1) = c(w1,w2) / c(w1,·) where the context
    count is the sum of bigram counts sharing w1, so probabilities per
    context sum to 1.  Scored on the training corpus itself every observed
    bigram has count ≥ 1 — no smoothing needed.  Bigrams are adjacent pairs
    of the empty-filtered token sequence; docs with < 2 tokens have no
    bigrams and are absent.  Quantized to 6 decimals for the same 1-ulp
    libm-vs-Java-Math.log reason as the unigram scorer.

    Scale shape: one (doc, w1, w2) hash agg → bigram-keyed model agg →
    w1-keyed context agg → two shuffled joins (bigram key, then w1) → one
    doc-keyed agg.  The model side is distinct-corpus-bigrams-sized; at
    100 TB both join sides hash-partition on their key (no broadcast
    assumption), and AQE handles stop-word-context skew on the w1 join.
    """
    bf = _doc_bigram_freqs(docs, text_col)
    model = bf.groupBy("w1", "w2").agg(F.sum("bf").alias("c12"))
    ctx = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scored = bf.join(model, ["w1", "w2"]).join(ctx, "w1")
    ll = F.sum(
        F.col("bf").cast("double")
        * F.log(F.col("c12").cast("double") / F.col("c1").cast("double"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("bf").alias("n_bigrams"), ll.alias("_ll"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(-F.col("_ll") / F.col("n_bigrams").cast("double"), 6).alias(
                "mean_nll"
            ),
        )
    )


def kneser_ney_bigram_scores(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """Per-doc mean NLL under an interpolated Kneser-Ney bigram LM — the
    smoothing actually used by KenLM (Heafield 2011), where the backoff
    mass goes to CONTINUATION probability (how many distinct contexts a
    word follows) rather than raw frequency:

        P_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
                      + (D·N1+(w1·)/c(w1·)) · N1+(·w2)/|bigram types|

    with fixed discount D (Chen & Goodman 1999's D = 0.75).  Unlike the
    exact-conditional scorer this generalizes: high-frequency-but-
    single-context tokens (e.g. "Francisco") get LOW continuation mass,
    which is the signal CCNet-style perplexity filters rely on.  All four
    count statistics are exact integers; the probability is a fixed IEEE
    expression over them evaluated with the same structure in both
    engines, and the per-doc mean is quantized to 6 decimals (libm-vs-Java
    log ulps, reassociation — same argument as the sibling scorers).

    Scale shape: one (doc, w1, w2) hash agg → bigram-keyed model agg →
    two aggregate-sized follow-ups (context agg on w1 with c(w1·) AND the
    distinct-follower count in ONE pass; continuation agg on w2) → joins
    keyed on (w1,w2), w1, w2 — all model-sized, hash-partitioned, no
    broadcast assumption — plus a 1-row type-count broadcast → one
    doc-keyed agg.  AQE absorbs stop-word-context skew on the w1/w2 joins.
    """
    d = float(discount)
    bf = _doc_bigram_freqs(docs, text_col)
    model = bf.groupBy("w1", "w2").agg(F.sum("bf").alias("c12"))
    ctx = model.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    cont = model.groupBy("w2").agg(F.count("*").alias("n1p"))
    types = model.agg(F.count("*").alias("n_types"))
    p = (
        F.greatest(F.col("c12").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c1").cast("double")
    ) + (
        F.lit(d)
        * F.col("n1f").cast("double")
        / F.col("c1").cast("double")
    ) * (F.col("n1p").cast("double") / F.col("n_types").cast("double"))
    scored = (
        bf.join(model, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
    )
    ll = F.sum(F.col("bf").cast("double") * F.log(p))
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("bf").alias("n_bigrams"), ll.alias("_ll"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(-F.col("_ll") / F.col("n_bigrams").cast("double"), 6).alias(
                "mean_nll_kn"
            ),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed term set — the
    retrieval scorer a curation pipeline uses to mine domain-relevant docs
    from a web corpus (e.g. "find everything that smells like math"), and
    the lexical half of hybrid (BM25 + embedding) search.

    Standard Robertson/Lucene formulation, always-positive idf:
    ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``,
    ``score = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``.
    Docs matching no query term are absent (their score is 0).

    Scale shape: the (doc, term) frequency agg is filtered to the query
    terms BEFORE any join (predicate on the hash-agg output, a few rows per
    doc), df and N/avgdl are one tiny agg each joined back broadcast, and
    the final score is one doc-keyed agg.  Rounded to 6 decimals for the
    usual cross-engine libm/reassociation ulps.
    """
    tf = term_frequencies(docs, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # N over the docs frame (not tf — token-less docs still count) and the
    # mean doc length, as one-row broadcast aggregates
    stats = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    qt = tf.filter(F.col("term").isin(list(query_terms)))
    df_ = qt.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        1.0
        + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
    )
    part = idf * (
        F.col("tf").cast("double")
        * (k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    return (
        qt.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(part), 6).alias("bm25"),
            F.count("*").alias("n_matched_terms"),
        )
    )


def cm_bucket(item: Column, j: int, width: int) -> Column:
    """Count-Min row hash: 16-bit salted-md5 nibble fold into [0, width).

    The ONE definition shared by the batch sketch below and the streaming
    per-window sketch (streaming/countmin.py) — their parity guarantee is
    this function, not two copies kept in sync by hand.  strpos arithmetic
    so the DuckDB oracle reproduces it (cf. dedup._hex4_int)."""
    h = F.md5(F.concat(F.lit(f"cm{j}"), item))

    def nib(i: int) -> Column:
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1

    return ((((nib(0) * 16 + nib(1)) * 16 + nib(2)) * 16 + nib(3)) % width).cast(
        "int"
    )


def countmin_term_counts(
    docs: DataFrame,
    width: int = 256,
    depth: int = 4,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min sketch term-frequency estimates vs exact counts — the
    heavy-hitters telemetry sketch (Cormode & Muthukrishnan '05) with its
    accuracy audited in the same job.

    Unlike HLL/t-digest (``sketch_profile``, rows-only by necessity), a CM
    sketch with DETERMINISTIC salted-md5 row hashes is exactly reproducible
    in SQL, so this one is fully oracle-paired: build the ``depth×width``
    counter table, estimate each term as min over its ``depth`` cells, and
    report the top-``k`` exact terms with exact count, estimate, and
    overestimate.  CM never underestimates (every cell ≥ the term's true
    count) — ``overestimate ≥ 0`` is property-tested for EVERY term, and
    collisions in 256-wide rows make it strictly positive for some, which
    is the error the table quantifies.

    Scale shape: the sketch is ~constant state (depth·width cells) built by
    one hash agg over the term model — mergeable map-side like any partial
    sum, the 100 TB answer when the exact term model itself is the thing
    you can no longer afford to keep.
    """
    model = term_frequencies(docs, text_col).groupBy("term").agg(
        F.sum("tf").alias("cnt")
    )
    hashed = model.select(
        "term",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cm_bucket(F.col("term"), j, width).alias("b"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("s"),
    ).select("term", "cnt", "s.j", "s.b")
    cm = hashed.groupBy("j", "b").agg(F.sum("cnt").alias("cell"))
    top = model.orderBy(F.desc("cnt"), F.asc("term")).limit(k)
    est = (
        top.join(hashed.select("term", "j", "b"), "term")
        .join(cm, ["j", "b"])
        .groupBy("term", "cnt")
        .agg(F.min("cell").alias("est"))
    )
    return est.select(
        "term",
        F.col("cnt").alias("exact_count"),
        F.col("est").alias("cm_estimate"),
        (F.col("est") - F.col("cnt")).alias("overestimate"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document: distinct-token
    ratio, most-frequent token (and its share), most-frequent bigram (and
    its share).  High top-token / top-bigram shares and low distinct ratios
    flag boilerplate and degenerate repetition for training-data filtering.

    Argmax without a second shuffle: ``min(struct(-tf, term))`` inside the
    per-doc hash aggregate picks highest-tf with lexicographically-smallest
    tiebreak — integer-exact, so it matches the oracle's window formulation
    row-for-row.  Bigrams come from ``zip_with(slice, slice)`` (empty-safe
    for 1-token docs, unlike ``sequence`` whose descending-default bites at
    size-1).  Two hash aggs + one doc_id join; everything else is narrow.
    """
    t = F.col(text_col)
    toks = F.filter(F.split(t, " "), lambda x: x != "")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    tok_agg = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_distinct_tokens"),
        F.min(F.struct((-F.col("tf")).alias("neg"), F.col("term"))).alias("top"),
    )
    bf = (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("bf"))
    )
    bg_agg = bf.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("bf")).alias("neg"), F.col("bigram"))).alias("topb"),
    )
    return (
        tok_agg.join(bg_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            F.col("top.term").alias("top_token"),
            (-F.col("top.neg")).alias("top_token_tf"),
            F.col("topb.bigram").alias("top_bigram"),
            (-F.col("topb.neg")).alias("top_bigram_tf"),
            (
                (F.col("n_tokens") - F.col("n_distinct_tokens")).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_token_frac"),
        )
    )


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc integer-exact quality features + a composite score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_spaces = n_chars - F.length(F.replace(t, F.lit(" "), F.lit("")))
    mean_tok_len_x100 = F.when(
        n_tokens > 0, F.floor((n_chars - n_spaces) * 100 / n_tokens)
    ).otherwise(F.lit(0))
    en_stop = stopword_scores(t)["en"]
    stop_ratio_x1000 = F.when(n_tokens > 0, F.floor(en_stop * 1000 / n_tokens)).otherwise(
        F.lit(0)
    )
    # simple composite: long enough, words not too long/short, some stopwords
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(1)).otherwise(F.lit(0))
        + F.when((mean_tok_len_x100 >= 200) & (mean_tok_len_x100 <= 1200), F.lit(1)).otherwise(F.lit(0))
        + F.when(stop_ratio_x1000 > 0, F.lit(1)).otherwise(F.lit(0))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len_x100.alias("mean_tok_len_x100"),
        stop_ratio_x1000.alias("stop_ratio_x1000"),
        score.cast("long").alias("quality_score"),
    )


def pmi_collocations(
    docs: DataFrame,
    top_k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over corpus
    bigrams (Church & Hanks 1990): PMI(w1,w2) = log2(p(w1,w2) /
    (p(w1·)·p(·w2))) with all probabilities from EXACT corpus bigram
    counts, ``min_count`` suppressing the low-frequency PMI explosion.

    Reuses :func:`_doc_bigram_freqs` so the token/bigram definition cannot
    drift from the LM scorers.  The emitted PMI is one log2 over a ratio
    of exact BIGINTs (c12·B / (c1·c2) composed in double in the same
    operand order both engines), rounded to 6 — and the top-k order is
    (pmi desc, w1, w2), a total order, so the cut is deterministic.

    Scale shape (100 TB): three hash aggregates (bigram, left-margin,
    right-margin) + broadcast of the two margin frames' join — margins are
    vocabulary-sized, the bigram model is the big frame and is touched
    once; top-k is TakeOrderedAndProject (a heap, not a sort).
    """
    from pyspark.storagelevel import StorageLevel

    bf = _doc_bigram_freqs(docs, text_col)
    # Four consumers (margins, total, scored rows) — persist the bigram
    # model so the corpus-wide explode+agg runs once.
    m = (
        bf.groupBy("w1", "w2")
        .agg(F.sum("bf").alias("c12"))
        .persist(StorageLevel.DISK_ONLY)
    )
    left = m.groupBy("w1").agg(F.sum("c12").alias("c1"))
    right = m.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = m.agg(F.sum("c12").alias("btot"))
    pmi = F.round(
        F.log2(
            (F.col("c12").cast("double") * F.col("btot"))
            / (F.col("c1").cast("double") * F.col("c2"))
        ),
        6,
    )
    out = (
        m.filter(F.col("c12") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", "c1", "c2", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )
    out._wqs_persisted = m
    return out


def pmi_collocations_sql(
    table: str = "documents", top_k: int = 20, min_count: int = 5
) -> str:
    """DuckDB mirror of :func:`pmi_collocations` — same bigram
    definition as the LM oracles, same exact counts, same PMI operand
    order and rounding, same total-order cut."""
    return f"""
    WITH tw AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM {table}),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM tw, UNNEST(range(1, greatest(len(w), 1))) AS t(i)),
    m AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
          FROM bg GROUP BY w1, w2),
    l AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM m GROUP BY w1),
    r AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM m GROUP BY w2),
    tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS btot FROM m)
    SELECT w1, w2, c12, c1, c2,
           round(log2((CAST(c12 AS DOUBLE) * btot)
                      / (CAST(c1 AS DOUBLE) * c2)), 6) AS pmi
    FROM m JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
    WHERE c12 >= {min_count}
    ORDER BY pmi DESC, w1, w2
    LIMIT {top_k}
    """


def term_burstiness(
    docs: DataFrame, top_k: int = 20, min_df: int = 10, text_col: str = "text"
) -> DataFrame:
    """Top-k burstiest terms by variance-to-mean ratio of per-doc counts
    (Church & Gale 1995): content words clump (VMR ≫ 1), function words
    spread Poisson-like (VMR ≈ 1) — the dispersion signal for stopword
    discovery and topicality scoring.

    Zero-count docs are included analytically, never materialized:
    with N docs and exact integer Σtf, Σtf² over docs containing the term,
    mean = Σtf/N and E[x²] = Σtf²/N already account for the zeros, so
    VMR = (E[x²] − mean²)/mean needs only the term's posting rows.  One
    explode + two hash aggregates + a 1-row broadcast; top-k is a heap
    with the (vmr desc, term) total order.  Every emitted stat is a
    closed-form float over exact BIGINTs, rounded to 6.
    """
    tf = term_frequencies(docs, text_col)
    n_docs = docs.agg(F.count("*").alias("nd"))
    per_term = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("s1"),
        F.sum(F.col("tf") * F.col("tf")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("nd")
    ex2 = F.col("s2").cast("double") / F.col("nd")
    vmr = (ex2 - mean * mean) / mean
    return (
        per_term.filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            F.col("s1").alias("total_tf"),
            F.round(mean, 6).alias("mean_tf"),
            F.round(vmr, 6).alias("vmr"),
        )
        .orderBy(F.col("vmr").desc(), "term")
        .limit(top_k)
    )


def term_burstiness_sql(
    table: str = "documents", top_k: int = 20, min_df: int = 10
) -> str:
    """DuckDB mirror of :func:`term_burstiness` — same tokenization as
    term_frequencies, same exact sums, same closed forms and rounding."""
    return f"""
    WITH tok AS (
      SELECT doc_id, t AS term
      FROM {table}, UNNEST(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM {table}),
    pt AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS s1,
             CAST(SUM(tf * tf) AS BIGINT) AS s2
      FROM tf GROUP BY term
    )
    SELECT term, df, s1 AS total_tf,
           round(CAST(s1 AS DOUBLE) / nd, 6) AS mean_tf,
           round((CAST(s2 AS DOUBLE) / nd
                  - (CAST(s1 AS DOUBLE) / nd) * (CAST(s1 AS DOUBLE) / nd))
                 / (CAST(s1 AS DOUBLE) / nd), 6) AS vmr
    FROM pt CROSS JOIN nd
    WHERE df >= {min_df}
    ORDER BY vmr DESC, term
    LIMIT {top_k}
    """


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    compressibility quality signal: natural prose sits ~4 bits/char,
    low-entropy docs are repetitive boilerplate/padding, very-high-entropy
    docs are base64/binary junk.  Standard pre-training filter axis
    alongside :func:`quality_metrics` (beyond-reference; the reference's
    only text-quality gate is its timestamp sanity check,
    reference/src/quake3_parser/parser.rs:171-174).

    Entropy is computed from EXACT integer character counts via the
    cancellation-free form ``H = log2(n) − (Σ c·log2 c)/n``: one explode of
    (doc_id, position) → substr(text, i, 1) → hash aggregate on
    (doc_id, ch) → per-doc aggregate.  The per-char explode is the honest
    linear scan (same shape as tokenize); map-side partial aggregation
    collapses it to ≤ alphabet-size rows per doc before any shuffle.  At
    100 TB an Arrow ``mapInPandas`` kernel computing per-doc counts inside
    one batch pass is the constant-factor upgrade; the plan shape (narrow →
    two keyed aggs) is already the scalable one.

    Cross-engine determinism: counts are exact BIGINTs; each ``log2``
    carries ≤1 ulp libm disagreement and the per-doc sum reassociates, so
    the result is rounded to 6 decimals — 7+ orders above the drift (the
    repo-wide float convention, cf. unigram_logprob_scores).  Empty docs
    are excluded in BOTH engines (no chars → entropy undefined).
    """
    t = F.col(text_col)
    pos = docs.filter(F.length(t) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length(t))).alias("i"),
        t.alias("_t"),
    )
    cc = (
        pos.select("doc_id", F.substring(F.col("_t"), F.col("i"), F.lit(1)).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c")
    slog = F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double")))
    return (
        cc.groupBy("doc_id")
        .agg(
            n.alias("n_chars_counted"),
            F.count("*").alias("n_distinct_chars"),
            slog.alias("_slog"),
        )
        .select(
            "doc_id",
            "n_chars_counted",
            "n_distinct_chars",
            F.round(
                F.log2(F.col("n_chars_counted").cast("double"))
                - F.col("_slog") / F.col("n_chars_counted").cast("double"),
                6,
            ).alias("entropy_bits"),
        )
    )


def char_entropy_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`char_entropy` — same substr(text, i, 1)
    character definition, exact counts, same closed form and rounding."""
    return f"""
    WITH pos AS (
      SELECT doc_id, text, CAST(u.i AS INTEGER) AS i
      FROM {table}, UNNEST(range(1, length(text) + 1)) AS u(i)
      WHERE length(text) > 0
    ),
    cc AS (
      SELECT doc_id, substr(text, i, 1) AS ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM pos GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_chars_counted,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           round(log2(CAST(SUM(c) AS DOUBLE))
                 - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                   / CAST(SUM(c) AS DOUBLE), 6) AS entropy_bits
    FROM cc GROUP BY doc_id
    ORDER BY doc_id
    """


def vocab_growth_heaps(
    docs: DataFrame, text_col: str = "text", n_checkpoints: int = 10
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve + power-law fit V(T) ≈ K·T^β —
    the corpus-health gauge that tells a data pipeline whether new
    documents still contribute vocabulary (β near the 0.4–0.6 prose band)
    or the crawl has saturated/degenerated (β → 0: duplication; β → 1:
    junk-token explosion).  Beyond-reference corpus analysis.

    Plan (all stages linear, no single-partition window over data):

    1. global doc rank by ``doc_id`` via the distributed two-stage
       enumeration (sampling.global_enumerate);
    2. tokenize (term_frequencies' split-on-space definition) →
       per-doc token counts AND per-term first-occurrence rank
       ``min(rnk)`` — two hash aggregates off one explode;
    3. ``n_checkpoints`` prefix checkpoints n_j = ceil(j·N/J) from a
       broadcast one-row max-rank aggregate (never a driver count);
       cumulative tokens / vocabulary at each checkpoint via a ≤J-row
       broadcast inequality join against the DOC-level and TERM-level
       aggregates (≪ corpus rows — the explode never re-runs);
    4. the log-log OLS fit (β, K) over the ≤J curve points is a one-row
       closed form joined back onto the curve.

    Cross-engine determinism: ranks/counts are exact BIGINTs; ln/exp enter
    only in the J-point fit, rounded to 6 decimals (repo float
    convention).  Checkpoints with zero tokens or vocabulary are kept in
    the curve but excluded from the fit in BOTH engines.

    Returns J rows: (ckpt, n_docs, n_tokens, vocab, beta, heaps_k); the
    persisted enumeration frame rides ``_wqs_persisted``.
    """
    from wolf_quake_spark.analysis.sampling import global_enumerate

    ranked = global_enumerate(
        docs.select("doc_id", F.col(text_col).alias("_t")),
        [F.col("doc_id")],
        out_col="rnk",
    )
    handle = ranked._wqs_persisted
    tok = ranked.select(
        "rnk", F.explode(F.split(F.col("_t"), " ")).alias("term")
    ).filter(F.col("term") != "")
    dt = tok.groupBy("rnk").agg(F.count("*").alias("nt"))
    fr = tok.groupBy("term").agg(F.min("rnk").alias("fr"))
    nrow = ranked.agg(F.max("rnk").alias("n"))
    spark = docs.sparkSession
    ck = (
        spark.range(1, n_checkpoints + 1)
        .select(F.col("id").cast("int").alias("ckpt"))
        .crossJoin(F.broadcast(nrow))
        .select(
            "ckpt",
            F.ceil(F.col("ckpt") * F.col("n") / F.lit(float(n_checkpoints)))
            .cast("long")
            .alias("n_docs"),
        )
    )
    tj = (
        dt.join(F.broadcast(ck), dt["rnk"] <= ck["n_docs"])
        .groupBy("ckpt")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    vj = (
        fr.join(F.broadcast(ck), fr["fr"] <= ck["n_docs"])
        .groupBy("ckpt")
        .agg(F.count("*").alias("vocab"))
    )
    # anchor on ck (always exactly J rows) and LEFT-join the aggregates —
    # a checkpoint whose doc prefix has zero tokens must stay in the curve
    # (zero-filled), per the contract above; all sides are ≤ n_checkpoints
    # rows, so broadcast — never sort-merge a 10-row join
    curve = (
        ck.join(F.broadcast(tj), "ckpt", "left")
        .join(F.broadcast(vj), "ckpt", "left")
        .select(
            "ckpt",
            "n_docs",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("vocab"), F.lit(0)).alias("vocab"),
        )
    )
    pts = curve.filter((F.col("n_tokens") > 0) & (F.col("vocab") > 0)).select(
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("vocab").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count("*").cast("double").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m"))
        ).alias("_beta"),
        "sx",
        "sy",
        "m",
    )
    # + 0.0 normalizes IEEE negative zero: on a vocabulary-saturated corpus
    # the true beta is exactly 0 and sum-order jitter rounds to ±0.0, which
    # "%.10g"-style value hashing renders as "0" vs "-0" (a real cross-engine
    # flake caught at sf0.01); adding +0.0 is exact for every other value
    fit = fit.select(
        (F.round(F.col("_beta"), 6) + 0.0).alias("beta"),
        (
            F.round(
                F.exp(
                    F.col("sy") / F.col("m") - F.col("_beta") * F.col("sx") / F.col("m")
                ),
                6,
            )
            + 0.0
        ).alias("heaps_k"),
    )
    out = curve.crossJoin(F.broadcast(fit)).select(
        "ckpt", "n_docs", "n_tokens", "vocab", "beta", "heaps_k"
    )
    out._wqs_persisted = handle
    return out


def vocab_growth_heaps_sql(table: str = "documents", n_checkpoints: int = 10) -> str:
    """DuckDB mirror of :func:`vocab_growth_heaps` — same rank/tokenize/
    checkpoint definitions, same log-log OLS closed form and rounding."""
    return f"""
    WITH ranked AS (
      SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS rnk
      FROM {table}
    ),
    tok AS (
      SELECT rnk, t AS term
      FROM ranked, UNNEST(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    dt AS (SELECT rnk, CAST(COUNT(*) AS BIGINT) AS nt FROM tok GROUP BY rnk),
    fr AS (SELECT term, MIN(rnk) AS fr FROM tok GROUP BY term),
    nrow AS (SELECT MAX(rnk) AS n FROM ranked),
    ck AS (
      SELECT CAST(u.j AS INTEGER) AS ckpt,
             CAST(ceil(u.j * n / {float(n_checkpoints)}) AS BIGINT) AS n_docs
      FROM UNNEST(range(1, {n_checkpoints} + 1)) AS u(j), nrow
    ),
    tj AS (
      SELECT ckpt, CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM dt JOIN ck ON dt.rnk <= ck.n_docs GROUP BY ckpt
    ),
    vj AS (
      SELECT ckpt, CAST(COUNT(*) AS BIGINT) AS vocab
      FROM fr JOIN ck ON fr.fr <= ck.n_docs GROUP BY ckpt
    ),
    curve AS (
      -- anchor on ck so zero-token checkpoints stay in the curve
      SELECT ck.ckpt, ck.n_docs,
             COALESCE(tj.n_tokens, 0) AS n_tokens,
             COALESCE(vj.vocab, 0) AS vocab
      FROM ck LEFT JOIN tj ON ck.ckpt = tj.ckpt
              LEFT JOIN vj ON ck.ckpt = vj.ckpt
    ),
    pts AS (
      SELECT ln(CAST(n_tokens AS DOUBLE)) AS x, ln(CAST(vocab AS DOUBLE)) AS y
      FROM curve WHERE n_tokens > 0 AND vocab > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts
    ),
    fit AS (
      -- + 0.0 normalizes negative zero (see the Spark side)
      SELECT round((sxy - sx * sy / m) / (sxx - sx * sx / m), 6) + 0.0 AS beta,
             round(exp(sy / m - ((sxy - sx * sy / m) / (sxx - sx * sx / m))
                               * sx / m), 6) + 0.0 AS heaps_k
      FROM agg
    )
    SELECT ckpt, n_docs, n_tokens, vocab, beta, heaps_k
    FROM curve CROSS JOIN fit
    ORDER BY ckpt
    """


def zipf_rank_frequency(
    docs: DataFrame, text_col: str = "text", fit_n: int = 100, top_k: int = 20
) -> DataFrame:
    """Zipf rank-frequency fit f(r) ≈ C·r^(−s) over the corpus's top
    ``fit_n`` terms — the companion gauge to :func:`vocab_growth_heaps`:
    natural language sits near s ≈ 1; s ≫ 1 means a few tokens dominate
    (template spam), s ≈ 0 means a flat, unnatural distribution
    (beyond-reference corpus analysis).

    Plan shape: the term-frequency table (vocab-sized, ≪ corpus) is built
    with one explode + hash agg; the top ``fit_n`` terms come off it via a
    distributed TakeOrderedAndProject (freq desc, term asc tiebreak).  The
    ONLY full-frame window (rank enumeration) runs over that ``fit_n``-row
    post-limit frame — bounded by a literal, never by data size, the same
    boundedness class as the Lloyd loop's k-row collects.  The log-log OLS
    fit over the ``fit_n`` points is a one-row closed form broadcast back
    onto the top-``top_k`` rows.

    Cross-engine determinism: ranks/frequencies are exact BIGINTs; ln
    enters only the fit, rounded to 6 decimals (repo float convention).
    Returns ``top_k`` rows: (rank, term, freq, zipf_s, zipf_c).
    """
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    freqs = tok.groupBy("term").agg(F.count("*").alias("freq"))
    top = freqs.orderBy(F.desc("freq"), F.asc("term")).limit(fit_n)
    ranked = top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), F.asc("term")))
        .cast("long"),
    )
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    fit = (
        pts.agg(
            F.count("*").cast("double").alias("m"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            (
                (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m"))
                / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m"))
            ).alias("_slope"),
            "sx",
            "sy",
            "m",
        )
        .select(
            F.round(-F.col("_slope"), 6).alias("zipf_s"),
            F.round(
                F.exp(
                    F.col("sy") / F.col("m")
                    - F.col("_slope") * F.col("sx") / F.col("m")
                ),
                6,
            ).alias("zipf_c"),
        )
    )
    return (
        ranked.filter(F.col("rank") <= top_k)
        .crossJoin(F.broadcast(fit))
        .select("rank", "term", "freq", "zipf_s", "zipf_c")
    )


def zipf_rank_frequency_sql(
    table: str = "documents", fit_n: int = 100, top_k: int = 20
) -> str:
    """DuckDB mirror of :func:`zipf_rank_frequency` — same tokenization,
    rank tiebreak, OLS closed form and rounding."""
    return f"""
    WITH tok AS (
      SELECT doc_id, t AS term
      FROM {table}, UNNEST(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    freqs AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY term
    ),
    ranked AS (
      SELECT term, freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rank
      FROM freqs
      ORDER BY freq DESC, term
      LIMIT {fit_n}
    ),
    pts AS (
      SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
      FROM ranked
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts
    ),
    fit AS (
      SELECT round(-((sxy - sx * sy / m) / (sxx - sx * sx / m)), 6) AS zipf_s,
             round(exp(sy / m - ((sxy - sx * sy / m) / (sxx - sx * sx / m))
                               * sx / m), 6) AS zipf_c
      FROM agg
    )
    SELECT rank, term, freq, zipf_s, zipf_c
    FROM ranked CROSS JOIN fit
    WHERE rank <= {top_k}
    ORDER BY rank
    """


def hashed_features(
    docs: DataFrame, n_features: int = 1024, text_col: str = "text"
) -> DataFrame:
    """Feature-hashing (hashing-trick) vectorizer — Weinberger et al.
    ICML'09, the HashingVectorizer / Vowpal Wabbit input encoding: token
    counts fold into a FIXED ``n_features``-dimensional sparse vector via
    ``feature = h(token) % n_features`` with a signed correction bit
    ``s(token) ∈ {+1,-1}`` that keeps collision noise zero-mean.

    No vocabulary pass, no model state, no driver round-trip — the
    property that makes this THE text featurizer at 100 TB: one narrow
    explode + one (doc_id, feature) hash aggregate with map-side partials,
    executor memory O(n_features) regardless of vocabulary growth (compare
    count_vectorizer, which must materialize the vocabulary).  Zero-sum
    collision cells are dropped (standard sparse form; identical in both
    engines since the sum is exact integer).

    Bucket and sign come from md5 hex chars via instr arithmetic (repo
    convention, cf. similarity._hash20) so the DuckDB oracle reproduces
    every cell bit-for-bit: bucket = 20-bit md5 prefix mod n_features,
    sign = parity of hex char 6.

    Returns (doc_id, feature, value), value = signed collision-corrected
    count.
    """
    t = F.col(text_col)
    tok = docs.select(
        "doc_id", F.explode(F.split(t, " ")).alias("term")
    ).filter(F.col("term") != "")
    h = F.md5(F.col("term"))

    def v(i: int) -> Column:
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1

    h20 = v(0)
    for i in range(1, 5):
        h20 = h20 * 16 + v(i)
    feature = (h20 % n_features).cast("int")
    sign = F.when(v(5) % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", feature.alias("feature"), sign.alias("s"))
        .groupBy("doc_id", "feature")
        .agg(F.sum("s").cast("long").alias("value"))
        .filter(F.col("value") != 0)
    )


def count_vectorizer(
    docs: DataFrame,
    min_df: int = 5,
    max_df_num: int = 4,
    max_df_den: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """CountVectorizer with a df-bounded vocabulary: terms must appear in
    at least ``min_df`` documents (rare-noise floor) and at most
    ``max_df_num/max_df_den`` of the corpus (stopword ceiling, checked as
    exact integer ``max_df_den·df <= max_df_num·n_docs`` — no IEEE
    boundary), then get dense ids 1..V by the deterministic
    (df desc, term asc) order and the doc-term matrix is emitted sparse.

    The vocabulary-bearing sibling of :func:`hashed_features` (reversible
    term ids for model vocab files, vs the stateless hash fold).  Term ids
    use the distributed two-stage rank (:func:`global_enumerate` — no
    single-partition window over the vocabulary), n_docs rides a 1-row
    count frame (broadcast, no driver round-trip), and df filtering
    happens BEFORE ranking so the rank input is already the final
    vocabulary.  At 100 TB: tf and df are map-side-partial hash aggs on
    (doc, term) / term; the matrix join broadcasts the vocabulary when it
    fits and hash-partitions on term past that.

    Returns (doc_id, term_id, term, tf).
    """
    from wolf_quake_spark.analysis import persisted_handles
    from wolf_quake_spark.analysis.sampling import global_enumerate

    tf = term_frequencies(docs, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count_distinct("doc_id").alias("_n"))
    bounded = (
        dfreq.crossJoin(F.broadcast(nd))
        .filter(
            (F.col("df") >= min_df)
            & (F.lit(max_df_den) * F.col("df") <= F.lit(max_df_num) * F.col("_n"))
        )
        .select("term", "df")
    )
    vocab = global_enumerate(
        bounded, [F.desc("df"), F.asc("term")], out_col="term_id"
    )
    out = tf.join(vocab.select("term", "term_id"), "term").select(
        "doc_id", "term_id", "term", F.col("tf").cast("long").alias("tf")
    )
    out._wqs_persisted = persisted_handles(vocab)
    return out
