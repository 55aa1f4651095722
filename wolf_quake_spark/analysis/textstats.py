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
