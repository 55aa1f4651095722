"""CCNet-style boilerplate removal: drop text segments that recur across
many documents (navigation chrome, license banners, template filler), then
reassemble each document's remaining text in original order.

Segmentation is a SINGLE regex pass: non-overlapping runs of up to
``seg_words`` whitespace-separated words, matched left-to-right by greedy
alternation — linear in text length, pure JVM, and byte-identical between
Java regex and RE2 because the whitespace class is the explicit ASCII set
both dialects agree on (see operators/extract.py WS notes).

100 TB shape: one narrow posexplode → one (seg)-keyed aggregate for the
corpus frequency table (map-side partial on count-distinct via the standard
two-level expansion Spark applies) → the boilerplate set is tiny by
construction (only segments in ≥ min_docs documents survive) and is
BROADCAST back — the corpus never shuffles for the tagging join.  The only
full shuffle is the final doc_id reassembly aggregate.  Ordered reassembly
is shuffle-order-proof: ``array_sort`` over (pos, seg) structs inside the
aggregate, never a bare ``collect_list`` whose order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# explicit ASCII whitespace — the Java-regex/RE2 common subset
_WS = r"[ \t\n\x0B\f\r]"
_NWS = r"[^ \t\n\x0B\f\r]"


def segment_pattern(seg_words: int = 3) -> str:
    """Non-overlapping runs of 1..seg_words words, in document order."""
    return f"{_NWS}+(?:{_WS}+{_NWS}+){{0,{seg_words - 1}}}"


def doc_segments(docs: DataFrame, seg_words: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, seg): ordered non-overlapping word segments per doc."""
    segs = F.regexp_extract_all(
        F.col(text_col), F.lit(segment_pattern(seg_words)), F.lit(0)
    )
    return docs.select("doc_id", F.posexplode(segs).alias("pos", "seg"))


def remove_boilerplate(
    docs: DataFrame,
    min_docs: int = 5,
    seg_words: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc cleaned text with boilerplate segments (appearing in
    ≥ ``min_docs`` distinct documents) removed; counts what was dropped.
    Documents with no tokens emit no row (no segments to keep or drop)."""
    segs = doc_segments(docs, seg_words=seg_words, text_col=text_col)
    bp = (
        segs.groupBy("seg")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("seg", F.lit(True).alias("_bp"))
    )
    flagged = segs.join(F.broadcast(bp), "seg", "left")
    kept = F.when(
        ~F.coalesce(F.col("_bp"), F.lit(False)),
        F.struct(F.col("pos"), F.col("seg")),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("_bp"), 1).otherwise(0)).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["seg"]),
        ).alias("clean_text"),
    )
