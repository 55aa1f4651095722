"""Training-data pipeline operators: dedup, similarity, text stats, multimodal."""

# Explicit ASCII whitespace class for text tokenization, written out so the
# Spark (Java regex) and DuckDB-oracle (RE2) sides split identically: Java's
# \s includes \x0B (vertical tab) while RE2's \s does not, so a bare \s+
# silently diverges cross-engine on vertical-tab text (caught in round-2
# review).  Both engines interpret this class byte-for-byte the same.
WS_SPLIT = r"[ \t\n\x0B\f\r]+"


def persisted_handles(df) -> list:
    """Normalize a DataFrame's ``_wqs_persisted`` attribute (None, a single
    persisted frame, or a list of them) to a list for uniform release."""
    h = getattr(df, "_wqs_persisted", None)
    if h is None:
        return []
    return list(h) if isinstance(h, (list, tuple)) else [h]
