"""PII scrubbing for training-data pipelines: redact emails / IPv4
addresses / phone numbers with typed placeholder tokens and count what was
removed.

Patterns deliberately use only the regex subset with identical semantics in
Java regex (Spark executors) and RE2 (DuckDB oracle / many scan-side
engines): character classes, bounded repetition, ``\\b`` ASCII word
boundaries — no lookaround, no backreferences.  Replacements are literal
strings (no ``$1``/``\\1`` dialect divergence).

100 TB shape: pure projection — three ``regexp_count`` + three
``regexp_replace`` per row, whole-stage-codegen'd JVM-side, zero shuffle,
zero Python.  Redaction order is email → IP → phone; the placeholder tokens
contain no digits, so an earlier replacement can never manufacture a later
match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, redacted text, and per-category removal counts."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    t1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(IPV4_RE))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PHONE_RE))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        t3.alias("redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )
