"""Streaming corpus curation: the ingest-time face of plans/curate.py.

Continuously-landing documents (JSONL/parquet in a landing zone) flow
through the same cuts the batch curation job applies, each in its
streaming-legal form:

* **quality filter** — stateless narrow projection (`filter_chain` with
  ``keep_all=True``), identical expression to batch;
* **decontamination** — a Bloom-bitset probe against the held-out
  benchmark's shingle set, embedded as a LITERAL word array so the probe is
  a pure projection (streaming-safe: no stream-static join state, no
  Python).  Bloom semantics are conservative: a false positive drops a
  clean doc (rate set by ``bits_per_item``), never the reverse — the right
  failure direction for decontamination.  The bitset is built ONCE from the
  static benchmark corpus via the batch machinery
  (`analysis/contamination._bloom_words`);
* **dedup** — first-wins exact dedup with watermark-bounded state
  (`streaming/dedup.dedup_stream`).

Batch/stream parity is by construction: every stage is the same Column
expression the batch path evaluates, so draining a landing dir through the
stream equals running the batch form on the union of its files
(pytest-enforced, including across micro-batch boundaries for the stateful
dedup stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis import WS_SPLIT
from wolf_quake_spark.analysis.dedup import shingle_array
from wolf_quake_spark.analysis.filters import filter_chain
from wolf_quake_spark.streaming.dedup import dedup_stream


def contaminated_probe(
    bloom_words: list[int], m_bits: int, k: int = 4, n: int = 5, text_col: str = "text"
):
    """Boolean Column: does any word ``n``-gram of ``text_col`` hit the
    Bloom bitset?  Pure Catalyst (exists over the shingle array, k seeded
    xxhash64 bit tests against a literal word array) — usable on batch and
    streaming frames alike."""
    bf = F.array(*[F.lit(w).cast("long") for w in bloom_words])
    words = F.split(F.trim(F.col(text_col)), WS_SPLIT)
    shingles = shingle_array(words, n)

    def hit(s):
        cond = None
        for i in range(k):
            p = F.pmod(F.xxhash64(F.md5(s), F.lit(i)), F.lit(m_bits))
            word = F.element_at(bf, (p / 64).cast("int") + 1)
            c = word.bitwiseAND(_shiftleft_one((p % 64).cast("int"))) != 0
            cond = c if cond is None else cond & c
        return cond

    return F.exists(shingles, hit)


def _shiftleft_one(shift_col):
    """shiftleft(1L, col) via the SQL function (the Python wrapper only
    accepts literal shift amounts)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), shift_col)


def curate_documents_stream(
    docs: DataFrame,
    bloom_words: list[int],
    m_bits: int,
    k: int = 4,
    shingle_n: int = 5,
    delay: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Quality-filter → Bloom-decontaminate → first-wins dedup a document
    stream.  Works identically on a batch frame (dedup_stream's batch
    face), which is what the parity test exploits."""
    kept = filter_chain(docs, text_col=text_col, keep_all=True).filter(
        F.col("keep") == 1
    ).drop("keep")
    clean = kept.filter(
        ~contaminated_probe(bloom_words, m_bits, k=k, n=shingle_n, text_col=text_col)
    )
    return dedup_stream(clean, delay=delay, ts_col=ts_col, text_col=text_col)
