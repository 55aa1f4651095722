"""Streaming approximate dedup with BOUNDED Bloom-filter state.

``streaming/dedup.py``'s ``dropDuplicatesWithinWatermark`` keeps exact
per-fingerprint state but only inside the watermark horizon: a duplicate
arriving a week after the original is kept, and widening the horizon
grows state linearly with distinct in-horizon docs.  This module is the
opposite trade — the classic crawler-frontier design: per-shard Bloom
bitsets in the state store remember EVERY fingerprint ever streamed in
O(m) memory fixed at configure time, so cross-horizon duplicates are
dropped forever, at the price of a false-positive rate (a genuinely new
doc whose bits collide is dropped; nothing is ever kept twice).

Sharding: fingerprints route to ``n_shards`` state keys by a stable hash,
so filter memory and per-trigger work spread across executors and one
shard's bitset stays a few KB–MB regardless of corpus size.  At 10^12
docs: 1024 shards × 2^30 bits ≈ 128 GB of state across the cluster for
~1% FP at 10^11 distinct — the arithmetic a real deployment runs; tests
pin small m to force and observe the FP behavior.

Determinism: within a micro-batch a shard's rows are processed in
(ts, fingerprint) order, so "first wins" is stable under shuffle
nondeterminism.  Bit positions come from four 32-bit slices of the md5
fingerprint itself (the fingerprint IS already a uniform hash — no
second hash needed), ``k`` of them used, each mod m.

State schema is the JSON-string convention of streaming/stateful.py
(words serialized sparsely {word_index: bits}); eviction is deliberate —
NoTimeout — because forgetting is exactly what this filter must not do.

Reference parity: beyond-reference (the reference reads one finite log);
the ingest-time face of analysis/dedup.py for never-ending streams.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.streaming.dedup import fingerprint_col

WORD_BITS = 60  # positive int64 words, same convention as plans/bloom_index

OUT_SCHEMA = "doc_id long, ts timestamp, fingerprint string"
STATE_SCHEMA = "words string"


def _positions(fp_hex: str, m_bits: int, k: int) -> list[int]:
    """k bit positions from 32-bit slices of the md5 hex fingerprint."""
    return [int(fp_hex[i * 8 : (i + 1) * 8], 16) % m_bits for i in range(k)]


def _make_bloom_fn(m_bits: int, k: int):
    if k > 4:
        raise ValueError("k > 4 would reuse md5 slices")

    def _bloom_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        words: dict[str, int] = json.loads(state.get[0]) if state.exists else {}
        kept: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "fingerprint"])
            for doc_id, ts, fp in zip(pdf["doc_id"], pdf["ts"], pdf["fingerprint"]):
                pos = _positions(fp, m_bits, k)
                if all(
                    (words.get(str(p // WORD_BITS), 0) >> (p % WORD_BITS)) & 1
                    for p in pos
                ):
                    continue  # seen (or false positive): drop
                for p in pos:
                    w = str(p // WORD_BITS)
                    words[w] = words.get(w, 0) | (1 << (p % WORD_BITS))
                kept.append({"doc_id": doc_id, "ts": ts, "fingerprint": fp})
        state.update((json.dumps(words),))
        if kept:
            yield pd.DataFrame(kept)

    return _bloom_fn


def bloom_dedup_stream(
    docs: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 3,
    n_shards: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """First-wins dedup over the WHOLE stream history in bounded state.

    Emits (doc_id, ts, fingerprint) of kept docs.  ``m_bits`` is the
    per-shard filter size; false-positive rate after n distinct docs per
    shard ≈ (1 - e^(-k·n/m))^k.  Works on a streaming frame (stateful)
    and a batch frame (same kernel via ``applyInPandas``, one shard
    group per task) — one duplicate definition, two execution modes.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    tagged = docs.select(
        "doc_id",
        "ts",
        fingerprint_col(text_col).alias("fingerprint"),
    ).withColumn(
        "shard", F.pmod(F.xxhash64("fingerprint"), F.lit(n_shards)).cast("int")
    )
    fn = _make_bloom_fn(m_bits, k)
    if docs.isStreaming:
        return tagged.groupBy("shard").applyInPandasWithState(
            fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )

    class _BatchState:
        exists = False

        def update(self, _):
            pass

        @property
        def get(self):  # pragma: no cover - exists is always False first
            raise AssertionError

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = list(fn((int(pdf["shard"].iloc[0]),), iter([pdf]), _BatchState()))
        return (
            out[0]
            if out
            else pd.DataFrame({"doc_id": [], "ts": [], "fingerprint": []})
        )

    return tagged.groupBy("shard").applyInPandas(batch_fn, OUT_SCHEMA)
