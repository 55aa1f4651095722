"""Cross-batch stateful sessionization on the ``transformWithStateInPandas``
API (Spark 4's arbitrary-stateful-processing successor to
``applyInPandasWithState``).

Same semantics as streaming/stateful.py — the per-conversation parser fold
(reference ``parser.rs:159-217``: G1-G4 boundary flushes, A1-A7 aggregate
rules, lenient reject routing, idempotent replay drops via the
``turn_idx`` high-water mark) — expressed as a ``StatefulProcessor``:

* state lives in a named ``ValueState`` ("parser") instead of the single
  implicit GroupState slot, so future extensions (e.g. a per-conv metrics
  ``MapState``, TTL'd roster state) compose without re-encoding everything
  into one blob;
* the new API REQUIRES the RocksDB state-store provider — state is
  off-heap by construction, and ``ttlDurationMs`` on the state handle
  replaces the manual event-time timeout dance for idle eviction;
* ``handleInputRows`` receives the micro-batch's rows for one key and
  yields flushed games — identical outputs to both the
  ``applyInPandasWithState`` path and the batch pipeline (golden-tested).

The fold/flush kernels are SHARED with streaming/stateful.py (imported,
not copied), so the two APIs cannot drift semantically.

Environment gate: transformWithState's Python state server speaks protobuf
(``google.protobuf``), which this sandbox does not ship and cannot install
— ``tws_available()`` reports whether the runtime can execute this path,
and the pytest suite skips (with that reason) where it can't.  The
``applyInPandasWithState`` sessionizer (streaming/stateful.py) is the
golden-tested path in this environment; on a protobuf-equipped cluster the
two are drop-in interchangeable because they share the fold kernel.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from wolf_quake_spark.data_model import TRANSCRIPTS_SCHEMA
from wolf_quake_spark.streaming.stateful import (
    _FRESH,
    _fold_line,
    GAME_SCHEMA,
    STATE_SCHEMA,
)


def tws_available() -> bool:
    """True when the runtime can execute transformWithStateInPandas
    (requires ``google.protobuf`` for Spark's Python state-server
    protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class SessionizeProcessor(StatefulProcessor):
    """Per-conversation Quake-log parser as a transformWithState processor.

    ``ttl_ms`` (optional) arms state TTL: a conversation receiving no data
    for that long has its parser state dropped by the store itself — the
    G4 open-game drop for abandoned conversations, without manual timer
    bookkeeping."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "parser", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        got = self._state.get() if self._state.exists() else None
        st = json.loads(got[0]) if got is not None else dict(_FRESH, hist={}, players={})
        out: list[dict] = []
        for pdf in rows:
            pdf = pdf.sort_values("turn_idx")
            pdf = pdf[pdf["turn_idx"] > st["last_turn"]]  # idempotent replay
            for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
                if text is not None and not (isinstance(text, float) and pd.isna(text)):
                    for line in str(text).split("\n"):
                        _fold_line(st, line, out, conv_id)
                st["last_turn"] = int(turn_idx)
        self._state.update((json.dumps(st),))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    transcripts: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Streaming DataFrame of flushed games via transformWithStateInPandas.

    State TTL is only legal under ``timeMode="ProcessingTime"`` — Spark's
    StatefulProcessorHandle rejects ``ttlDurationMs`` in NoTime mode at
    query start (cannotPerformOperationWithInvalidTimeMode), so the time
    mode must track whether TTL is armed rather than being hardcoded."""
    return transcripts.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=SessionizeProcessor(ttl_ms=ttl_ms),
        outputStructType=GAME_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )


def run_streaming_tws(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
    ttl_ms: int | None = None,
) -> None:
    """Drain the landing zone through the transformWithState sessionizer.

    transformWithState requires the RocksDB state store, so the provider
    conf is applied unconditionally (per-query choice, picked at start)."""
    from wolf_quake_spark.session import ROCKSDB_STATE_CONF

    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = sessionize_stream_tws(reader.parquet(input_path), ttl_ms=ttl_ms)
    query = (
        stream.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "games"))
        .option("checkpointLocation", os.path.join(out_dir, "_tws_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
