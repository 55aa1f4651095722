"""Cross-batch stateful sessionization via ``applyInPandasWithState``.

The ``foreachBatch`` adapter (streaming/adapter.py) requires conversations
not to span micro-batch boundaries — each batch sessionizes independently
with the batch pipeline body.  This module lifts that precondition: per-conv
parser state (the open game's accumulators, reference ``parser.rs:159-217``)
lives in the Spark state store between triggers, so a conversation whose
turns arrive across many micro-batches still sessionizes exactly like one
batch pass.  Games are emitted the moment their boundary marker arrives
(``ShutdownGame:`` always, ``InitGame:`` only when the open game has kills —
the G2 conditional flush, ``parser.rs:180-189``); a game still open when the
stream stops is never emitted, which is the G4 EOF-drop by construction.

Semantics folded into state (identical to the batch operators, SURVEY.md §2):
G1-G4 boundary flushes, A1 world-inclusive totals, A2 MOD histogram,
A3 signed scores (world −1 / self-kill +1, ``parser.rs:137-151``),
A4 connect-gated roster with zero-fill, A5 last-name-wins, A6 idempotent
reconnect, A7 flush-order game numbering, and the lenient reject routing of
the batch extractor (malformed gated lines counted per conv; kills always
hit totals/histogram, score/name mutations only for connected players).

Ordering contract: within a micro-batch, turns are sorted by ``turn_idx``;
across micro-batches the landing zone must deliver each conversation's turns
in non-decreasing ``turn_idx`` order (an append log does).  Replayed or
out-of-order turns (``turn_idx`` ≤ the high-water mark already folded) are
dropped idempotently, so at-least-once file delivery does not double-count.

Scale shape: state is grouped by ``conv_id`` — the same hash partitioning as
the batch sessionizer's one shuffle — and per-key state is O(players +
distinct MODs) of the OPEN game only (flushed games leave state
immediately), bounded regardless of conversation length.  This is the
Python-side path (Arrow-batched, one fold per arriving row); the batch
pipeline remains the vectorized hot path, and this operator exists for the
incremental-latency regime where per-trigger row counts are small.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from wolf_quake_spark.data_model import TRANSCRIPTS_SCHEMA, WORLD_ID

U32_MAX = 4_294_967_295

# One row per FLUSHED game.  Histogram and roster ride as JSON strings: the
# per-game payload is tiny (≤ players + MODs entries) and JSON keeps the
# state/output schemas flat for the state store.
GAME_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("game_id", T.LongType(), False),
        T.StructField("total_kills", T.LongType(), False),
        T.StructField("hist_json", T.StringType(), False),
        T.StructField("players_json", T.StringType(), False),
        T.StructField("n_rejects", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("payload", T.StringType(), True)])

_FRESH = {
    "last_turn": -1,  # high-water mark for idempotent replay drops
    "n_flushed": 0,
    "n_rejects": 0,
    "total_kills": 0,
    "hist": {},  # mod_id (str in JSON) -> count
    "players": {},  # client_id (str in JSON) -> [name, kills]
}


def _u32(tok: str) -> int | None:
    t = tok[1:] if tok.startswith("+") else tok
    if not t or not t.isascii() or not t.isdigit():
        return None
    v = int(t)
    return v if v <= U32_MAX else None


def _fold_line(st: dict, line: str, out: list[dict], conv_id: str) -> None:
    """Advance the per-conv accumulators by one log line (parser.rs:159-217)."""
    parts = line.split()
    if not parts:
        return
    t = parts[0]
    if len(t) < 4 or not all(c in "0123456789:" for c in t):
        return  # timestamp gate (parser.rs:167-174)
    if len(parts) < 2:
        st["n_rejects"] += 1
        return
    ev = parts[1]
    if ev == "InitGame:":
        if st["hist"]:  # G2: flush only a game that saw kills
            _flush(st, out, conv_id)
    elif ev == "ShutdownGame:":
        _flush(st, out, conv_id)  # G1: unconditional
    elif ev == "ClientConnect:":
        cid = _u32(parts[2]) if len(parts) >= 3 else None
        if cid is None:
            st["n_rejects"] += 1
            return
        st["players"].setdefault(str(cid), ["unknown", 0])  # A6
    elif ev == "ClientUserinfoChanged:":
        cid = _u32(parts[2]) if len(parts) >= 3 else None
        if cid is None:
            st["n_rejects"] += 1
            return
        name = " ".join(parts[3:])[2:].split("\\", 1)[0]
        if str(cid) in st["players"]:
            st["players"][str(cid)][0] = name  # A5
        else:
            st["n_rejects"] += 1
    elif ev == "Kill:":
        killer = _u32(parts[2]) if len(parts) >= 3 else None
        victim = _u32(parts[3]) if len(parts) >= 4 else None
        mod = (
            _u32(parts[4][:-1])
            if len(parts) >= 5 and len(parts[4]) > 1
            else None
        )
        if killer is None or victim is None or mod is None:
            st["n_rejects"] += 1
            return
        st["total_kills"] += 1  # A1 (world-inclusive)
        st["hist"][str(mod)] = st["hist"].get(str(mod), 0) + 1  # A2
        credit = victim if killer == WORLD_ID else killer
        delta = -1 if killer == WORLD_ID else 1
        if str(credit) in st["players"]:
            st["players"][str(credit)][1] += delta  # A3
        else:
            st["n_rejects"] += 1


def _flush(st: dict, out: list[dict], conv_id: str) -> None:
    st["n_flushed"] += 1
    out.append(
        {
            "conv_id": conv_id,
            "game_id": st["n_flushed"],  # A7: flush-order numbering
            "total_kills": st["total_kills"],
            "hist_json": json.dumps(st["hist"], sort_keys=True),
            "players_json": json.dumps(st["players"], sort_keys=True),
            "n_rejects": st["n_rejects"],
        }
    )
    st["total_kills"] = 0
    st["hist"] = {}
    st["players"] = {}
    st["n_rejects"] = 0


def _make_sessionize_fn(idle_ms: int | None):
    def _sessionize_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_ms is not None and state.hasTimedOut:
            # the conversation idled past the watermark horizon: evict its
            # state.  The open game is dropped unemitted — the same G4
            # EOF-drop the batch pipeline applies, decided mid-stream —
            # and per-key memory stops growing with abandoned convs.
            state.remove()
            return
        conv_id = key[0]
        st = (
            json.loads(state.get[0])
            if state.exists
            else dict(_FRESH, hist={}, players={})
        )
        out: list[dict] = []
        last_ts_ms = None
        for pdf in pdfs:
            if idle_ms is not None and len(pdf):
                ts_max = int(pdf["ts"].astype("int64").max()) // 1_000_000
                last_ts_ms = ts_max if last_ts_ms is None else max(last_ts_ms, ts_max)
            pdf = pdf.sort_values("turn_idx")
            pdf = pdf[pdf["turn_idx"] > st["last_turn"]]  # replay drop
            for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
                if text is not None and not (isinstance(text, float) and pd.isna(text)):
                    for line in str(text).split("\n"):
                        _fold_line(st, line, out, conv_id)
                st["last_turn"] = int(turn_idx)
        state.update((json.dumps(st),))
        if idle_ms is not None and last_ts_ms is not None:
            state.setTimeoutTimestamp(last_ts_ms + idle_ms)
        if out:
            yield pd.DataFrame(out)

    return _sessionize_fn


_sessionize_fn = _make_sessionize_fn(None)  # no-timeout fold, shared/tested


def sessionize_stream(
    transcripts: DataFrame,
    idle_timeout_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming DataFrame of flushed games from a transcripts stream.

    ``idle_timeout_ms`` arms event-time state eviction: a conversation
    whose last turn is older than the watermark by the timeout has its
    state removed (open game dropped, G4), so state-store size tracks the
    ACTIVE conversation set, not every conv_id ever seen — the difference
    between O(active) and O(total) executor memory at 10¹²-turn scale.  A
    turn arriving after eviction starts a fresh parser state (its replay
    high-water mark is gone), matching what a batch re-run over only the
    retained window would compute.
    """
    if idle_timeout_ms is None:
        return transcripts.groupBy("conv_id").applyInPandasWithState(
            _sessionize_fn,
            GAME_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    return (
        transcripts.withWatermark("ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_sessionize_fn(idle_timeout_ms),
            GAME_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_streaming_stateful(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
    idle_timeout_ms: int | None = None,
    rocksdb: bool = False,
) -> None:
    """Drain the landing zone through the stateful sessionizer into a
    ``games`` parquet sink (restartable via the streaming checkpoint).
    ``idle_timeout_ms`` arms event-time state eviction for abandoned
    conversations (see :func:`sessionize_stream`).  ``rocksdb=True`` runs
    the query on the RocksDB state store (session.ROCKSDB_STATE_CONF):
    off-heap state + incremental changelog checkpoints — the production
    configuration once the active-conversation set outgrows comfortable JVM
    heap; the provider is a per-query choice made at stream start, so
    setting it here affects only queries started afterwards."""
    if rocksdb:
        from wolf_quake_spark.session import ROCKSDB_STATE_CONF

        for k, v in ROCKSDB_STATE_CONF.items():
            spark.conf.set(k, v)
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = sessionize_stream(
        reader.parquet(input_path), idle_timeout_ms=idle_timeout_ms
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "games"))
        .option("checkpointLocation", os.path.join(out_dir, "_stateful_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
