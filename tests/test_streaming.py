"""Structured Streaming adapter: batch-parity, incremental drain, restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wolf_quake_spark.datagen import synth_transcripts
from wolf_quake_spark.plans.pipeline import run_resumable
from wolf_quake_spark.streaming import run_streaming

SINKS = ("kills", "game_boundaries", "player_state", "game_totals", "player_ranking")


def _write_convs(spark, path: str, n_convs: int, seed: int) -> None:
    df = synth_transcripts(
        spark, n_convs=n_convs, lines_per_turn=3, n_games=3, kills_per_game=8, seed=seed
    ).withColumn("conv_id", F.concat(F.lit(f"s{seed}-"), F.col("conv_id")))
    df.repartition(max(2, n_convs // 2), "conv_id").write.mode("append").parquet(path)


def test_streaming_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "landing")
    _write_convs(spark, inp, n_convs=6, seed=7)

    batch_out = str(tmp_path / "batch_out")
    m_batch = run_resumable(spark, inp, batch_out, files_per_batch=2)

    stream_out = str(tmp_path / "stream_out")
    m_stream = run_streaming(spark, inp, stream_out, max_files_per_trigger=2)

    t_batch, t_stream = m_batch.totals(), m_stream.totals()
    for sink in SINKS:
        assert t_stream[sink] == t_batch[sink], sink
    # multiple micro-batches actually ran (maxFilesPerTrigger honored)
    assert len(m_stream.completed) >= 2
    # sink contents, not just counts
    a = spark.read.parquet(os.path.join(batch_out, "kills", "*"))
    b = spark.read.parquet(os.path.join(stream_out, "kills", "*"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_streaming_incremental_restart(spark, tmp_path):
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "out")

    _write_convs(spark, inp, n_convs=4, seed=11)
    m1 = run_streaming(spark, inp, out)
    totals1 = m1.totals()
    epochs1 = set(m1.completed)
    assert totals1["kills"] > 0

    # no new files → restart drains nothing, manifest unchanged
    m2 = run_streaming(spark, inp, out)
    assert m2.totals() == totals1

    # new conversations land → only they are processed (checkpointed file log)
    _write_convs(spark, inp, n_convs=3, seed=13)
    m3 = run_streaming(spark, inp, out)
    assert set(m3.completed) > epochs1
    t3 = m3.totals()
    assert t3["kills"] > totals1["kills"]

    # grand totals equal a from-scratch batch run over the full landing zone
    ref = run_resumable(spark, inp, str(tmp_path / "ref_out"), files_per_batch=64)
    for sink in SINKS:
        assert t3[sink] == ref.totals()[sink], sink


# ---------------------------------------------------------------------------
# Cross-batch stateful sessionization (streaming/stateful.py)
# ---------------------------------------------------------------------------

QGAMES_TOTALS = [0, 11, 4, 105, 14, 29, 130, 89, 67, 60, 20, 160, 6, 122, 3,
                 0, 13, 7, 95, 3, 131]  # reference golden (BASELINE.md)


def _qgames_landing(spark, path: str, n_files: int) -> int:
    """Write the qgames fixture as one conversation sliced into n_files
    contiguous turn ranges — deliberately splitting mid-game, the case the
    foreachBatch adapter cannot handle."""
    from wolf_quake_spark.datagen import read_reference_log, transcripts_from_log

    log = read_reference_log("qgames.log")
    if log is None:
        import pytest

        pytest.skip("reference examples not present")
    tr = transcripts_from_log(spark, log, "qgames", lines_per_turn=3)
    rows = sorted(tr.collect(), key=lambda r: r["turn_idx"])
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, tr.schema).coalesce(1).write.mode(
                "append"
            ).parquet(path)
    return len(rows)


def test_stateful_sessionize_spans_micro_batches(spark, tmp_path):
    import json

    from wolf_quake_spark.streaming import run_streaming_stateful

    inp = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    _qgames_landing(spark, inp, n_files=5)

    # one file per trigger → 5 micro-batches, games straddle all of them
    run_streaming_stateful(spark, inp, out, max_files_per_trigger=1)

    games = sorted(
        spark.read.parquet(out + "/games").collect(), key=lambda r: r["game_id"]
    )
    assert [r["total_kills"] for r in games] == QGAMES_TOTALS
    assert sum(r["total_kills"] for r in games) == 1069

    # game 2 MOD histogram golden (ids: 22=TriggerHurt, 7=RocketSplash, 19=Falling)
    hist2 = json.loads(games[1]["hist_json"])
    assert hist2 == {"22": 7, "7": 3, "19": 1}

    # game 21 top-3 golden: Oootsimo 22, Assasinu Credi 19, Zeh 19
    players21 = json.loads(games[20]["players_json"])
    top = sorted(((v[1], v[0]) for v in players21.values()), reverse=True)[:3]
    assert top[0] == (22, "Oootsimo")
    assert {(n, k) for k, n in top[1:]} == {("Assasinu Credi", 19), ("Zeh", 19)}


def test_stateful_restart_and_replay_idempotent(spark, tmp_path):
    from wolf_quake_spark.streaming import run_streaming_stateful

    inp = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    _qgames_landing(spark, inp, n_files=3)

    run_streaming_stateful(spark, inp, out, max_files_per_trigger=2)
    n1 = spark.read.parquet(out + "/games").count()
    assert n1 == 21

    # restart with no new files: checkpoint prevents reprocessing
    run_streaming_stateful(spark, inp, out)
    assert spark.read.parquet(out + "/games").count() == n1


def test_windowed_rollup_watermark_drops_late(spark, tmp_path):
    """Watermarked tumbling rollup: on-time rows aggregate, a row older than
    the watermark is dropped, and append mode emits only closed windows."""
    import datetime as dt
    import glob
    import os
    import shutil

    from wolf_quake_spark.streaming.windowed import windowed_event_rollup

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    hours = dt.timedelta(hours=1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def land(rows, name, mtime):
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = str(landing / name)
        shutil.copyfile(part, dst)
        os.utime(dst, (mtime, mtime))

    landing = tmp_path / "landing"
    landing.mkdir()
    # batch 1: one click per hour 00:00..05:00 → watermark after commit =
    # 05:00 - 2h = 03:00
    land([(h, base + h * hours, 10 + h, "click", 1.0) for h in range(6)],
         "f1.parquet", 1_700_000_000)
    # batch 2: an on-time row; its processing runs with watermark 03:00,
    # which EVICTS (and emits) the 00:00-02:00 windows at batch end
    land([(50, base + dt.timedelta(hours=5, minutes=30), 11, "click", 1.0)],
         "f2.parquet", 1_700_000_100)
    # batch 3: a replay at 00:00 — its window is already evicted → dropped —
    # plus an in-horizon row at 04:30 (still in state, merges)
    land([(100, base, 99, "click", 1.0),
          (101, base + dt.timedelta(hours=4, minutes=30), 50, "click", 1.0)],
         "f3.parquet", 1_700_000_200)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        windowed_event_rollup(stream, window="1 hour", delay="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        int(p["stateOperators"][0]["numRowsDroppedByWatermark"])
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    )
    got = {
        r["window_start"]: r["n_events"]
        for r in spark.table("wm_rollup").collect()
    }
    # the 00:00 window must hold ONLY the on-time row: the replayed 00:00
    # event arrived after its window was evicted and was dropped
    assert got.get(base) == 1
    assert dropped == 1
    # append mode emits exactly the windows the watermark closed (00-02);
    # each holds its single on-time row
    assert got == {base: 1, base + hours: 1, base + 2 * hours: 1}


def test_windowed_rollup_streaming_matches_batch_for_closed_windows(spark, tmp_path):
    """Batch and streaming are two execution modes of ONE rollup definition:
    for every window the watermark closed, the streaming (append-mode)
    result must equal running the same function on the same rows as a
    batch frame."""
    import datetime as dt
    import glob
    import os
    import random
    import shutil

    from wolf_quake_spark.streaming.windowed import windowed_event_rollup

    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = [
        (i,
         base + dt.timedelta(minutes=rng.randrange(0, 10 * 60)),
         rng.randrange(20),
         rng.choice(["click", "purchase"]),
         round(rng.uniform(0, 50), 2))
        for i in range(400)
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    # three files in ts order so the watermark advances across micro-batches
    rows.sort(key=lambda r: r[1])
    for i in range(3):
        chunk = rows[i * 134:(i + 1) * 134 + (0 if i < 2 else 10)]
        st = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(st)
        dst = str(landing / f"f{i}.parquet")
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        windowed_event_rollup(stream, window="1 hour", delay="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.table("wm_parity").collect()
    }
    assert streamed  # the watermark must have closed at least one window

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in windowed_event_rollup(
            spark.createDataFrame(rows, schema), window="1 hour", delay="1 hour"
        ).collect()
    }
    for key, vals in streamed.items():
        assert batch[key] == vals  # every closed window agrees exactly


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first doc per content
    fingerprint across micro-batches; whitespace/case variants collapse to
    the same fingerprint; the batch face of the same function agrees."""
    import datetime as dt
    import glob
    import os
    import shutil

    from wolf_quake_spark.streaming.dedup import dedup_stream

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    mins = dt.timedelta(minutes=1)
    schema = "doc_id long, ts timestamp, text string"

    landing = tmp_path / "landing"
    landing.mkdir()

    def land(rows, name, mtime):
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = str(landing / name)
        shutil.copyfile(part, dst)
        os.utime(dst, (mtime, mtime))

    # batch 1: two distinct docs
    land(
        [(1, base, "hello world"), (2, base + mins, "unrelated doc")],
        "f1.parquet",
        1_700_000_000,
    )
    # batch 2 (separate micro-batch): exact dup, normalized dup (case +
    # whitespace), and one genuinely new doc — all within the 1h horizon
    land(
        [
            (3, base + 2 * mins, "hello world"),
            (4, base + 3 * mins, "  HELLO   world "),
            (5, base + 4 * mins, "fresh content"),
        ],
        "f2.parquet",
        1_700_000_100,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        dedup_stream(stream, delay="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.table("dedup_stream").collect()}
    assert kept == {1, 2, 5}  # docs 3 and 4 are in-horizon duplicates of 1

    # batch face: same function, same duplicate definition
    all_rows = spark.read.parquet(str(landing))
    batch_fps = {r["fingerprint"] for r in dedup_stream(all_rows).collect()}
    stream_fps = {r["fingerprint"] for r in spark.table("dedup_stream").collect()}
    assert batch_fps == stream_fps


def test_lww_view_stream_equals_batch(spark, tmp_path):
    """Streaming LWW upsert view across micro-batch boundaries equals the
    batch window formulation: a later version in a later batch replaces the
    winner; an out-of-order replay of an older version does not."""
    import datetime as dt
    import glob
    import shutil

    from wolf_quake_spark.streaming.lww import lww_view

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)

    def land(rows, name):
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.copyfile(
            glob.glob(f"{tmp}/part-*.parquet")[0], str(landing / name)
        )

    landing = tmp_path / "landing"
    landing.mkdir()
    land(
        [
            (1, t(10), 7, "click", 1.0),
            (2, t(20), 7, "click", 2.0),   # batch-1 winner for (7, click)
            (3, t(10), 8, "buy", 9.0),
        ],
        "f1.parquet",
    )
    land(
        [
            (4, t(30), 7, "click", 3.0),   # later version → replaces
            (5, t(5), 8, "buy", 0.5),      # out-of-order older version → loses
            (6, t(10), 9, "click", 4.0),   # new key
        ],
        "f2.parquet",
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        lww_view(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("lww_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_type"]): (
            r["latest_event_id"],
            r["latest_value"],
        )
        for r in spark.table("lww_stream").collect()
    }
    assert got == {(7, "click"): (4, 3.0), (8, "buy"): (3, 9.0), (9, "click"): (6, 4.0)}

    # batch face: identical expression on the full landing dir
    batch = {
        (r["user_id"], r["event_type"]): (r["latest_event_id"], r["latest_value"])
        for r in lww_view(spark.read.parquet(str(landing))).collect()
    }
    assert batch == got


def test_curate_documents_stream_parity(spark, tmp_path):
    """Streaming curation (quality → Bloom decontam → first-wins dedup)
    across micro-batches equals the identical batch expression on the
    union of the files; each cut drops what it should."""
    import datetime as dt
    import glob
    import shutil

    from pyspark.sql import functions as F
    from wolf_quake_spark.analysis.contamination import _bloom_words
    from wolf_quake_spark.analysis.dedup import word_shingles
    from wolf_quake_spark.streaming.curate import curate_documents_stream

    leak = "the secret benchmark answer is forty two exactly today"
    bench = spark.createDataFrame([(999, leak)], "doc_id long, text string")
    bsh = word_shingles(bench, n=5).select(F.md5("shingle").alias("h"))
    words, m = _bloom_words(bsh, bsh.count(), bits_per_item=16, k=4)

    good1 = "this is a perfectly ordinary document about the weather and the sea"
    good2 = "another fine document with plenty of common stopwords in it for you"
    schema = "doc_id long, ts timestamp, text string"
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)

    def land(rows, name):
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], str(landing / name))

    landing = tmp_path / "landing"
    landing.mkdir()
    land(
        [
            (1, t(1), good1),
            (2, t(2), "short junk"),                      # quality cut (< 5 tokens)
            (3, t(3), f"prefix words {leak} suffix here"), # contamination cut
        ],
        "f1.parquet",
    )
    land(
        [
            (4, t(10), good1),   # exact dup of doc 1 across the batch boundary
            (5, t(11), good2),
        ],
        "f2.parquet",
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        curate_documents_stream(stream, words, m, delay="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("curate_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.table("curate_stream").collect()}
    assert kept == {1, 5}

    # batch face: identical expression chain on the union of the files.
    # batch dropDuplicates keeps an arbitrary row per fingerprint, so
    # compare the surviving CONTENT (fingerprints), not row identity.
    batch = curate_documents_stream(
        spark.read.parquet(str(landing)), words, m, delay="1 hour"
    )
    stream_fps = {r["fingerprint"] for r in spark.table("curate_stream").collect()}
    assert {r["fingerprint"] for r in batch.collect()} == stream_fps


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval self-join: the availableNow drain must emit
    exactly the (purchase, click) pairs the identical function produces on
    the same rows as a batch frame."""
    import datetime as dt
    import glob
    import os
    import random
    import shutil

    from wolf_quake_spark.streaming.interval_join import purchase_click_pairs

    rng = random.Random(7)
    base = dt.datetime(2024, 5, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (i,
         base + dt.timedelta(minutes=rng.randrange(0, 8 * 60)),
         rng.randrange(6),
         rng.choice(["purchase", "click", "view"]))
        for i in range(300)
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    # land in ts order so the watermark advances and state actually evicts
    rows.sort(key=lambda r: r[1])
    for i in range(3):
        chunk = rows[i * 100:(i + 1) * 100]
        st = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(st)
        dst = str(landing / f"f{i}.parquet")
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        purchase_click_pairs(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ivj_pairs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["p_event_id"], r["c_event_id"])
        for r in spark.table("ivj_pairs").collect()
    }
    batch = {
        (r["p_event_id"], r["c_event_id"])
        for r in purchase_click_pairs(spark.createDataFrame(rows, schema)).collect()
    }
    assert streamed == batch
    assert batch  # non-degenerate: some pairs exist

    # and the derived per-purchase counts agree with the batch range-join
    # shape (count of clicks per purchase, purchases with pairs only)
    from collections import Counter

    sc = Counter(p for p, _ in streamed)
    bc = Counter(p for p, _ in batch)
    assert sc == bc


def test_interval_join_left_outer_emits_nulls_after_expiry(spark, tmp_path):
    """Left-outer interval join: a click-less purchase is emitted with NULL
    click columns once the watermark proves no match can still arrive, and
    the matched pairs equal the batch left join on the same rows."""
    import datetime as dt
    import glob
    import os
    import shutil

    from wolf_quake_spark.streaming.interval_join import purchase_click_pairs

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (1, base, 7, "purchase"),                                # has a click
        (2, base - dt.timedelta(minutes=10), 7, "click"),        # its match
        (3, base + dt.timedelta(minutes=5), 8, "purchase"),      # click-less
        # far-future rows must reach BOTH watermark operators (the global
        # watermark is the min across them, and each only sees rows that
        # survive its side's filter) to expire the early purchases' state
        (5, base + dt.timedelta(hours=8), 10, "purchase"),
        (6, base + dt.timedelta(hours=8), 11, "click"),
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, chunk in enumerate([rows[:3], rows[3:]]):  # futures land last
        st = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(st)
        dst = str(landing / f"f{i}.parquet")
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        purchase_click_pairs(stream, how="left_outer")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ivj_outer")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["p_event_id"], r["c_event_id"]) for r in spark.table("ivj_outer").collect()
    }
    batch = {
        (r["p_event_id"], r["c_event_id"])
        for r in purchase_click_pairs(
            spark.createDataFrame(rows, schema), how="left_outer"
        ).collect()
    }
    # the click-less early purchase emitted its null after state expiry;
    # the far-future purchase (5) is still in state when the drain ends, so
    # only the batch face shows its null — streaming holds it back until a
    # later watermark could prove it unmatched (correct append semantics)
    assert (1, 2) in streamed and (3, None) in streamed
    assert batch == {(1, 2), (3, None), (5, None)}
    assert streamed == batch - {(5, None)}


import pytest as _pytest


@_pytest.mark.parametrize("store", ["hdfs", "rocksdb"])
def test_stateful_idle_timeout_evicts_conversation_state(spark, tmp_path, store):
    """Event-time idle eviction: a conversation idle past the watermark
    horizon loses its state (open game dropped, G4 mid-stream); turns
    arriving after eviction start a FRESH parser state, and active
    conversations are unaffected.  Parametrized over the state-store
    provider — timeout firing is provider-mediated, so RocksDB must show
    the identical eviction sequence."""
    import datetime as dt

    _pk = "spark.sql.streaming.stateStore.providerClass"
    _prev = spark.conf.get(_pk, None)
    if store == "rocksdb":
        from wolf_quake_spark.session import ROCKSDB_STATE_CONF

        for k, v in ROCKSDB_STATE_CONF.items():
            spark.conf.set(k, v)
    import glob
    import os
    import shutil

    from wolf_quake_spark.streaming.stateful import sessionize_stream

    base = dt.datetime(2024, 7, 1, 0, 0, 0)
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")

    def turns(conv, idx, ts, lines):
        return (conv, idx, "tool", "\n".join(lines), "game", ts)

    f1 = [
        # conv A: opens a game with kills, never closes -> state held open
        turns("A", 0, base, [
            "0:01 InitGame: x",
            "0:02 ClientConnect: 2",
            "0:03 Kill: 2 2 7: s killed s by MOD_ROCKET_SPLASH",
        ]),
        # conv B: a complete game in one batch
        turns("B", 0, base, [
            "0:01 InitGame: x",
            "0:02 ClientConnect: 3",
            "0:03 Kill: 3 3 7: s killed s by MOD_ROCKET_SPLASH",
            "0:04 Kill: 3 3 7: s killed s by MOD_ROCKET_SPLASH",
            "0:05 ShutdownGame:",
        ]),
    ]
    # batch 2: conv C far in the future -> watermark sails past A's deadline
    f2 = [turns("C", 0, base + dt.timedelta(hours=10),
                ["0:01 InitGame: x", "0:02 ShutdownGame:"])]
    # batch 3: unrelated conv D — A receives NO data this batch, so its
    # expired timer actually fires (data arrival preempts a timeout)
    f2b = [turns("D", 0, base + dt.timedelta(hours=10, minutes=1),
                 ["0:01 InitGame: x", "0:02 ShutdownGame:"])]
    # batch 4: conv A returns AFTER eviction; fresh state, one kill, closes
    f3 = [turns("A", 1, base + dt.timedelta(hours=11), [
        "0:06 InitGame: x",
        "0:07 ClientConnect: 2",
        "0:08 Kill: 2 2 7: s killed s by MOD_ROCKET_SPLASH",
        "0:09 ShutdownGame:",
    ])]

    landing = tmp_path / "landing"
    landing.mkdir()
    for i, chunk in enumerate([f1, f2, f2b, f3]):
        st = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(st)
        dst = str(landing / f"f{i}.parquet")
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        sessionize_stream(stream, idle_timeout_ms=3_600_000)  # 1 hour idle
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("idle_evict")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["conv_id"], r["game_id"]): r["total_kills"]
        for r in spark.table("idle_evict").collect()
    }
    # B's complete game emitted; C's empty game flushed by its shutdown;
    # A emitted ONLY the post-eviction game — numbered 1 again (fresh
    # state proves the old accumulators and flush counter were dropped)
    assert got[("B", 1)] == 2
    assert got[("C", 1)] == 0
    assert got[("D", 1)] == 0
    assert got[("A", 1)] == 1
    assert len(got) == 4  # A's pre-eviction open game never surfaced
    spark.catalog.dropTempView("idle_evict")
    if _prev is not None:
        spark.conf.set(_pk, _prev)
    else:
        spark.conf.unset(_pk)


def test_sliding_rollup_streaming_matches_batch(spark, tmp_path):
    """Sliding-window streaming rollup: every window the watermark closed
    matches the batch face of the identical function (each event lands in
    window/slide = 4 overlapping windows)."""
    import datetime as dt
    import glob
    import os
    import random
    import shutil

    from wolf_quake_spark.streaming.windowed import windowed_event_rollup

    rng = random.Random(23)
    base = dt.datetime(2024, 4, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = [
        (i,
         base + dt.timedelta(minutes=rng.randrange(0, 6 * 60)),
         rng.randrange(10),
         rng.choice(["click", "purchase"]),
         round(rng.uniform(0, 20), 2))
        for i in range(300)
    ]
    rows.sort(key=lambda r: r[1])
    landing = tmp_path / "landing"
    landing.mkdir()
    for i in range(3):
        chunk = rows[i * 100:(i + 1) * 100]
        st = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(st)
        dst = str(landing / f"f{i}.parquet")
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        windowed_event_rollup(stream, window="1 hour", delay="1 hour",
                              slide="15 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("slide_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.table("slide_parity").collect()
    }
    assert streamed  # some sliding windows closed

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in windowed_event_rollup(
            spark.createDataFrame(rows, schema), window="1 hour",
            delay="1 hour", slide="15 minutes"
        ).collect()
    }
    for key, vals in streamed.items():
        assert batch[key] == vals
    # sliding really overlaps: ~4 windows per closed hour of activity
    starts = sorted({k[0] for k in streamed})
    assert any((b - a) == dt.timedelta(minutes=15) for a, b in zip(starts, starts[1:]))


def test_interval_join_restart_recovers_state(spark, tmp_path):
    """Stream-stream join state survives a stop/restart: a purchase whose
    click arrives only in the SECOND drain still pairs (state-store
    recovery from the checkpoint), and no pair is emitted twice."""
    import datetime as dt
    import glob
    import os
    import shutil

    from wolf_quake_spark.streaming.interval_join import purchase_click_pairs

    base = dt.datetime(2024, 9, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "pairs")

    def land(rows, name, mtime):
        st = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(st)
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0], str(landing / name))
        os.utime(str(landing / name), (mtime, mtime))

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(landing))
        )
        q = (
            purchase_click_pairs(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # drain 1: a purchase and one matching click
    land([(1, base, 5, "purchase"), (2, base - dt.timedelta(minutes=5), 5, "click")],
         "f1.parquet", 1_700_000_000)
    drain()
    pairs1 = {(r["p_event_id"], r["c_event_id"])
              for r in spark.read.parquet(sink).collect()}
    assert pairs1 == {(1, 2)}

    # drain 2 (fresh query object, same checkpoint): a LATER click for the
    # same held purchase — only recovered state can produce this pair
    land([(3, base - dt.timedelta(minutes=2), 5, "click")],
         "f2.parquet", 1_700_000_100)
    drain()
    pairs2 = {(r["p_event_id"], r["c_event_id"])
              for r in spark.read.parquet(sink).collect()}
    assert pairs2 == {(1, 2), (1, 3)}  # new pair added, old one not duplicated

    # drain 3: nothing new -> no growth (exactly-once across restarts)
    drain()
    assert spark.read.parquet(sink).count() == 2


def test_stateful_sessionize_rocksdb_state_store(spark, tmp_path):
    """The stateful sessionizer on the RocksDB state store (off-heap state,
    changelog checkpoints — the at-scale configuration) produces the exact
    qgames goldens across micro-batch boundaries, and the provider conf is
    actually applied to the session."""
    from wolf_quake_spark.session import ROCKSDB_STATE_CONF
    from wolf_quake_spark.streaming import run_streaming_stateful

    inp = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    _qgames_landing(spark, inp, n_files=4)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        run_streaming_stateful(spark, inp, out, max_files_per_trigger=1, rocksdb=True)
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_STATE_CONF["spark.sql.streaming.stateStore.providerClass"]
        )
        games = sorted(
            spark.read.parquet(out + "/games").collect(), key=lambda r: r["game_id"]
        )
        assert [r["total_kills"] for r in games] == QGAMES_TOTALS
        assert sum(r["total_kills"] for r in games) == 1069
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_sessionizer_matches_stateful_or_skips(spark, tmp_path):
    """transformWithStateInPandas sessionizer (modern StatefulProcessor API,
    RocksDB-backed): golden-exact vs the qgames totals — skipped where the
    runtime lacks google.protobuf (Spark's TWS state-server protocol), with
    semantic drift ruled out by the shared fold kernel."""
    import pytest

    from wolf_quake_spark.streaming.tws import run_streaming_tws, tws_available

    if not tws_available():
        pytest.skip("google.protobuf unavailable — transformWithState "
                    "state server cannot start in this environment")
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    _qgames_landing(spark, inp, n_files=4)
    run_streaming_tws(spark, inp, out, max_files_per_trigger=1)
    games = sorted(
        spark.read.parquet(out + "/games").collect(), key=lambda r: r["game_id"]
    )
    assert [r["total_kills"] for r in games] == QGAMES_TOTALS
    assert sum(r["total_kills"] for r in games) == 1069


def test_tws_fold_kernel_is_shared():
    """The TWS processor folds with the SAME kernel as the tested
    applyInPandasWithState path — the no-drift guarantee the environment
    gate relies on."""
    from wolf_quake_spark.streaming import stateful, tws

    assert tws._fold_line is stateful._fold_line
    assert tws.GAME_SCHEMA is stateful.GAME_SCHEMA
    assert tws.STATE_SCHEMA is stateful.STATE_SCHEMA
    # the processor's handleInputRows drives _fold_line over sorted turns —
    # spot-check the pure-python kernel against a hand fold
    st = dict(stateful._FRESH, hist={}, players={})
    out = []
    for line in (
        "  0:00 InitGame: x",
        "  0:01 ClientConnect: 2",
        '  0:02 ClientUserinfoChanged: 2 n\\Zeh\\t',
        "  0:03 Kill: 1022 2 22: <world> killed Zeh by MOD_TRIGGER_HURT",
        "  0:04 ShutdownGame:",
    ):
        stateful._fold_line(st, line, out, "c")
    assert len(out) == 1 and out[0]["total_kills"] == 1
    import json

    assert json.loads(out[0]["players_json"])["2"] == ["Zeh", -1]


def test_windowed_countmin_parity_and_merge(spark, tmp_path):
    """Streaming CM sketch: (1) every closed window's cells equal the batch
    face on the same rows; (2) merging closed windows cell-wise and point-
    estimating from the merged sketch never underestimates any user's true
    count in those windows (the CM guarantee survives the merge)."""
    import datetime as dt
    import glob
    import random
    import shutil

    from wolf_quake_spark.streaming.countmin import (
        cm_estimate,
        merge_cm_windows,
        windowed_countmin,
    )

    rng = random.Random(5)
    base = dt.datetime(2024, 3, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = [
        (i,
         base + dt.timedelta(minutes=rng.randrange(0, 8 * 60)),
         rng.randrange(12),
         "click",
         1.0)
        for i in range(600)
    ]
    rows.sort(key=lambda r: r[1])
    landing = tmp_path / "cm_landing"
    landing.mkdir()
    for i in range(3):
        chunk = rows[i * 200:(i + 1) * 200]
        st = str(tmp_path / f"cms{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(st)
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0],
                        str(landing / f"f{i}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        windowed_countmin(stream, window="1 hour", delay="1 hour", width=16)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cm_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    closed = spark.table("cm_parity").cache()
    streamed = {
        (r["window_start"], r["j"], r["b"]): r["cell"] for r in closed.collect()
    }
    assert streamed  # at least one window closed

    batch = {
        (r["window_start"], r["j"], r["b"]): r["cell"]
        for r in windowed_countmin(
            spark.createDataFrame(rows, schema),
            window="1 hour", delay="1 hour", width=16,
        ).collect()
    }
    for key, cell in streamed.items():
        assert batch[key] == cell  # every closed window agrees exactly

    # merge closed windows; estimates must dominate true per-user counts
    closed_windows = {ws for ws, _, _ in streamed}
    truth: dict[str, int] = {}
    for _, ts, uid, _, _ in rows:
        ws = ts.replace(minute=0, second=0, microsecond=0)
        if ws in closed_windows:
            truth[str(uid)] = truth.get(str(uid), 0) + 1
    merged = merge_cm_windows(closed)
    items = spark.createDataFrame([(u,) for u in truth], "item string")
    est = {r["item"]: r["cm_estimate"]
           for r in cm_estimate(merged, items, width=16).collect()}
    assert est and all(est[u] >= c for u, c in truth.items())
    closed.unpersist()


def test_session_window_streaming_matches_batch_for_closed_sessions(spark, tmp_path):
    """Native session_window: one definition, two modes — every session the
    watermark closed in the append-mode stream must equal the same user's
    session from the batch run, including the half-open end bound."""
    import datetime as dt
    import glob
    import os
    import random
    import shutil

    from wolf_quake_spark.streaming.windowed import session_window_rollup

    rng = random.Random(23)
    base = dt.datetime(2024, 3, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = []
    for i in range(300):
        # bursts with inter-burst quiet gaps so sessions actually close
        burst = i // 30
        rows.append(
            (i,
             base + dt.timedelta(minutes=burst * 120 + rng.randrange(0, 25)),
             rng.randrange(6),
             "click",
             round(rng.uniform(0, 50), 2))
        )
    rows.sort(key=lambda r: r[1])
    landing = tmp_path / "sw_landing"
    landing.mkdir()
    for i in range(3):
        chunk = rows[i * 100:(i + 1) * 100]
        st = str(tmp_path / f"sw{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(st)
        dst = str(landing / f"f{i}.parquet")
        shutil.copyfile(glob.glob(st + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        session_window_rollup(stream, gap="30 minutes", delay="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sw_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"],
                                             r["first_event_id"], r["value_cents"])
        for r in spark.table("sw_parity").collect()
    }
    assert streamed  # at least one session closed

    batch = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"],
                                             r["first_event_id"], r["value_cents"])
        for r in session_window_rollup(
            spark.createDataFrame(rows, schema), gap="30 minutes", delay="30 minutes"
        ).collect()
    }
    for key, vals in streamed.items():
        assert batch[key] == vals


def test_session_window_exact_gap_boundary_merges(spark):
    """The session end bound is INCLUSIVE: an event at EXACTLY prev_ts +
    gap still extends the session; one microsecond later starts a new one —
    the boundary the registry oracle's strict-> comparison encodes."""
    import datetime as dt

    from wolf_quake_spark.streaming.windowed import session_window_rollup

    base = dt.datetime(2024, 3, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = [
        (0, base, 1, "click", 1.0),
        (1, base + dt.timedelta(minutes=30), 1, "click", 1.0),  # == gap: merges
        (2, base + dt.timedelta(minutes=60, microseconds=1), 1, "click", 1.0),  # > gap: new
    ]
    out = session_window_rollup(
        spark.createDataFrame(rows, schema), gap="30 minutes"
    ).orderBy("session_start").collect()
    assert [r["n_events"] for r in out] == [2, 1]
    assert out[0]["session_end"] == base + dt.timedelta(minutes=60)
    assert out[1]["session_start"] == base + dt.timedelta(minutes=60, microseconds=1)
