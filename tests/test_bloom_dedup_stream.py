"""Bloom-state streaming dedup: cross-horizon duplicates are dropped
forever in bounded state (the property watermark dedup can't give),
batch face agrees with the stream, and false positives only ever DROP
extra rows — a duplicate is never kept."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from wolf_quake_spark.streaming.bloom_dedup import _positions, bloom_dedup_stream
from wolf_quake_spark.streaming.dedup import dedup_stream

SCHEMA = "doc_id long, ts timestamp, text string"
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _land(spark, tmp_path, landing, rows, name, mtime):
    tmp = str(tmp_path / f"stage_{name}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = str(landing / name)
    shutil.copyfile(part, dst)
    os.utime(dst, (mtime, mtime))


def test_cross_horizon_dup_dropped_and_batch_parity(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    week = dt.timedelta(days=7)
    _land(
        spark, tmp_path, landing,
        [(1, BASE, "hello world"), (2, BASE, "unrelated doc")],
        "f1.parquet", 1_700_000_000,
    )
    # a WEEK later (far past any reasonable watermark horizon): exact dup,
    # normalized dup, and a new doc
    _land(
        spark, tmp_path, landing,
        [
            (3, BASE + week, "hello world"),
            (4, BASE + week, "  HELLO   world "),
            (5, BASE + week, "fresh content"),
        ],
        "f2.parquet", 1_700_000_100,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        bloom_dedup_stream(stream, m_bits=1 << 16, k=3, n_shards=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bloom_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.table("bloom_dedup").collect()}
    assert kept == {1, 2, 5}  # doc 3/4 dropped ACROSS the week gap

    # batch face: same kernel, same duplicate definition
    batch = bloom_dedup_stream(
        spark.read.parquet(str(landing)), m_bits=1 << 16, k=3, n_shards=4
    )
    assert {r["fingerprint"] for r in batch.collect()} == {
        r["fingerprint"] for r in spark.table("bloom_dedup").collect()
    }


def test_false_positives_only_drop_never_keep(spark, tmp_path):
    rows = [(i, BASE + dt.timedelta(minutes=i), f"doc number {i}") for i in range(200)]
    rows += [(1000 + i, BASE + dt.timedelta(minutes=1000 + i), f"doc number {i}") for i in range(50)]
    df = spark.createDataFrame(rows, SCHEMA)
    exact = {r["fingerprint"] for r in dedup_stream(df).collect()}
    # tiny filter (60 bits/shard, 1 shard): heavy collisions guaranteed
    tiny = bloom_dedup_stream(df, m_bits=60, k=2, n_shards=1).collect()
    fps = [r["fingerprint"] for r in tiny]
    assert len(fps) == len(set(fps))  # never keeps the same content twice
    assert set(fps) <= exact  # only drops extra rows, never invents keeps
    assert len(fps) < len(exact)  # and the tiny filter provably collided
    # ample filter: no false positives on this corpus — exact agreement
    ample = bloom_dedup_stream(df, m_bits=1 << 16, k=3, n_shards=4).collect()
    assert {r["fingerprint"] for r in ample} == exact


def test_positions_stable_and_in_range():
    fp = "0123456789abcdeffedcba9876543210"
    pos = _positions(fp, 1 << 16, 4)
    assert pos == _positions(fp, 1 << 16, 4)
    assert all(0 <= p < 1 << 16 for p in pos)
    assert len(set(_positions(fp, 1 << 30, 4))) == 4  # slices differ
