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
