"""Streaming → snapshot-table sink: exactly-once across restarts and
replayed epochs, append vs merge modes, snapshot isolation of commits."""

from __future__ import annotations

import pytest

from wolf_quake_spark.plans.snapshots import read_snapshot
from wolf_quake_spark.plans.snapshots import _load as snap_state
from wolf_quake_spark.streaming.snapshot_sink import (
    make_snapshot_sink,
    run_stream_to_snapshot,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", x, None, None) for c, t, x in rows], SCHEMA
    )


def _rows(df):
    return {tuple(r) for r in df.select("conv_id", "turn_idx", "text").collect()}


def test_stream_restart_ingests_each_file_once(spark, tmp_path):
    land = str(tmp_path / "land")
    tbl = str(tmp_path / "tbl")
    _mk(spark, [("c1", 0, "a"), ("c1", 1, "b")]).coalesce(1).write.mode(
        "append"
    ).parquet(land)

    run_stream_to_snapshot(spark, land, tbl, ["conv_id", "turn_idx"])
    assert _rows(read_snapshot(spark, tbl)) == {("c1", 0, "a"), ("c1", 1, "b")}

    # land more files, restart with the same checkpoint: only the new file
    # is ingested; a third run with nothing new commits nothing
    _mk(spark, [("c2", 0, "c")]).coalesce(1).write.mode("append").parquet(land)
    run_stream_to_snapshot(spark, land, tbl, ["conv_id", "turn_idx"])
    assert _rows(read_snapshot(spark, tbl)) == {
        ("c1", 0, "a"),
        ("c1", 1, "b"),
        ("c2", 0, "c"),
    }
    n_snaps = len(snap_state(tbl)["snapshots"])
    run_stream_to_snapshot(spark, land, tbl, ["conv_id", "turn_idx"])
    assert len(snap_state(tbl)["snapshots"]) == n_snaps


def test_replayed_epoch_is_skipped(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    process = make_snapshot_sink(spark, tbl, ["conv_id", "turn_idx"])
    batch = _mk(spark, [("c1", 0, "a")])
    process(batch, 0)
    process(batch, 0)  # crash-window replay of the same epoch
    assert _rows(read_snapshot(spark, tbl)) == {("c1", 0, "a")}
    state = snap_state(tbl)
    assert len(state["snapshots"]) == 1
    assert state["stream_epochs"]["transcripts"] == 0
    # the next epoch commits normally
    process(_mk(spark, [("c1", 1, "b")]), 1)
    assert _rows(read_snapshot(spark, tbl)) == {("c1", 0, "a"), ("c1", 1, "b")}


def test_merge_mode_upserts_per_epoch(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    process = make_snapshot_sink(spark, tbl, ["conv_id", "turn_idx"], mode="merge")
    process(_mk(spark, [("c1", 0, "a"), ("c1", 1, "b")]), 0)
    # epoch 1: late fixup of (c1,0) plus a new turn — upsert, not duplicate
    process(_mk(spark, [("c1", 0, "a-v2"), ("c2", 0, "c")]), 1)
    assert _rows(read_snapshot(spark, tbl)) == {
        ("c1", 0, "a-v2"),
        ("c1", 1, "b"),
        ("c2", 0, "c"),
    }
    # replay of the merge epoch is also a no-op
    process(_mk(spark, [("c1", 0, "a-v2"), ("c2", 0, "c")]), 1)
    assert len(snap_state(tbl)["snapshots"]) == 2


def test_bad_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        make_snapshot_sink(spark, str(tmp_path / "t"), ["conv_id"], mode="upsert")


def test_epoch_retries_through_held_lock(spark, tmp_path):
    import os
    import threading

    from wolf_quake_spark.plans.snapshots import COMMIT_LOCK

    tbl = str(tmp_path / "tbl")
    process = make_snapshot_sink(spark, tbl, ["conv_id", "turn_idx"])
    process(_mk(spark, [("c1", 0, "a")]), 0)

    # a maintenance job briefly holds the writer lock; the epoch must
    # wait it out instead of failing the streaming query
    os.makedirs(tbl, exist_ok=True)
    lock = os.path.join(tbl, COMMIT_LOCK)
    with open(lock, "w") as fh:
        fh.write("maint")
    t = threading.Timer(0.5, os.unlink, args=[lock])
    t.start()
    try:
        process(_mk(spark, [("c2", 0, "b")]), 1)
    finally:
        t.cancel()
    assert _rows(read_snapshot(spark, tbl)) == {("c1", 0, "a"), ("c2", 0, "b")}


def test_stream_onto_branch_then_fast_forward(spark, tmp_path):
    """Audited streaming backfill: epochs land on a branch (exactly-once
    as usual), main is untouched until fast_forward publishes the line."""
    from wolf_quake_spark.plans.snapshots import (
        create_branch,
        create_table,
        fast_forward,
        read_branch,
    )

    land = str(tmp_path / "land")
    tbl = str(tmp_path / "tbl")
    create_table(_mk(spark, [("c1", 0, "a")]).coalesce(1), tbl, ["conv_id", "turn_idx"])
    create_branch(tbl, "backfill")
    _mk(spark, [("c2", 0, "b"), ("c3", 0, "c")]).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_stream_to_snapshot(
        spark, land, tbl, ["conv_id", "turn_idx"], branch="backfill"
    )
    assert _rows(read_snapshot(spark, tbl)) == {("c1", 0, "a")}  # main untouched
    assert _rows(read_branch(spark, tbl, "backfill")) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c"),
    }
    fast_forward(tbl, "backfill")
    assert _rows(read_snapshot(spark, tbl)) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c"),
    }
    # branch-targeted sink on an uninitialized table is rejected
    process = make_snapshot_sink(
        spark, str(tmp_path / "empty"), ["conv_id", "turn_idx"], branch="x"
    )
    with pytest.raises(ValueError):
        process(_mk(spark, [("c9", 0, "z")]), 0)
