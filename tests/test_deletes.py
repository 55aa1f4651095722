"""Merge-on-read equality deletes: sequence-number applicability
(deletes only kill older rows; re-inserts survive), max-seq-per-key
folding, broadcast (shuffle-free) read plan, compaction row-identity,
and pinned delete key columns."""

from __future__ import annotations

import os

import pytest

from wolf_quake_spark.plans.deletes import (
    append_data,
    append_equality_deletes,
    compact_deletes,
    read_mor,
)


def _rows(df):
    return {tuple(r) for r in df.select("conv_id", "turn_idx", "text").collect()}


@pytest.fixture()
def tbl(spark, tmp_path):
    out = str(tmp_path / "tbl")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "conv_id string, turn_idx int, text string"
    )
    append_data(mk([("c1", 0, "a"), ("c1", 1, "b"), ("c2", 0, "c")]), out)
    append_data(mk([("c3", 0, "d")]), out)
    return out, mk


def test_delete_kills_older_rows_only(spark, tbl):
    out, mk = tbl
    append_equality_deletes(mk([("c1", 0, "")]).select("conv_id"), out, ["conv_id"])
    got = _rows(read_mor(spark, out))
    assert got == {("c2", 0, "c"), ("c3", 0, "d")}


def test_reinsert_after_delete_survives(spark, tbl):
    out, mk = tbl
    append_equality_deletes(mk([("c1", 0, "")]).select("conv_id"), out, ["conv_id"])
    append_data(mk([("c1", 0, "a-v2")]), out)  # re-insert AFTER the delete
    got = _rows(read_mor(spark, out))
    assert got == {("c2", 0, "c"), ("c3", 0, "d"), ("c1", 0, "a-v2")}
    # a later delete kills the re-insert too (max-seq-per-key)
    append_equality_deletes(mk([("c1", 0, "")]).select("conv_id"), out, ["conv_id"])
    assert _rows(read_mor(spark, out)) == {("c2", 0, "c"), ("c3", 0, "d")}


def test_read_plan_broadcasts_deletes(spark, tbl):
    out, mk = tbl
    append_equality_deletes(mk([("c2", 0, "")]).select("conv_id"), out, ["conv_id"])
    plan = read_mor(spark, out)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_compaction_row_identity_and_cleanup(spark, tbl):
    out, mk = tbl
    append_equality_deletes(mk([("c1", 0, "")]).select("conv_id"), out, ["conv_id"])
    append_data(mk([("c1", 5, "late")]), out)
    before = _rows(read_mor(spark, out))
    report = compact_deletes(spark, out)
    assert report["rows"] == len(before)
    assert not os.path.isdir(os.path.join(out, "deletes"))
    data_dirs = [d for d in os.listdir(os.path.join(out, "data")) if d.startswith("seq=")]
    assert len(data_dirs) == 1
    assert _rows(read_mor(spark, out)) == before
    # table stays writable/deletable after compaction
    append_equality_deletes(mk([("c2", 0, "")]).select("conv_id"), out, ["conv_id"])
    assert _rows(read_mor(spark, out)) == before - {("c2", 0, "c")}


def test_key_cols_pinned(spark, tbl):
    out, mk = tbl
    append_equality_deletes(mk([("c1", 0, "")]).select("conv_id"), out, ["conv_id"])
    with pytest.raises(ValueError):
        append_equality_deletes(
            mk([("c1", 0, "")]).select("conv_id", "turn_idx"),
            out,
            ["conv_id", "turn_idx"],
        )


def test_compaction_crash_windows_recover(spark, tbl, tmp_path):
    import json

    from wolf_quake_spark.plans.deletes import read_mor as _read_mor

    out, mk = tbl
    append_equality_deletes(mk([("c1", 0, "")]).select("conv_id"), out, ["conv_id"])
    before = _rows(read_mor(spark, out))

    # window A: staged orphan, crash BEFORE the journal commit point —
    # recovery discards it and nothing else changes
    data_dir = os.path.join(out, "data")
    spark.createDataFrame([("zzz", 9, "ghost")], "conv_id string, turn_idx int, text string") \
        .write.parquet(os.path.join(data_dir, "_compacting_seq=40"))
    assert _rows(read_mor(spark, out)) == before
    assert not any(d.startswith("_compacting") for d in os.listdir(data_dir))

    # window B/C: verified rewrite staged + journal written, crash before
    # rename/cleanup — any subsequent read rolls the swap FORWARD exactly
    # once (no double-counted survivors, seq log bumped, deletes retired)
    surv = read_mor(spark, out)
    surv.write.parquet(os.path.join(data_dir, "_compacting_seq=50"))
    old_dirs = [d for d in os.listdir(data_dir) if d.startswith("seq=")]
    with open(os.path.join(out, "_compact_journal.json"), "w") as fh:
        json.dump({"new_seq": 50, "old_dirs": old_dirs}, fh)
    got = _rows(read_mor(spark, out))
    assert got == before  # rolled forward, not duplicated
    assert not os.path.exists(os.path.join(out, "_compact_journal.json"))
    assert not os.path.isdir(os.path.join(out, "deletes"))
    assert sorted(d for d in os.listdir(data_dir) if d.startswith("seq=")) == ["seq=50"]
    # seq counter moved past the recovered rewrite: next append can't collide
    append_data(mk([("c9", 0, "post")]), out)
    assert _rows(read_mor(spark, out)) == before | {("c9", 0, "post")}


def test_truncated_journal_recovers_instead_of_wedging(spark, tbl):
    """Window D: a journal truncated mid-write (pre-atomic-write artifact
    or fs corruption).  The swap can't have started (renames happen only
    after the journal commit), so recovery must drop the journal and the
    staged orphan and carry on — one bad file must not wedge every
    subsequent read (the plans/compact.py lesson)."""
    out, mk = tbl
    before = _rows(read_mor(spark, out))
    data_dir = os.path.join(out, "data")
    spark.createDataFrame(
        [("zzz", 9, "ghost")], "conv_id string, turn_idx int, text string"
    ).write.parquet(os.path.join(data_dir, "_compacting_seq=60"))
    with open(os.path.join(out, "_compact_journal.json"), "w") as fh:
        fh.write('{"new_seq": 60, "old_d')  # truncated mid-write
    assert _rows(read_mor(spark, out)) == before  # recovered, not raised
    assert not os.path.exists(os.path.join(out, "_compact_journal.json"))
    assert not any(d.startswith("_compacting") for d in os.listdir(data_dir))
    # and the table is still fully usable afterwards
    res = compact_deletes(spark, out)
    assert res["rows"] == len(before)
