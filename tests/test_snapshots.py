"""Snapshot table (plans/snapshots.py): copy-on-write MERGE rewrites only
affected files, time travel, snapshot expiry + orphan GC, and the
write-audit-publish staging flow."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.plans.snapshots import (
    append,
    audit,
    create_table,
    drop_staged,
    expire_snapshots,
    gc_orphans,
    merge_cow,
    publish,
    read_snapshot,
    stage_append,
)

SCHEMA = "conv_id string, turn_idx int, text string"


def _rows(df):
    return {tuple(r) for r in df.select("conv_id", "turn_idx", "text").collect()}


def _data_files(table_dir):
    return sorted(
        f for f in os.listdir(os.path.join(table_dir, "data")) if f.endswith(".parquet")
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    """Two single-file commits so the file→key mapping is deterministic:
    file A holds c1/c2 (snapshot 1), file B holds c3/c4 (snapshot 2)."""
    out = str(tmp_path / "tbl")
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA).coalesce(1)  # noqa: E731
    create_table(mk([("c1", 0, "a"), ("c2", 0, "b")]), out, ["conv_id", "turn_idx"])
    append(mk([("c3", 0, "c"), ("c4", 0, "d")]), out)
    return out, mk


def test_create_append_read(spark, tbl):
    out, _ = tbl
    assert _rows(read_snapshot(spark, out)) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c"),
        ("c4", 0, "d"),
    }
    # snapshot 1 predates the append
    assert _rows(read_snapshot(spark, out, 1)) == {("c1", 0, "a"), ("c2", 0, "b")}


def test_merge_upserts_and_rewrites_only_affected_files(spark, tbl):
    out, mk = tbl
    # c3 exists (update), c9 doesn't (insert) — both keys live in file B
    res = merge_cow(spark, out, mk([("c3", 0, "c-v2"), ("c9", 0, "new")]))
    assert res["rewritten"] == 1  # file B only
    assert res["kept"] == 1  # file A carried by reference
    # file A ([c1,c2]) is disjoint from the source bounds [c3,c9] on
    # conv_id, so footer stats pruned it before any scan
    assert res["stats_pruned"] == 1
    assert _rows(read_snapshot(spark, out)) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c-v2"),
        ("c4", 0, "d"),
        ("c9", 0, "new"),
    }
    # time travel: the pre-merge snapshot still reads the old value
    assert ("c3", 0, "c") in _rows(read_snapshot(spark, out, 2))


def test_merge_with_no_matches_is_pure_insert(spark, tbl):
    out, mk = tbl
    res = merge_cow(spark, out, mk([("c8", 1, "x")]))
    assert res["rewritten"] == 0
    assert ("c8", 1, "x") in _rows(read_snapshot(spark, out))


def test_expire_then_gc_reclaims_unshared_files_only(spark, tbl):
    out, mk = tbl
    merge_cow(spark, out, mk([("c3", 0, "c-v2")]))  # snapshot 3 rewrites file B
    before = set(_data_files(out))
    expired = expire_snapshots(out, keep_last=1)
    assert expired == [1, 2]
    removed = gc_orphans(out)
    # old file B (referenced only by snapshots 1-2) is gone; file A is
    # shared with the current snapshot and must survive.  Snapshot 2's
    # now-unreferenced fragment manifest is reclaimed alongside it.
    removed_parquet = [f for f in removed if f.endswith(".parquet")]
    assert len(removed_parquet) == 1
    assert set(_data_files(out)) == before - set(removed_parquet)
    assert _rows(read_snapshot(spark, out)) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c-v2"),
        ("c4", 0, "d"),
    }
    with pytest.raises(KeyError):
        read_snapshot(spark, out, 1)


def test_wap_staged_invisible_until_publish(spark, tbl):
    out, mk = tbl
    live_before = _rows(read_snapshot(spark, out))
    sid = stage_append(mk([("c5", 0, "e")]), out)
    assert _rows(read_snapshot(spark, out)) == live_before  # still invisible
    assert ("c5", 0, "e") in _rows(read_snapshot(spark, out, sid))  # by id: visible

    rep = audit(
        spark,
        out,
        sid,
        [lambda df: df.count() == 5, lambda df: df.where(F.col("text").isNull()).count() == 0],
    )
    assert rep["passed"]
    assert len(rep["results"]) == 2
    publish(out, sid)
    assert ("c5", 0, "e") in _rows(read_snapshot(spark, out))
    with pytest.raises(ValueError):
        publish(out, sid)  # double-publish guard


def test_wap_failed_audit_drops_and_gc_reclaims(spark, tbl):
    out, mk = tbl
    live_before = _rows(read_snapshot(spark, out))
    files_before = set(_data_files(out))
    sid = stage_append(mk([("c6", 0, None)]), out)

    def no_null_text(df):
        return df.where(F.col("text").isNull()).count() == 0

    # two checks, the FIRST failing: index-prefixed names keep both
    # results visible (same-named lambdas must not collapse to one key)
    rep = audit(spark, out, sid, [no_null_text, lambda df: df.count() > 0])
    assert not rep["passed"]
    assert rep["results"]["0:no_null_text"] is False
    assert rep["results"]["1:<lambda>"] is True
    drop_staged(out, sid)
    removed = gc_orphans(out)
    # the staged data file (plus its orphaned fragment manifest), nothing else
    assert len([f for f in removed if f.endswith(".parquet")]) == 1
    assert set(_data_files(out)) == files_before
    assert _rows(read_snapshot(spark, out)) == live_before


def test_changelog_scan_between_snapshots(spark, tbl):
    from wolf_quake_spark.plans.snapshots import snapshot_changes

    out, mk = tbl
    merge_cow(spark, out, mk([("c3", 0, "c-v2"), ("c9", 0, "new")]))  # snap 3
    got = {
        (r["_change_type"], r["conv_id"], r["turn_idx"], r["text"])
        for r in snapshot_changes(spark, out, 2, 3).collect()
    }
    # survivor c4 was rewritten unchanged into the new file — it cancels
    assert got == {
        ("update_before", "c3", 0, "c"),
        ("update_after", "c3", 0, "c-v2"),
        ("insert", "c9", 0, "new"),
    }
    # append-only delta is pure inserts; same-snapshot delta is empty;
    # reversed direction flips to deletes
    ins = {
        (r["_change_type"], r["conv_id"])
        for r in snapshot_changes(spark, out, 1, 2).collect()
    }
    assert ins == {("insert", "c3"), ("insert", "c4")}
    assert snapshot_changes(spark, out, 3, 3).count() == 0
    rev = {
        (r["_change_type"], r["conv_id"])
        for r in snapshot_changes(spark, out, 2, 1).collect()
    }
    assert rev == {("delete", "c3"), ("delete", "c4")}


def test_rewrite_small_files_is_row_and_cdc_invariant(spark, tbl):
    from wolf_quake_spark.plans.snapshots import (
        rewrite_small_files,
        snapshot_changes,
    )

    out, mk = tbl
    append(mk([("c5", 0, "e")]), out)  # third small file (snap 3)
    before = _rows(read_snapshot(spark, out))
    rep = rewrite_small_files(spark, out)  # all three files are tiny
    assert rep["rewritten"] == 3
    assert rep["added"] == 1  # bin-packed into one file
    assert _rows(read_snapshot(spark, out)) == before
    # a pure rewrite produces an EMPTY changelog — every copy cancels
    assert snapshot_changes(spark, out, 3, rep["snapshot_id"]).count() == 0
    # time travel to the pre-rewrite snapshot still reads the old files
    assert _rows(read_snapshot(spark, out, 3)) == before
    # idempotence: one consolidated file left below target → no-op
    rep2 = rewrite_small_files(spark, out)
    assert rep2["rewritten"] == 0


def test_tags_pin_retention_and_read(spark, tbl):
    from wolf_quake_spark.plans.snapshots import create_tag, drop_tag, read_tag

    out, mk = tbl
    create_tag(out, "release-1")  # tags snapshot 2 (current)
    merge_cow(spark, out, mk([("c3", 0, "c-v2")]))  # snapshot 3
    expired = expire_snapshots(out, keep_last=1)
    assert expired == [1]  # snapshot 2 survives: tagged
    gc_orphans(out)
    assert _rows(read_tag(spark, out, "release-1")) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c"),
        ("c4", 0, "d"),
    }
    with pytest.raises(ValueError):
        create_tag(out, "release-1")  # duplicate tag
    assert drop_tag(out, "release-1") == 2
    assert expire_snapshots(out, keep_last=1) == [2]  # expirable again
    with pytest.raises(KeyError):
        read_tag(spark, out, "release-1")


def test_gc_cleans_crashed_staging_dirs(spark, tbl):
    out, _ = tbl
    os.makedirs(os.path.join(out, "_staging_99", "sub"), exist_ok=True)
    removed = gc_orphans(out)
    assert "_staging_99/" in removed
    assert not os.path.exists(os.path.join(out, "_staging_99"))
    # live data untouched
    assert len(_rows(read_snapshot(spark, out))) == 4


def test_commit_lock_conflict_and_force_unlock(spark, tbl):
    from wolf_quake_spark.plans.snapshots import (
        COMMIT_LOCK,
        CommitConflict,
        force_unlock,
    )

    out, mk = tbl
    # simulate a concurrent (or crashed) writer holding the lock
    with open(os.path.join(out, COMMIT_LOCK), "w") as fh:
        fh.write("99999")
    with pytest.raises(CommitConflict):
        append(mk([("c7", 0, "x")]), out)
    assert _rows(read_snapshot(spark, out)) == {  # readers never lock
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c"),
        ("c4", 0, "d"),
    }
    assert force_unlock(out) is True
    append(mk([("c7", 0, "x")]), out)  # lock released → commit succeeds
    assert ("c7", 0, "x") in _rows(read_snapshot(spark, out))
    assert not os.path.exists(os.path.join(out, COMMIT_LOCK))


def test_changes_since_consumes_each_commit_once(spark, tbl):
    from wolf_quake_spark.plans.snapshots import changes_since

    out, mk = tbl
    # from the beginning: snapshot 1 surfaces as inserts, snapshot 2's
    # append as inserts too
    df, wm = changes_since(spark, out, None)
    assert wm == 2
    got = {(r["_change_type"], r["conv_id"]) for r in df.collect()}
    assert got == {("insert", c) for c in ("c1", "c2", "c3", "c4")}
    # nothing new → (None, watermark)
    assert changes_since(spark, out, wm) == (None, 2)
    # one merge later: exactly that commit's delta
    merge_cow(spark, out, mk([("c3", 0, "c-v2")]))
    df2, wm2 = changes_since(spark, out, wm)
    assert wm2 == 3
    got2 = {(r["_change_type"], r["conv_id"], r["text"]) for r in df2.collect()}
    assert got2 == {
        ("update_before", "c3", "c"),
        ("update_after", "c3", "c-v2"),
    }
    with pytest.raises(KeyError):
        changes_since(spark, out, 99)


def test_publish_rejects_stale_staged_snapshot(spark, tbl):
    """A commit landing between stage and publish must fail the publish
    (Iceberg commit validation): the staged file list was built on the old
    base, so flipping to it would silently drop the intervening commit."""
    from wolf_quake_spark.plans.snapshots import CommitConflict

    out, mk = tbl
    sid = stage_append(mk([("c5", 0, "e")]), out)
    append(mk([("c6", 0, "f")]), out)  # intervening commit advances the table
    with pytest.raises(CommitConflict):
        publish(out, sid)
    # the intervening commit's rows are still live, the stale stage isn't
    live = _rows(read_snapshot(spark, out))
    assert ("c6", 0, "f") in live and ("c5", 0, "e") not in live
    # recovery path: re-stage on the new base, audit, publish
    drop_staged(out, sid)
    sid2 = stage_append(mk([("c5", 0, "e")]), out)
    publish(out, sid2)
    live = _rows(read_snapshot(spark, out))
    assert ("c5", 0, "e") in live and ("c6", 0, "f") in live


def test_changes_since_spans_schema_evolution(spark, tbl):
    """A column ADDed mid-history must not break the per-commit union:
    earlier steps read the new column as NULL (allowMissingColumns)."""
    from wolf_quake_spark.plans.snapshots import changes_since

    out, mk = tbl
    wider = spark.createDataFrame(
        [("c5", 0, "e", "en")], SCHEMA + ", lang string"
    ).coalesce(1)
    append(wider, out)  # snapshot 3 adds `lang`
    df, wm = changes_since(spark, out, None)
    assert wm == 3
    got = {(r["_change_type"], r["conv_id"], r["lang"]) for r in df.collect()}
    assert got == {("insert", c, None) for c in ("c1", "c2", "c3", "c4")} | {
        ("insert", "c5", "en")
    }


def test_sort_rewrite_reclusters_for_stats_pruning(spark, tmp_path):
    from wolf_quake_spark.plans.snapshots import (
        _load as _state,
        rewrite_small_files,
        snapshot_changes,
    )

    out = str(tmp_path / "tbl")
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA).coalesce(1)  # noqa: E731
    # interleaved key ranges: file A holds c1/c3, file B holds c2/c4 —
    # footer stats overlap, so nothing prunes
    create_table(mk([("c1", 0, "a"), ("c3", 0, "c")]), out, ["conv_id", "turn_idx"])
    append(mk([("c2", 0, "b"), ("c4", 0, "d")]), out)
    # source bounds [c1,c2] straddle BOTH interleaved files' stats
    res0 = merge_cow(spark, out, mk([("c1", 0, "a-v1"), ("c2", 0, "b-v1")]))
    assert res0["stats_pruned"] == 0  # overlapping layout: no pruning

    data = os.path.join(out, "data")
    total = sum(os.path.getsize(os.path.join(data, f)) for f in _data_files(out))
    rep = rewrite_small_files(
        spark, out, target_bytes=(total + 1) // 2, strategy="sort"
    )
    assert rep["added"] == 2
    # sort rewrite is still CDC-invariant
    assert snapshot_changes(spark, out, 3, rep["snapshot_id"]).count() == 0
    # output files now carry disjoint conv_id ranges (entry stats ride
    # the fragment manifests, resolved via the public accessor)
    from wolf_quake_spark.plans.snapshots import file_column_stats

    stats = file_column_stats(out, rep["snapshot_id"])
    new = _snap_files(out, rep["snapshot_id"])
    ranges = [stats[f]["conv_id"] for f in new]
    ranges.sort()
    assert ranges[0][1] < ranges[1][0]  # hi(file1) < lo(file2)
    # and the re-clustered layout prunes the same-bounds merge
    res1 = merge_cow(spark, out, mk([("c1", 0, "a-v2"), ("c2", 0, "b-v2")]))
    assert res1["stats_pruned"] == 1


def _snap_files(table_dir, sid):
    from wolf_quake_spark.plans.snapshots import snapshot_files

    return snapshot_files(table_dir, sid)


def test_schema_evolution_add_column(spark, tbl):
    from wolf_quake_spark.plans.snapshots import merge_cow as _merge

    out, mk = tbl
    widened = spark.createDataFrame(
        [("c5", 0, "e", "grenade")], SCHEMA + ", tool string"
    ).coalesce(1)
    append(widened, out)  # snapshot 3 adds a nullable column
    cur = read_snapshot(spark, out)
    assert "tool" in cur.columns
    got = {(r["conv_id"], r["tool"]) for r in cur.collect()}
    # old files read the new column as NULL
    assert got == {("c1", None), ("c2", None), ("c3", None), ("c4", None), ("c5", "grenade")}
    # time travel to snapshot 2 sees the schema OF ITS ERA (no tool column)
    assert "tool" not in read_snapshot(spark, out, 2).columns
    # a writer may OMIT an optional column (fills NULL on read)
    append(mk([("c6", 0, "f")]), out)
    assert ("c6", None) in {
        (r["conv_id"], r["tool"]) for r in read_snapshot(spark, out).collect()
    }
    # merge with the narrow schema still writes the full current schema
    _merge(spark, out, mk([("c5", 0, "e-v2")]))
    got2 = {(r["conv_id"], r["text"], r["tool"]) for r in read_snapshot(spark, out).collect()}
    assert ("c5", "e-v2", None) in got2  # update overwrote the whole row


def test_schema_evolution_rejects_type_conflict_and_missing_key(spark, tbl):
    out, _ = tbl
    bad_type = spark.createDataFrame(
        [("c9", "zero", "x")], "conv_id string, turn_idx string, text string"
    )
    with pytest.raises(ValueError, match="type conflict"):
        append(bad_type, out)
    no_key = spark.createDataFrame([("only-text",)], "text string")
    with pytest.raises(ValueError, match="missing key column"):
        append(no_key, out)


def test_pipeline_snapshot_sinks_match_parquet_mode(spark, tmp_path):
    from wolf_quake_spark.datagen import synth_transcripts
    from wolf_quake_spark.plans.pipeline import run_resumable
    from wolf_quake_spark.plans.snapshots import _load as _state
    from wolf_quake_spark.sources.catalog import SinkCatalog

    src = str(tmp_path / "in")
    synth_transcripts(spark, n_convs=8).repartition(4, "conv_id").write.parquet(src)

    m_pq = run_resumable(spark, src, str(tmp_path / "pq"), files_per_batch=2)
    m_sn = run_resumable(
        spark, src, str(tmp_path / "sn"), files_per_batch=2, table_format="snapshot"
    )
    assert m_sn.totals() == m_pq.totals()  # identical per-sink counts

    # sink content matches too (kills sink, full row set)
    cat_pq = SinkCatalog(spark, str(tmp_path / "pq"))
    cat_sn = SinkCatalog(spark, str(tmp_path / "sn"), table_format="snapshot")
    rows = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert rows(cat_sn.read("kills")) == rows(cat_pq.read("kills"))

    # one snapshot per batch per sink, each batch in the ledger
    st = _state(str(tmp_path / "sn") + "/kills")
    assert len(st["snapshots"]) == len(m_sn.completed)
    assert set(st["batches"]) == m_sn.completed

    # resume: a second run skips everything (manifest) and appends nothing
    m_again = run_resumable(
        spark, src, str(tmp_path / "sn"), files_per_batch=2, table_format="snapshot"
    )
    assert m_again.totals() == m_pq.totals()
    assert len(_state(str(tmp_path / "sn") + "/kills")["snapshots"]) == len(
        m_sn.completed
    )

    # crash-window replay: write_batch_counted on an already-committed batch
    # appends nothing and still reports the committed count
    bid = sorted(m_sn.completed)[0]
    df = cat_sn.read_batch("kills", bid)
    n = cat_sn.write_batch_counted(df, "kills", bid)
    assert n == cat_sn.read_batch("kills", bid).count()
    assert len(_state(str(tmp_path / "sn") + "/kills")["snapshots"]) == len(
        m_sn.completed
    )


def test_fragment_manifests_keep_commit_metadata_bounded(spark, tbl):
    """The head log never inlines file lists: each commit writes one
    fragment naming only its ADDED files, and a COW merge tombstones
    rather than rewriting the inherited chain — per-commit metadata is
    O(added + removed), not O(table files)."""
    import json as _json

    from wolf_quake_spark.plans.snapshots import _chain, _load as _state

    out, mk = tbl
    merge_cow(spark, out, mk([("c3", 0, "c-v2")]))  # rewrites file B
    st = _state(out)
    by_id = {s["id"]: s for s in st["snapshots"]}
    # no snapshot entry inlines a file list or even the fragment chain —
    # the head-log row holds one manifest-list name (O(1) per commit)
    assert all(
        "files" not in s and "manifests" not in s and "manifest_list" in s
        for s in st["snapshots"]
    )
    chains = {i: _chain(out, s) for i, s in by_id.items()}
    # append (snapshot 2) added exactly one fragment to the chain
    assert len(chains[2][0]) == len(chains[1][0]) + 1
    # each fragment names only its commit's added files (1 here)
    with open(os.path.join(out, "metadata", chains[2][0][-1])) as fh:
        assert len(_json.load(fh)["files"]) == 1
    # the merge tombstoned old file B; since B's fragment became fully
    # dead it was dropped from the chain and the tombstone list shrank
    # back to empty (bounded by live fragments, not history)
    assert chains[3][1] == []
    assert len(chains[3][0]) == 2  # file A's fragment + merge's
    # resolution still exact
    assert _rows(read_snapshot(spark, out)) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c-v2"),
        ("c4", 0, "d"),
    }


def test_gc_reclaims_orphan_fragments(spark, tbl):
    out, mk = tbl
    merge_cow(spark, out, mk([("c3", 0, "c-v2")]))
    expire_snapshots(out, keep_last=1)
    removed = gc_orphans(out)
    # snapshot 1/2's now-unreferenced fragments + manifest lists are
    # reclaimed alongside the dead data file
    assert any(r.startswith("metadata/manifest-") for r in removed)
    assert any(r.startswith("metadata/snap-") for r in removed)
    sn_mod = __import__("wolf_quake_spark.plans.snapshots", fromlist=["_load"])
    live = set()
    for s in sn_mod._load(out)["snapshots"]:
        live.add(s["manifest_list"])
        live.update(sn_mod._chain(out, s)[0])
    on_disk = set(os.listdir(os.path.join(out, "metadata")))
    assert on_disk == live
    assert _rows(read_snapshot(spark, out)) == {
        ("c1", 0, "a"),
        ("c2", 0, "b"),
        ("c3", 0, "c-v2"),
        ("c4", 0, "d"),
    }


def test_legacy_inline_files_table_upgrades_on_first_commit(spark, tbl, tmp_path):
    """A pre-fragment table (inline ``files`` lists) stays readable, and
    its first new commit materializes a legacy fragment instead of
    carrying inline lists forward."""
    from wolf_quake_spark.plans.snapshots import _dump, _load as _state

    out, mk = tbl
    # rewrite the log into the OLD layout
    st = _state(out)
    for s in st["snapshots"]:
        s["files"] = _snap_files(out, s["id"])
        s.pop("manifests", None)
        s.pop("removed", None)
        s.pop("manifest_list", None)
    _dump(out, st)
    before = _rows(read_snapshot(spark, out))  # old layout still reads
    append(mk([("c7", 0, "g")]), out)
    st = _state(out)
    new = next(s for s in st["snapshots"] if s["id"] == 3)
    from wolf_quake_spark.plans.snapshots import _chain

    assert "files" not in new
    assert any("legacy" in m for m in _chain(out, new)[0])
    assert _rows(read_snapshot(spark, out)) == before | {("c7", 0, "g")}


def test_changes_on_keyless_table_are_pure_inserts_deletes(spark, tmp_path):
    """Pipeline sink tables are created with key_cols=[] — the changelog
    must still work, labeling the bag difference insert/delete (no key
    identity, so no update pairing)."""
    from wolf_quake_spark.plans.snapshots import changes_since, snapshot_changes

    out = str(tmp_path / "tbl")
    mk = lambda rows: spark.createDataFrame(rows, "a string, b int").coalesce(1)  # noqa: E731
    create_table(mk([("x", 1)]), out, [])
    append(mk([("y", 2)]), out)
    got = {
        (r["_change_type"], r["a"], r["b"])
        for r in snapshot_changes(spark, out, 1, 2).collect()
    }
    assert got == {("insert", "y", 2)}
    rev = {
        (r["_change_type"], r["a"])
        for r in snapshot_changes(spark, out, 2, 1).collect()
    }
    assert rev == {("delete", "y")}
    df, wm = changes_since(spark, out, None)
    assert wm == 2 and df.count() == 2


def test_entry_stats_ride_fragments_not_head_log(spark, tbl):
    """Per-file pruning bounds are Iceberg manifest-entry stats: embedded
    in the immutable fragments, never accumulated in the per-commit-
    rewritten head log (which would make every commit O(table files))."""
    from wolf_quake_spark.plans.snapshots import (
        _load as _state,
        file_column_stats,
    )

    out, mk = tbl
    merge_cow(spark, out, mk([("c3", 0, "c-v2")]))
    assert _state(out)["file_stats"] == {}  # head log carries none
    stats = file_column_stats(out, 3)
    assert set(stats) == set(_snap_files(out, 3))
    assert all("conv_id" in s and "turn_idx" in s for s in stats.values())


def test_history_metadata_table(spark, tbl):
    from wolf_quake_spark.plans.snapshots import create_tag, history

    out, mk = tbl
    merge_cow(spark, out, mk([("c3", 0, "c-v2")]))
    create_tag(out, "release-1", 2)
    sid = stage_append(mk([("c5", 0, "e")]), out)
    rows = history(out)
    assert [r["id"] for r in rows] == [1, 2, 3, sid]
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["operation"] == "create" and by_id[1]["parent"] is None
    assert by_id[2]["tags"] == ["release-1"]
    assert by_id[3]["operation"] == "merge" and by_id[3]["is_current"]
    assert by_id[sid]["staged"] and not by_id[sid]["is_current"]
    assert by_id[3]["n_files"] == len(_snap_files(out, 3))
    assert by_id[3]["summary"]["rewritten"] == 1


def test_scan_where_prunes_files_by_entry_stats(spark, tbl):
    """Read-side scan planning over the manifest-entry bounds: a range
    read on the key column skips files whose recorded [min, max] is
    disjoint, and the residual filter keeps the result exact."""
    from wolf_quake_spark.plans.snapshots import scan_where

    out, mk = tbl
    # file A holds c1/c2, file B holds c3/c4 — disjoint conv_id ranges
    df, rep = scan_where(spark, out, "conv_id", "c1", "c2")
    assert rep == {"files_total": 2, "files_read": 1, "files_pruned": 1}
    assert _rows(df) == {("c1", 0, "a"), ("c2", 0, "b")}
    # point lookup form
    df2, rep2 = scan_where(spark, out, "conv_id", "c4")
    assert rep2["files_read"] == 1
    assert _rows(df2) == {("c4", 0, "d")}
    # no-intersection range: zero files read, empty typed frame
    df3, rep3 = scan_where(spark, out, "conv_id", "z1", "z9")
    assert rep3["files_read"] == 0 and df3.count() == 0
    # time travel: scan an older snapshot
    df4, rep4 = scan_where(spark, out, "conv_id", "c1", "c2", snapshot_id=1)
    assert rep4["files_total"] == 1 and _rows(df4) == {("c1", 0, "a"), ("c2", 0, "b")}


def test_branch_write_isolate_fast_forward(spark, tbl):
    """Writable branch refs: commits on a branch base on and advance its
    head while main stays put; fast_forward publishes iff main is an
    ancestor of the head (else CommitConflict — main advanced)."""
    from wolf_quake_spark.plans.snapshots import (
        CommitConflict,
        create_branch,
        drop_branch,
        fast_forward,
        history,
        read_branch,
    )

    out, mk = tbl
    main_before = _rows(read_snapshot(spark, out))
    create_branch(out, "audit")
    s1 = append(mk([("c5", 0, "e")]), out, branch="audit")
    s2 = append(mk([("c6", 0, "f")]), out, branch="audit")  # multi-commit line
    # branch sees its commits; main is untouched
    assert _rows(read_branch(spark, out, "audit")) == main_before | {
        ("c5", 0, "e"),
        ("c6", 0, "f"),
    }
    assert _rows(read_snapshot(spark, out)) == main_before
    # parent chain: s2 -> s1 -> main's current
    hist = {r["id"]: r for r in history(out)}
    assert hist[s2]["parent"] == s1 and hist[s1]["parent"] == 2
    assert hist[s2]["branches"] == ["audit"]
    # branch heads pin retention
    assert s2 not in expire_snapshots(out, keep_last=1)
    # publish: fast-forward flips main to the audited head
    assert fast_forward(out, "audit") == s2
    assert _rows(read_snapshot(spark, out)) == main_before | {
        ("c5", 0, "e"),
        ("c6", 0, "f"),
    }
    drop_branch(out, "audit")

    # divergence: main advances after the fork → fast-forward must refuse
    create_branch(out, "stale")  # forks from the new current
    append(mk([("c7", 0, "g")]), out)  # main advances independently
    with pytest.raises(CommitConflict):
        fast_forward(out, "stale")
    # main kept its independent commit
    assert ("c7", 0, "g") in _rows(read_snapshot(spark, out))


def test_merge_on_branch_isolated_until_fast_forward(spark, tbl):
    from wolf_quake_spark.plans.snapshots import (
        create_branch,
        fast_forward,
        read_branch,
    )

    out, mk = tbl
    main_before = _rows(read_snapshot(spark, out))
    create_branch(out, "fixups")
    res = merge_cow(spark, out, mk([("c3", 0, "c-v2")]), branch="fixups")
    assert res["rewritten"] == 1
    assert ("c3", 0, "c-v2") in _rows(read_branch(spark, out, "fixups"))
    assert _rows(read_snapshot(spark, out)) == main_before  # main untouched
    fast_forward(out, "fixups")
    assert ("c3", 0, "c-v2") in _rows(read_snapshot(spark, out))


def test_changes_since_follows_main_ancestry_not_branch_commits(spark, tbl):
    """Unpublished branch commits must NOT leak into main's incremental
    feed; after fast_forward they enter it exactly once as main history."""
    from wolf_quake_spark.plans.snapshots import (
        changes_since,
        create_branch,
        fast_forward,
    )

    out, mk = tbl
    df, wm = changes_since(spark, out, None)
    assert wm == 2 and df.count() == 4
    create_branch(out, "audit")
    bsid = append(mk([("c5", 0, "e")]), out, branch="audit")
    # branch commit invisible to a main consumer
    assert changes_since(spark, out, wm) == (None, 2)
    # a branch id is not a valid main watermark
    with pytest.raises(KeyError):
        changes_since(spark, out, bsid)
    fast_forward(out, "audit")
    df2, wm2 = changes_since(spark, out, wm)
    assert wm2 == bsid
    got = {(r["_change_type"], r["conv_id"]) for r in df2.collect()}
    assert got == {("insert", "c5")}


def test_refs_and_files_metadata_tables(spark, tbl):
    from wolf_quake_spark.plans.snapshots import (
        create_branch,
        create_tag,
        files_table,
        refs,
        snapshot_files,
    )

    out, mk = tbl
    create_tag(out, "release-1", 1)
    create_branch(out, "audit")
    append(mk([("c9", 0, "x")]), out, branch="audit")

    rows = refs(out)
    by_name = {r["name"]: r for r in rows}
    assert by_name["main"] == {"name": "main", "type": "branch", "snapshot_id": 2}
    assert by_name["release-1"] == {"name": "release-1", "type": "tag", "snapshot_id": 1}
    # the branch advanced past main and remembers its fork point
    assert by_name["audit"]["type"] == "branch"
    assert by_name["audit"]["fork_point"] == 2
    assert by_name["audit"]["snapshot_id"] > 2

    frows = files_table(out)  # current = main's head (snapshot 2)
    assert sorted(r["file"] for r in frows) == sorted(snapshot_files(out, 2))
    assert all(r["size_bytes"] > 0 for r in frows)
    # entry stats rode along: the key column's bounds are present per file
    assert all("conv_id" in r["stats"] for r in frows)
    # time travel: snapshot 1 lists only its own file
    f1 = files_table(out, 1)
    assert len(f1) == 1 and f1[0]["file"] == snapshot_files(out, 1)[0]


def test_zorder_rewrite_prunes_both_dimensions(spark, tmp_path):
    """Z-order rewrite: after re-clustering on (a, b), footer/manifest
    stats prune scans on EITHER dimension — including b, which a plain
    key sort leaves scattered — while the view stays row-identical and
    the rewrite's changelog is empty (row-preserving)."""
    import random

    from wolf_quake_spark.plans.snapshots import (
        create_table,
        append,
        read_snapshot,
        rewrite_small_files,
        scan_where,
        snapshot_changes,
    )

    rng = random.Random(7)
    out = str(tmp_path / "zt")
    rows = [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(4000)]
    schema = "doc_id long, a long, b long"
    # 8 scattered single-file commits: every file spans ~the full (a, b) range
    create_table(spark.createDataFrame(rows[:500], schema).coalesce(1), out, ["doc_id"])
    for j in range(1, 8):
        append(spark.createDataFrame(rows[j * 500:(j + 1) * 500], schema).coalesce(1), out)

    # scattered layout: a range predicate on either dim prunes nothing
    _, rep_a0 = scan_where(spark, out, "a", 0, 99)
    assert rep_a0["files_pruned"] == 0

    # small target ⇒ several z-range-partitioned output files, each
    # carrying a tight Morton-curve segment (= tight bounds in BOTH dims)
    info = rewrite_small_files(
        spark, out, target_bytes=16 * 1024, strategy="zorder", zorder_cols=["a", "b"]
    )
    assert info["rewritten"] == 8 and info["added"] >= 3
    # row identity + empty changelog (pure representation change)
    assert read_snapshot(spark, out).count() == 4000
    assert snapshot_changes(spark, out, info["snapshot_id"] - 1, info["snapshot_id"]).count() == 0

    _, rep_a = scan_where(spark, out, "a", 0, 99)
    _, rep_b = scan_where(spark, out, "b", 0, 99)
    assert rep_a["files_total"] > 2
    assert rep_a["files_pruned"] > 0, rep_a  # leading dim prunes
    assert rep_b["files_pruned"] > 0, rep_b  # NON-leading dim prunes too
    df_b, _ = scan_where(spark, out, "b", 0, 99)
    assert df_b.count() == sum(1 for _, _, b in rows if b < 100)  # exact

    import pytest

    with pytest.raises(ValueError):
        rewrite_small_files(spark, out, strategy="zorder", zorder_cols=["a"])
