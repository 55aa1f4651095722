"""Materialized IVFADC index (analysis/ann_index): build/search/ingest
split over the hidden-partitioned table layer.

Pins the three contracts the module exists for:

* search through the WRITTEN index is bit-identical to the inline
  ``similarity.ivfpq_search`` (same trained structures, same exact-integer
  ADC), while the scan READS only the probed cells' partitions (manifest
  report + ``cent_id IN`` pushed into the FileScan, no vec_id join);
* encoding vectors against the FROZEN structures reproduces their stored
  codes exactly (the parity that makes incremental ingest trustworthy);
* append touches O(added) manifest entries and the appended rows are
  searchable.

Also covers the two table-layer primitives added for the index:
``pruned_read_points`` (IN-list pruning) and
``append_hidden_partitioned`` (manifest merge).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.ann_index import (
    INDEX_META,
    ivfpq_build_index,
    ivfpq_index_append,
    ivfpq_index_encode,
    ivfpq_index_search,
)
from wolf_quake_spark.analysis.similarity import ivfpq_search
from wolf_quake_spark.plans.partition_transforms import (
    MANIFEST,
    PartitionSpec,
    append_hidden_partitioned,
    pruned_read_points,
    write_hidden_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def qvec(spark):
    from wolf_quake_spark.queries import _query_vec

    return _query_vec(spark, SF_DIR)


@pytest.fixture(scope="module")
def index_dir(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivfpq_index"))
    rep = ivfpq_build_index(emb, d)
    assert rep["codes_partitions"] == rep["n_cells"] > 1
    return d


def test_index_search_bit_identical_to_inline(spark, emb, qvec, index_dir):
    ref = [
        (r["vec_id"], r["adc_d2"])
        for r in ivfpq_search(emb, qvec, n_probes=3, k=10).collect()
    ]
    out = ivfpq_index_search(spark, index_dir, qvec, n_probes=3, k=10)
    got = [(r["vec_id"], r["adc_d2"]) for r in out.collect()]
    assert got == ref
    # pruning evidence: exactly the probed cells were read
    rep = out._wqs_scan_report
    assert rep["partitions_read"] == 3
    assert rep["partitions_read"] < rep["partitions_total"]
    assert rep["rows_in_read_partitions"] < emb.count() * 4  # m=4 codes/vec


def test_index_search_plan_has_no_vecid_join(spark, qvec, index_dir):
    plan = (
        ivfpq_index_search(spark, index_dir, qvec, n_probes=3, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    # the probe set is a pushed-down IN predicate on the codes scan
    assert "cent_id" in plan and " IN " in plan
    # one broadcast LUT join; the only non-broadcast exchange is the final
    # per-candidate aggregation over the pruned rows
    assert plan.count("BroadcastHashJoin") == 1
    non_broadcast = plan.count("Exchange hashpartitioning")
    assert non_broadcast == 1


def test_encode_parity_with_stored_codes(spark, emb, index_dir):
    enc = ivfpq_index_encode(spark, index_dir, emb)
    stored = spark.read.parquet(os.path.join(index_dir, "codes")).select(
        "vec_id", "cent_id", "sub_id", "code_id"
    )
    assert enc.count() == stored.count()
    assert enc.exceptAll(stored).count() == 0
    assert stored.exceptAll(enc).count() == 0


def test_incremental_append_searchable_and_o_added(spark, emb, qvec, tmp_path):
    d = str(tmp_path / "idx")
    old = emb.filter(F.col("vec_id") % 7 != 0)
    new = emb.filter(F.col("vec_id") % 7 == 0)
    ivfpq_build_index(old, d)
    with open(os.path.join(d, "codes", MANIFEST)) as fh:
        before = json.load(fh)
    rep = ivfpq_index_append(spark, d, new)
    assert rep["n"] == emb.count()
    with open(os.path.join(d, "codes", MANIFEST)) as fh:
        after = json.load(fh)
    # manifest merge, not rewrite: same cells (identity spec; new vectors
    # can only land in existing non-empty cells), row counts grew by the
    # appended codes
    assert len(after["partitions"]) == len(before["partitions"])
    n_before = sum(p["n_rows"] for p in before["partitions"])
    n_after = sum(p["n_rows"] for p in after["partitions"])
    assert n_after - n_before == new.count() * 4  # m=4
    # appended rows are searchable: every new vec_id's codes are readable
    # through the pruned path of its own cell
    codes = spark.read.parquet(os.path.join(d, "codes"))
    assert codes.count() == n_after
    out = ivfpq_index_search(spark, d, qvec, n_probes=3, k=10)
    assert out.count() == 10
    # search after append still reads only the probed cells
    assert out._wqs_scan_report["partitions_read"] == 3


def test_append_meta_updated(spark, emb, tmp_path):
    d = str(tmp_path / "idx2")
    ivfpq_build_index(emb.filter(F.col("vec_id") < 400), d)
    with open(os.path.join(d, INDEX_META)) as fh:
        assert json.load(fh)["n"] == 400
    ivfpq_index_append(spark, d, emb.filter(F.col("vec_id") >= 400))
    with open(os.path.join(d, INDEX_META)) as fh:
        assert json.load(fh)["n"] == emb.count()


# --- table-layer primitives -------------------------------------------------


@pytest.fixture()
def keyed_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 5, f"v{i}") for i in range(100)], "id long, cell int, v string"
    )
    d = str(tmp_path / "tbl")
    write_hidden_partitioned(
        df, d, [PartitionSpec("cellp", "cell", F.col("cell"))]
    )
    return d


def test_pruned_read_points_exact(spark, keyed_table):
    df, rep = pruned_read_points(spark, keyed_table, "cell", [1, 3])
    assert rep["partitions_total"] == 5
    assert rep["partitions_read"] == 2
    got = sorted(r["id"] for r in df.collect())
    assert got == sorted(i for i in range(100) if i % 5 in (1, 3))


def test_pruned_read_points_empty(spark, keyed_table):
    df, rep = pruned_read_points(spark, keyed_table, "cell", [99])
    assert rep["partitions_read"] == 0
    assert df.count() == 0


def test_append_hidden_partitioned_merges_stats(spark, tmp_path):
    spec = lambda: [PartitionSpec("cellp", "cell", F.col("cell"))]  # noqa: E731
    d = str(tmp_path / "tbl2")
    base = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, cell int"
    )
    write_hidden_partitioned(base, d, spec())
    extra = spark.createDataFrame(
        [(i, i % 4) for i in range(100, 140)], "id long, cell int"
    )
    man = append_hidden_partitioned(extra, d, spec())
    # cell 3 is new (only i%4==3 rows), cells 0-2 merged
    assert len(man["partitions"]) == 4
    assert sum(p["n_rows"] for p in man["partitions"]) == 70
    # read back: counts per cell equal the union's
    df = spark.read.parquet(d)
    got = {r["cell"]: r["n"] for r in df.groupBy("cell").count().withColumnRenamed("count", "n").collect()}
    want = {}
    for i in range(30):
        want[i % 3] = want.get(i % 3, 0) + 1
    for i in range(100, 140):
        want[i % 4] = want.get(i % 4, 0) + 1
    assert got == want
    # point read on the merged manifest
    sub, rep = pruned_read_points(spark, d, "cell", [3])
    assert rep["partitions_read"] == 1
    assert sub.count() == want[3]


def test_batch_search_equals_single_searches(spark, emb, index_dir):
    from wolf_quake_spark.analysis.ann_index import ivfpq_index_batch_search

    qs = emb.filter(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivfpq_index_batch_search(spark, index_dir, qs, n_probes=3, k=10)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], r["adc_d2"]))
    qrows = qs.collect()
    assert set(got) == {r["qid"] for r in qrows}
    for qr in qrows:
        single = ivfpq_index_search(
            spark, index_dir, list(qr["embedding"]), n_probes=3, k=10
        )
        want = [(r["vec_id"], r["adc_d2"]) for r in single.collect()]
        assert sorted(got[qr["qid"]], key=lambda t: (t[1], t[0])) == want, qr["qid"]
    # the batch read is pruned to the union of probed cells
    rep = out._wqs_scan_report
    assert rep["partitions_read"] < rep["partitions_total"]
    assert rep["lut_join"] == "broadcast"  # fixture batch is bounded
    handle = getattr(out, "_wqs_persisted", None)
    if handle is not None:
        handle.unpersist()


def test_batch_search_adaptive_lut_join_above_threshold(spark, emb, index_dir):
    """Above ``lut_broadcast_max_rows`` the per-(query, cell) ADC lookup
    table must NOT be broadcast-hinted (at a 10^7-query dedup batch the
    hinted broadcast is tens of GB and kills the driver) — the join
    switches to a cent_id-co-partitioned shuffle, and the results stay
    bit-identical to the broadcast path."""
    from wolf_quake_spark.analysis.ann_index import ivfpq_index_batch_search

    qs = emb.filter(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    bc = ivfpq_index_batch_search(spark, index_dir, qs, n_probes=3, k=10)
    sh = ivfpq_index_batch_search(
        spark, index_dir, qs, n_probes=3, k=10, lut_broadcast_max_rows=0
    )
    assert sh._wqs_scan_report["lut_join"] == "shuffle"
    assert sh._wqs_scan_report["lut_rows"] > 0
    # plan pin: the initial physical plan carries no broadcast exchange
    # for the LUT join — it is a shuffled join on the full key set
    # (AQE may later downgrade small runtime sides; the point is the
    # PLANNED side never ships the LUT through the driver)
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    got_b = sorted(map(tuple, bc.collect()))
    got_s = sorted(map(tuple, sh.collect()))
    assert got_s == got_b
    for frame in (bc, sh):
        handle = getattr(frame, "_wqs_persisted", None)
        if handle is not None:
            handle.unpersist()


def test_append_crash_window_leaves_no_stale_count(spark, emb, qvec, tmp_path):
    """Non-epoch append crash discipline: simulate a crash BETWEEN the
    codes append (manifest committed by tmp+rename inside
    append_hidden_partitioned) and the meta rewrite — the stored meta
    still holds the old ``n``, but ``_load_meta`` must report the
    reconciled count derived from the committed manifests, so no write
    path in the module can leave a stale count."""
    from wolf_quake_spark.analysis.ann_index import (
        _codes_spec,
        _load_meta,
        ivfpq_index_encode,
    )

    d = str(tmp_path / "idx")
    old = emb.filter(F.col("vec_id") % 7 != 0)
    new = emb.filter(F.col("vec_id") % 7 == 0)
    ivfpq_build_index(old, d)
    # the torn state: encoded codes appended, meta never rewritten
    encoded = ivfpq_index_encode(spark, d, new)
    append_hidden_partitioned(encoded, os.path.join(d, "codes"), _codes_spec())
    with open(os.path.join(d, INDEX_META)) as fh:
        assert json.load(fh)["n"] == old.count()  # stored cache IS stale
    assert _load_meta(d)["n"] == emb.count()  # derived count is not
    # and a search over the torn state still works (manifest is committed)
    rep = ivfpq_index_search(spark, d, qvec, n_probes=2, k=5)
    assert rep.count() == 5


# --- streaming ingest + compaction ------------------------------------------


def test_epoch_ingest_exactly_once_and_parity(spark, emb, qvec, tmp_path):
    """Stream-ingested codes equal the batch-append codes (same frozen
    structures); a replayed epoch is a no-op; a crashed (uncommitted)
    epoch dir is reader-invisible until its commit."""
    from wolf_quake_spark.analysis.ann_index import (
        _load_meta,
        ivfpq_index_append_epoch,
        ivfpq_index_compact,
    )

    old = emb.filter(F.col("vec_id") % 7 != 0)
    new = emb.filter(F.col("vec_id") % 7 == 0)

    d_stream = str(tmp_path / "idx_stream")
    d_batch = str(tmp_path / "idx_batch")
    ivfpq_build_index(old, d_stream)
    ivfpq_build_index(old, d_batch)

    # two micro-batches
    b0 = new.filter(F.col("vec_id") % 2 == 0)
    b1 = new.filter(F.col("vec_id") % 2 != 0)
    r0 = ivfpq_index_append_epoch(spark, d_stream, b0, 0)
    r1 = ivfpq_index_append_epoch(spark, d_stream, b1, 1)
    assert not r0["skipped"] and not r1["skipped"]
    # replay: no-op
    r0b = ivfpq_index_append_epoch(spark, d_stream, b0, 0)
    assert r0b["skipped"]
    assert _load_meta(d_stream)["n"] == emb.count()

    # batch face on the other index
    ivfpq_index_append(spark, d_batch, new)

    s_stream = ivfpq_index_search(spark, d_stream, qvec, n_probes=3, k=10)
    s_batch = ivfpq_index_search(spark, d_batch, qvec, n_probes=3, k=10)
    got = [(r["vec_id"], r["adc_d2"]) for r in s_stream.collect()]
    want = [(r["vec_id"], r["adc_d2"]) for r in s_batch.collect()]
    assert got == want
    # the streamed index read 3 tables (main + 2 epochs)
    assert s_stream._wqs_scan_report["code_tables"] == 3

    # crash window: an epoch dir written but NOT committed is invisible
    from wolf_quake_spark.analysis.ann_index import (
        _codes_spec,
        ivfpq_index_encode,
    )
    from wolf_quake_spark.plans.partition_transforms import (
        write_hidden_partitioned,
    )

    orphan = ivfpq_index_encode(spark, d_stream, b0)
    write_hidden_partitioned(
        orphan, os.path.join(d_stream, "codes_epochs", "embeddings-9"), _codes_spec()
    )
    s_after = ivfpq_index_search(spark, d_stream, qvec, n_probes=3, k=10)
    assert [(r["vec_id"], r["adc_d2"]) for r in s_after.collect()] == want

    # compaction folds epochs into one table; search unchanged
    rep = ivfpq_index_compact(spark, d_stream)
    assert rep["compacted"] == 3
    s_comp = ivfpq_index_search(spark, d_stream, qvec, n_probes=3, k=10)
    assert [(r["vec_id"], r["adc_d2"]) for r in s_comp.collect()] == want
    assert s_comp._wqs_scan_report["code_tables"] == 1
    # second compaction is a no-op
    assert ivfpq_index_compact(spark, d_stream)["compacted"] == 0


def test_run_stream_to_ann_index_drains_landing(spark, emb, qvec, tmp_path):
    from wolf_quake_spark.streaming.ann_ingest import run_stream_to_ann_index

    old = emb.filter(F.col("vec_id") % 7 != 0)
    new = emb.filter(F.col("vec_id") % 7 == 0)
    d = str(tmp_path / "idx")
    landing = str(tmp_path / "landing")
    ivfpq_build_index(old, d)
    new.repartition(3).write.parquet(landing)

    meta = run_stream_to_ann_index(
        spark, landing, d, max_files_per_trigger=1
    )
    assert meta["n"] == emb.count()
    assert sum(len(v) for v in meta["stream_epochs"].values()) >= 2

    # re-running the drain ingests nothing new (checkpoint + ledger)
    meta2 = run_stream_to_ann_index(spark, landing, d)
    assert meta2["n"] == emb.count()

    # parity with the batch face
    d2 = str(tmp_path / "idx2")
    ivfpq_build_index(old, d2)
    ivfpq_index_append(spark, d2, new)
    got = [
        (r["vec_id"], r["adc_d2"])
        for r in ivfpq_index_search(spark, d, qvec, n_probes=3, k=10).collect()
    ]
    want = [
        (r["vec_id"], r["adc_d2"])
        for r in ivfpq_index_search(spark, d2, qvec, n_probes=3, k=10).collect()
    ]
    assert got == want
