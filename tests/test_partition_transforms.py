"""Iceberg-style hidden partitioning: transform spec semantics (truncate
on negatives, NULL → NULL), manifest-pruned reads equal full-scan + filter
while provably skipping partitions, and numeric stats compare numerically
(not lexically) at prune time."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.plans.partition_transforms import (
    PartitionSpec,
    bucket,
    days,
    pruned_read,
    truncate,
    write_hidden_partitioned,
)


@pytest.fixture()
def events(spark):
    rows = []
    for i in range(200):
        ts = dt.datetime(2026, 8, 1 + i % 10, i % 24, 0, 0)
        rows.append((i, ts, i % 37 if i % 50 else None, f"type{i % 4}"))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_truncate_spec_negatives(spark):
    df = spark.createDataFrame([(-7,), (-10,), (0,), (7,), (13,)], "v long")
    got = [r["t"] for r in df.select(truncate(10, "v").alias("t")).orderBy("v").collect()]
    # W * floor(v / W): -7 → -10, -10 → -10, 0 → 0, 7 → 0, 13 → 10
    assert got == [-10, -10, 0, 0, 10]


def test_bucket_null_safe_and_range(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "v long")
    got = df.select(bucket(16, "v").alias("b")).collect()
    vals = [r["b"] for r in got]
    assert vals.count(None) == 1
    assert all(v is None or 0 <= v < 16 for v in vals)


def test_pruned_read_matches_full_scan_and_skips(spark, events, tmp_path):
    out = str(tmp_path / "tbl")
    manifest = write_hidden_partitioned(
        events,
        out,
        [
            PartitionSpec("day", "ts", days("ts")),
            PartitionSpec("user_bucket", "user_id", bucket(4, "user_id")),
        ],
    )
    assert len(manifest["partitions"]) > 10
    # NULL user_id rows land in the hive default partition and stay readable
    full = spark.read.parquet(out)
    assert full.count() == 200

    lo, hi = "2026-08-03 00:00:00", "2026-08-04 23:59:59"
    got, report = pruned_read(spark, out, "ts", lo, hi)
    want = events.where(F.col("ts").between(lo, hi))
    assert report["partitions_read"] < report["partitions_total"]
    assert got.count() == want.count() == report_rows_bound(report, got)
    got_ids = {r["event_id"] for r in got.collect()}
    want_ids = {r["event_id"] for r in want.collect()}
    assert got_ids == want_ids


def report_rows_bound(report, got):
    n = got.count()
    assert n <= report["rows_in_read_partitions"]
    return n


def test_pruned_read_numeric_stats_not_lexical(spark, tmp_path):
    # values 0..19 partitioned by truncate(10): stats min/max are "0"/"9"
    # and "10"/"19"; a lexical compare would wrongly drop the second
    # partition for lo=5 (since "10" < "5" lexically)
    df = spark.createDataFrame([(i,) for i in range(20)], "v long")
    out = str(tmp_path / "num")
    write_hidden_partitioned(
        df, out, [PartitionSpec("vt", "v", truncate(10, "v"))]
    )
    got, report = pruned_read(spark, out, "v", "5", "15")
    assert report["partitions_read"] == report["partitions_total"] == 2
    assert sorted(r["v"] for r in got.collect()) == list(range(5, 16))
    got2, report2 = pruned_read(spark, out, "v", "12", "15")
    assert report2["partitions_read"] == 1
    assert sorted(r["v"] for r in got2.collect()) == [12, 13, 14, 15]


def test_pruned_read_empty_range(spark, events, tmp_path):
    out = str(tmp_path / "tbl2")
    write_hidden_partitioned(
        events, out, [PartitionSpec("day", "ts", days("ts"))]
    )
    got, report = pruned_read(spark, out, "ts", "2030-01-01", "2030-12-31")
    assert report["partitions_read"] == 0
    assert got.count() == 0


def test_manifest_on_disk_layout(spark, events, tmp_path):
    out = str(tmp_path / "tbl3")
    write_hidden_partitioned(
        events, out, [PartitionSpec("day", "ts", days("ts"))]
    )
    dirs = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(dirs) == 10  # 10 distinct days in the fixture
    assert os.path.exists(os.path.join(out, "_partition_manifest.json"))


def test_pruned_read_spec_order_not_alphabetical(spark, events, tmp_path):
    # regression: manifest JSON round-trips through sort_keys=True, so
    # values-dict order is alphabetical; directory nesting is SPEC order.
    # Spec (day, cb) reverses alphabetically — paths must still resolve.
    out = str(tmp_path / "tbl_order")
    write_hidden_partitioned(
        events,
        out,
        [
            PartitionSpec("day", "ts", days("ts")),
            PartitionSpec("cb", "user_id", bucket(4, "user_id")),
        ],
    )
    lo, hi = "2026-08-03 00:00:00", "2026-08-04 23:59:59"
    got, report = pruned_read(spark, out, "ts", lo, hi)
    want = events.where(F.col("ts").between(lo, hi))
    assert report["partitions_read"] < report["partitions_total"]
    assert {r["event_id"] for r in got.collect()} == {
        r["event_id"] for r in want.collect()
    }


def test_pruned_read_string_stats_stay_lexical(spark, tmp_path):
    # regression: all-digits STRING column. Lexical stats of {"12","30","9"}
    # are min="12", max="9"; a parse-as-number heuristic would compare
    # 12.0 > 5.0 and wrongly prune the partition even though "30" is
    # lexically inside ["2","5"] and the residual filter would match it.
    df = spark.createDataFrame(
        [("12", 1), ("30", 2), ("9", 3)], "code string, v long"
    )
    out = str(tmp_path / "strstats")
    write_hidden_partitioned(
        df, out, [PartitionSpec("vb", "code", bucket(1, "code"))]
    )
    got, report = pruned_read(spark, out, "code", "2", "5")
    assert report["partitions_read"] == 1  # NOT pruned
    assert sorted(r["code"] for r in got.collect()) == ["30"]


# ---------------------------------------------------------------------------
# Partition spec evolution (multi-spec tables)
# ---------------------------------------------------------------------------


def _ev_rows(spark, n, day_offset=0):
    import datetime as dt

    base = dt.datetime(2024, 1, 1) + dt.timedelta(days=day_offset)
    rows = [
        (i + day_offset * 10_000,
         base + dt.timedelta(minutes=(i * 7) % (3 * 24 * 60)),  # spans 3 days
         i % 100)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")


def test_partition_evolution_metadata_only_and_pruned_union(spark, tmp_path):
    import os

    from wolf_quake_spark.plans.partition_transforms import (
        append_evolving,
        create_evolving_table,
        evolve_partition_spec,
        read_evolving_pruned,
    )

    table = str(tmp_path / "ev")
    create_evolving_table(_ev_rows(spark, 600), table, "day:ts")
    append_evolving(_ev_rows(spark, 400, day_offset=3), table)

    # snapshot old data files, then evolve: NOTHING may be rewritten
    old_files = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(os.path.join(table, "spec=0"))
        for f in fs
    }
    sid = evolve_partition_spec(table, "day:ts,trunc25:user_id")
    assert sid == 1
    append_evolving(_ev_rows(spark, 500, day_offset=6), table)
    now_files = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(os.path.join(table, "spec=0"))
        for f in fs
    }
    assert now_files == old_files  # evolution + later appends: metadata-only

    # range on ts: BOTH specs prune by their day partitions
    df, rep = read_evolving_pruned(
        spark, table, "ts", "2024-01-07 00:00:00", "2024-01-07 23:59:59"
    )
    assert all(s["pruned"] for s in rep["specs"])
    assert rep["specs"][1]["partitions_read"] < rep["specs"][1]["partitions_total"]
    flat = (
        _ev_rows(spark, 600).unionByName(_ev_rows(spark, 400, day_offset=3))
        .unionByName(_ev_rows(spark, 500, day_offset=6))
        .where(F.col("ts").between("2024-01-07 00:00:00", "2024-01-07 23:59:59"))
    )
    assert df.count() == flat.count() > 0
    assert df.columns == ["event_id", "ts", "user_id"]  # derived cols dropped

    # range on user_id: spec 0 can't prune (honestly reported), spec 1 can
    df2, rep2 = read_evolving_pruned(spark, table, "user_id", "0", "20")
    by_spec = {s["spec"]: s for s in rep2["specs"]}
    assert not by_spec[0]["pruned"]
    assert by_spec[0]["partitions_read"] == by_spec[0]["partitions_total"]
    assert by_spec[1]["pruned"]
    assert by_spec[1]["partitions_read"] < by_spec[1]["partitions_total"]
    flat2 = (
        _ev_rows(spark, 600).unionByName(_ev_rows(spark, 400, day_offset=3))
        .unionByName(_ev_rows(spark, 500, day_offset=6))
        .where(F.col("user_id").between(0, 20))
    )
    assert df2.count() == flat2.count() > 0


def test_evolve_rejects_bad_descriptor(spark, tmp_path):
    import pytest

    from wolf_quake_spark.plans.partition_transforms import (
        create_evolving_table,
        evolve_partition_spec,
        _spec_log_load,
    )

    table = str(tmp_path / "ev2")
    create_evolving_table(_ev_rows(spark, 50), table, "day:ts")
    with pytest.raises(ValueError):
        evolve_partition_spec(table, "wat:ts")
    assert _spec_log_load(table)["current"] == 0  # validation precedes commit
