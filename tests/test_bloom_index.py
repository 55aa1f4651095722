"""Per-partition Bloom point-lookup index: no false negatives (every
present key found, exact rows), real pruning for absent/localized keys,
NULL keys set no bits, and the word encoding stays positive int64."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.plans.bloom_index import (
    WORD_BITS,
    bloom_point_lookup,
    bloom_words_frame,
    build_bloom_index,
)
from wolf_quake_spark.plans.partition_transforms import (
    PartitionSpec,
    days,
    write_hidden_partitioned,
)


@pytest.fixture()
def table(spark, tmp_path):
    # 300 rows over 6 days; conv ids mostly local to one day, a few
    # spanning two, and some NULL keys
    rows = []
    for i in range(300):
        day = i % 6
        ts = dt.datetime(2026, 8, 1 + day, 12, 0, 0)
        conv = None if i % 37 == 0 else f"conv-{day if i % 11 else (day + 1) % 6}-{i % 13}"
        rows.append((i, ts, conv))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, conv_id string")
    out = str(tmp_path / "tbl")
    write_hidden_partitioned(df, out, [PartitionSpec("day", "ts", days("ts"))])
    build_bloom_index(spark, out, "conv_id", bits_per_row=10, k=5)
    return df, out


def test_no_false_negatives_all_keys(spark, table):
    df, out = table
    keys = [r["conv_id"] for r in df.select("conv_id").distinct().collect() if r["conv_id"]]
    full = {k: {r["event_id"] for r in df.where(F.col("conv_id") == k).collect()} for k in keys}
    for k in keys:
        got, report = bloom_point_lookup(spark, out, "conv_id", k)
        assert {r["event_id"] for r in got.collect()} == full[k]
        assert report["partitions_read"] >= 1


def test_pruning_is_real(spark, table):
    df, out = table
    # a key present on exactly one day must not read all 6 partitions
    got, report = bloom_point_lookup(spark, out, "conv_id", "conv-2-1")
    assert report["partitions_total"] == 6
    assert 1 <= report["partitions_read"] < 6
    # an absent key: overwhelmingly likely zero partitions at 10 bits/row
    got2, report2 = bloom_point_lookup(spark, out, "conv_id", "no-such-conv")
    assert report2["partitions_read"] <= 1
    assert got2.count() == 0


def test_null_lookup_rejected_and_null_rows_excluded(spark, table):
    df, out = table
    with pytest.raises(ValueError):
        bloom_point_lookup(spark, out, "conv_id", None)
    # NULL conv_id rows exist in the table but never match a point lookup
    assert df.where(F.col("conv_id").isNull()).count() > 0


def test_words_positive_and_sidecar_layout(spark, table):
    df, out = table
    with open(os.path.join(out, "_bloom_conv_id.json")) as fh:
        sidecar = json.load(fh)
    assert sidecar["m"] % WORD_BITS == 0
    assert sidecar["part_cols"] == ["day"]
    for words in sidecar["partitions"].values():
        for bits in words.values():
            assert 0 < bits < 1 << 63  # shift < 60 keeps words positive


def test_words_frame_matches_python_model(spark):
    # tiny m so the bitset is dense enough to hand-check the OR-fold
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "part string, v int")
    words = bloom_words_frame(df, F.col("part"), "v", m=120, k=3).collect()
    by_part: dict[str, int] = {}
    for r in words:
        by_part[r["part"]] = by_part.get(r["part"], 0) | r["bits"] << (
            r["word"] * WORD_BITS
        )
    # part a saw two values (≤6 distinct bits), part b one (≤3 bits)
    assert 1 <= bin(by_part["b"]).count("1") <= 3
    assert bin(by_part["b"]).count("1") < bin(by_part["a"]).count("1") <= 6
