"""Field-id schema evolution: rename resolves by id across old files,
added columns NULL-fill files that predate them, dropped-then-re-added
names never resurrect old data (fresh id), metadata ops touch no data
files, and invalid evolutions are rejected."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.plans.schema_evolution import (
    create_table,
    evolve,
    read_evolved,
    write_version,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    out = str(tmp_path / "tbl")
    create_table(out, [("conv_id", "string"), ("turn_idx", "int"), ("text", "string")])
    v0 = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world")],
        "conv_id string, turn_idx int, text string",
    )
    write_version(v0, out)
    return out


def test_rename_and_add_resolve_by_id(spark, tbl):
    evolve(tbl, rename={"text": "body"}, add=[("tool", "string")])
    v1 = spark.createDataFrame(
        [("c2", 0, "bonjour", "bash")],
        "conv_id string, turn_idx int, body string, tool string",
    )
    write_version(v1, tbl)
    got = read_evolved(spark, tbl)
    assert sorted(got.columns) == ["body", "conv_id", "tool", "turn_idx"]
    rows = {(r["conv_id"], r["turn_idx"]): (r["body"], r["tool"]) for r in got.collect()}
    # old files: text surfaces as body (same id), tool NULL-fills
    assert rows[("c1", 0)] == ("hello", None)
    assert rows[("c2", 0)] == ("bonjour", "bash")


def test_drop_then_readd_does_not_resurrect(spark, tbl):
    evolve(tbl, drop=["text"])
    evolve(tbl, add=[("text", "string")])  # same NAME, fresh id
    v2 = spark.createDataFrame(
        [("c3", 0, "new-era")], "conv_id string, turn_idx int, text string"
    )
    write_version(v2, tbl)
    got = read_evolved(spark, tbl)
    by_conv = {r["conv_id"]: r["text"] for r in got.where(F.col("turn_idx") == 0).collect()}
    assert by_conv["c3"] == "new-era"
    assert by_conv["c1"] is None  # old 'text' data stays dead


def test_evolution_is_metadata_only(spark, tbl):
    v0_dir = os.path.join(tbl, "schema_version=0")
    before = {f: os.path.getmtime(os.path.join(v0_dir, f)) for f in os.listdir(v0_dir)}
    evolve(tbl, rename={"text": "body"})
    after = {f: os.path.getmtime(os.path.join(v0_dir, f)) for f in os.listdir(v0_dir)}
    assert before == after  # no data file touched or rewritten


def test_invalid_evolutions_rejected(spark, tbl):
    with pytest.raises(ValueError):
        evolve(tbl, rename={"nope": "x"})
    with pytest.raises(ValueError):
        evolve(tbl, add=[("text", "string")])  # name already live
    with pytest.raises(ValueError):
        evolve(tbl, rename={"text": "conv_id"})  # collision
    with pytest.raises(ValueError):
        write_version(
            spark.createDataFrame([("a",)], "wrong string"), tbl
        )


def test_empty_table_reads_current_schema(spark, tmp_path):
    out = str(tmp_path / "empty")
    create_table(out, [("a", "string"), ("b", "int")])
    evolve(out, rename={"a": "aa"})
    got = read_evolved(spark, out)
    assert got.columns == ["aa", "b"]
    assert got.count() == 0
