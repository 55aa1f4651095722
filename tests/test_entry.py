"""Mirror of the driver's correctness gate: every queries() entry vs its
DuckDB oracle at sf0.01 — row count, column names, and exact values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("WQS_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return "NULL"  # sortable alongside strings (driver comparator rule)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: engines must agree bit-for-bit
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ALL_QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    if not os.path.exists(SF_DIR):
        pytest.skip("testdata missing")
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    assert len(srows) >= 0
    if sql is None:
        assert len(srows) > 0  # rows-only check
        return
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc = _canon(scols, [tuple(r) for r in srows])
    dc = _canon(dcols, drows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: values differ, first diffs: {diffs}")


def test_registry_releases_persisted_handles(spark):
    """Operators that persist a shared intermediate expose it as
    ``_wqs_persisted``; the registry drains every prior query's handle when
    the next query is built, so a driver looping over queries() leaks at
    most one cached relation regardless of how many it runs."""
    if not os.path.exists(SF_DIR):
        pytest.skip("testdata missing")
    qs = entry_mod.queries()
    df1 = qs["minhash_estimate_error"](spark, SF_DIR)
    df1.collect()
    h = df1._wqs_persisted
    assert h.storageLevel.useDisk  # persisted while its consumer runs
    qs["dedup_exact_groups"](spark, SF_DIR)  # next query drains the handle
    assert not h.storageLevel.useDisk and not h.storageLevel.useMemory


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "n_sessions", "n_events_sessions", "score", "n_categories"]
