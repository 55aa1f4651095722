"""Semantic tests for the iterative graph module (PageRank) and the
deterministic HLL sketch — fixture-level properties complementing the
DuckDB oracle parity rows (copurchase_pagerank, hll_distinct_orders)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.graph import copurchase_edges, pagerank
from wolf_quake_spark.analysis.sketches import hll_distinct


@pytest.fixture(scope="module")
def star_edges(spark):
    # Symmetric star: hub 0 co-occurs with 1..6, plus a 7-8 pair off to
    # the side.  Every node has out-degree >= 1 (symmetric expansion).
    pairs = [(0, i) for i in range(1, 7)] + [(7, 8)]
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_mass_conserved_and_hub_dominates(spark, star_edges):
    pr = pagerank(star_edges, iterations=3).collect()
    total = sum(r.pr for r in pr)
    assert total == pytest.approx(1.0, abs=1e-6)
    by_node = {r.node: r.pr for r in pr}
    # the hub receives contributions from 6 leaves; every leaf only from
    # the hub — hub rank strictly dominates every other node
    assert by_node[0] > max(v for k, v in by_node.items() if k != 0)
    # leaves 1..6 are symmetric — identical ranks
    leaf_ranks = {by_node[i] for i in range(1, 7)}
    assert len(leaf_ranks) == 1
    # out_deg column is the true degree
    degs = {r.node: r.out_deg for r in pr}
    assert degs[0] == 6 and degs[1] == 1 and degs[7] == 1


def test_pagerank_uniform_on_regular_graph(spark):
    # A directed cycle is 1-regular: PageRank is exactly uniform at every
    # iteration, so pr = 1/n for all nodes regardless of rounds.
    n = 5
    rows = [(i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    pr = pagerank(edges, iterations=4).collect()
    for r in pr:
        assert r.pr == pytest.approx(1.0 / n, abs=1e-9)


def test_copurchase_edges_symmetric_no_self_loops(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 10), (3, 13)],
        "l_orderkey long, l_partkey long",
    )
    e = {(r.src, r.dst) for r in copurchase_edges(li).collect()}
    # order 1 -> all 6 directed pairs among {10,11,12}; order 2 has a
    # repeated part (self-pair filtered); order 3 is a singleton
    assert e == {
        (10, 11), (11, 10), (10, 12), (12, 10), (11, 12), (12, 11)
    }


def test_hll_estimate_within_expected_error(spark):
    # 3 groups x 2000 distinct items: HLL(m=256) standard error is
    # 1.04/sqrt(256) = 6.5%; gate at 4 sigma (26%).
    rows = [
        (g, go * 100000 + i)
        for go, g in enumerate(("a", "b", "c"))
        for i in range(2000)
    ]
    # duplicate every item once — distinct count must be unaffected
    df = spark.createDataFrame(rows + rows, "grp string, item long")
    out = hll_distinct(df, "grp", "item").collect()
    assert len(out) == 3
    for r in out:
        assert r.exact_distinct == 2000
        assert abs(r.rel_error) < 0.26
        assert r.m == 256
        assert 0 < r.registers_hit <= 256
        assert r.hll_estimate == pytest.approx(
            2000 * (1 + r.rel_error), rel=1e-3
        )


def test_hll_small_range_linear_counting_exact_regime(spark):
    # 10 distinct items in one group: raw estimate falls below 2.5*m with
    # empty registers -> linear-counting branch m*ln(m/V), which for
    # k << m returns ~k with sub-1% error.
    df = spark.createDataFrame(
        [("g", i) for i in range(10)], "grp string, item long"
    )
    r = hll_distinct(df, "grp", "item").collect()[0]
    assert r.exact_distinct == 10
    assert r.registers_hit <= 10
    v = 256 - r.registers_hit
    assert r.hll_estimate == pytest.approx(
        round(256.0 * math.log(256.0 / v), 4), abs=1e-9
    )
    assert abs(r.rel_error) < 0.05


def test_hll_merge_property_groups_independent(spark):
    # Register state is per-group: adding a huge group must not move
    # another group's estimate (mergeable-sketch isolation).
    small = [("s", i) for i in range(50)]
    big = [("b", i) for i in range(5000)]
    est_alone = (
        hll_distinct(spark.createDataFrame(small, "grp string, item long"),
                     "grp", "item").collect()[0].hll_estimate
    )
    both = hll_distinct(
        spark.createDataFrame(small + big, "grp string, item long"),
        "grp", "item",
    ).collect()
    est_with = next(r for r in both if r.grp == "s").hll_estimate
    assert est_alone == est_with
