"""Semantic tests for the iterative graph module (PageRank) and the
deterministic HLL sketch — fixture-level properties complementing the
DuckDB oracle parity rows (copurchase_pagerank, hll_distinct_orders)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.graph import (
    copurchase_edges,
    pagerank,
    triangle_counts,
)
from wolf_quake_spark.analysis.sketches import hll_distinct, kmv_set_ops


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


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


def test_triangle_counts_k4_minus_edge(spark):
    # K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    # Node 1,2 touch both; 3,4 touch one each.  deg(1)=deg(2)=3,
    # deg(3)=deg(4)=2 -> lcc(1)=2*2/(3*2)=0.666..., lcc(3)=2*1/(2*1)=1.0.
    e = _sym(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
    out = {r.node: r for r in triangle_counts(e).collect()}
    assert {n: r.triangles for n, r in out.items()} == {1: 2, 2: 2, 3: 1, 4: 1}
    assert out[1].degree == 3 and out[3].degree == 2
    assert out[1].lcc == pytest.approx(2 / 3, abs=1e-9)
    assert out[3].lcc == pytest.approx(1.0)


def test_triangle_counts_triangle_free_and_isolated_leaf(spark):
    # A 4-cycle has no triangles; the pendant (5,6) edge has degree-1
    # endpoints (lcc defined 0).  Every node still appears in the output.
    e = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (5, 6)])
    out = triangle_counts(e).collect()
    assert len(out) == 6
    assert all(r.triangles == 0 and r.lcc == 0.0 for r in out)


def test_triangle_counts_hub_skew_oriented_away(spark):
    # A hub of degree 50 in a fan of triangles: hub->spokes all orient
    # AWAY from the hub (degree ordering), so every triangle is still
    # found while the hub generates zero wedges itself.
    pairs = [(0, i) for i in range(1, 51)] + [
        (i, i + 1) for i in range(1, 50, 2)
    ]
    out = {r.node: r for r in triangle_counts(_sym(spark, pairs)).collect()}
    # 25 spoke-pair triangles {0, 2i-1, 2i}
    assert out[0].triangles == 25
    assert out[1].triangles == 1 and out[2].triangles == 1
    assert out[0].degree == 50


def test_kmv_exact_branch_small_sets(spark):
    # Sets smaller than k: the sketch IS the set, every estimate exact.
    rows = (
        [("a", i) for i in range(40)]
        + [("b", i) for i in range(20, 80)]  # |b|=60, overlap 20
    )
    df = spark.createDataFrame(rows, "grp string, item long")
    r = kmv_set_ops(df, "grp", "item", k=128).collect()[0]
    assert (r.g1, r.g2) == ("a", "b")
    assert r.est_a == 40.0 and r.est_b == 60.0
    assert r.est_union == 80.0 and r.exact_union == 80
    assert r.exact_intersection == 20
    assert r.jaccard_est == pytest.approx(20 / 80, abs=1e-4)
    assert r.est_intersection == pytest.approx(20.0, abs=1e-2)


def test_kmv_estimator_branch_within_error(spark):
    # |A|=|B|=4000, |A∩B|=2000: KMV(k=128) relative std err ~ 1/sqrt(k-1)
    # = 8.9%; gate estimates at 4 sigma and Jaccard at a loose band.
    rows = [("a", i) for i in range(4000)] + [
        ("b", i) for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "grp string, item long")
    r = kmv_set_ops(df, "grp", "item", k=128).collect()[0]
    assert abs(r.est_a - 4000) / 4000 < 0.36
    assert abs(r.est_b - 4000) / 4000 < 0.36
    assert r.exact_union == 6000 and r.exact_intersection == 2000
    assert abs(r.est_union - 6000) / 6000 < 0.36
    assert 0.15 < r.jaccard_est < 0.55  # true 1/3
    assert abs(r.est_intersection - 2000) / 2000 < 0.6


def test_kmv_disjoint_sets_zero_intersection(spark):
    rows = [("a", i) for i in range(500)] + [
        ("b", 10_000 + i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, item long")
    r = kmv_set_ops(df, "grp", "item", k=128).collect()[0]
    assert r.exact_intersection == 0
    assert r.jaccard_est < 0.05 and r.est_intersection < 60
    assert r.exact_union == 1000


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


def _sym(spark, undirected):
    both = [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected]
    return spark.createDataFrame(both, "src long, dst long")


def test_bfs_chain_branch_and_island(spark):
    from wolf_quake_spark.analysis.graph import bfs_distances

    # source = min node = 1; chain 1-2-3-4-5-6, branch 2-10, island 50-51
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 10), (50, 51)])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, max_depth=4).collect()}
    # depth cap 4: node 6 (5 hops) and the island are unreached
    assert got == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3, 5: 4}


def test_bfs_min_dist_on_cycle(spark):
    from wolf_quake_spark.analysis.graph import bfs_distances

    # 5-cycle from node 1: two directions meet; dists are min hop counts
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, max_depth=4).collect()}
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}


def test_personalized_pagerank_mass_and_proximity(spark):
    from wolf_quake_spark.analysis.graph import personalized_pagerank

    # path 1-2-3-4 plus hub 1-10, symmetric; source = min node = 1
    und = [(1, 2), (2, 3), (3, 4), (1, 10)]
    edges = _sym(spark, und)
    got = {r["node"]: r["ppr"] for r in personalized_pagerank(edges, iterations=3).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-6  # walk mass conserved
    # exact pure-Python mirror of the recurrence
    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    pr = {n: 1.0 if n == 1 else 0.0 for n in adj}
    for _ in range(3):
        nxt = {n: (0.15 if n == 1 else 0.0) for n in adj}
        for u, vs in adj.items():
            for v in vs:
                nxt[v] += 0.85 * pr[u] / len(vs)
        pr = nxt
    # (low-round PPR oscillates with walk parity on path graphs, so no
    # ordering heuristics — the exact mirror pins every value)
    for n, want in pr.items():
        assert abs(got[n] - want) < 1e-9, (n, got[n], want)
