"""Iterative graph analytics over co-occurrence graphs.

Beyond-reference surface (the reference, nicolasauler/wolf_quake, stops at
per-log aggregation — src/report.rs renders static tables): a training-data
curation stack routinely needs link-analysis scores over item co-occurrence
graphs — PageRank over a part co-purchase graph is the canonical shape
(same plan as domain-authority scoring over a hyperlink graph, or player
influence over a killed-by graph).

Scale design (100 TB):

* The edge build is a SELF-JOIN ON THE ORDER KEY — per-key fan-out is
  bounded by order size (TPC-H: ≤ 7 lineitems/order → ≤ 42 directed pairs
  per order), so the join output is O(rows · max_basket), linear in input,
  never all-pairs.  Skewed giant baskets would need a basket-size cap
  (analogous to ``max_df`` in dedup winnowing); TPC-H-shaped carts don't.
* Each PageRank round is one shuffle join (ranks ⋈ edges on src) + one
  hash aggregate (sum contributions by dst) — the textbook Pregel-style
  plan expressed declaratively so AQE can re-plan per round.  The edge
  frame (the big, loop-invariant relation) is persisted DISK_ONLY once and
  reused every round; rank frames are narrow (node, double).
* A FIXED iteration count keeps the oracle expressible as an unrolled CTE
  chain and the Spark plan statically bounded (no driver-side convergence
  collect in the registry path; ``pagerank``'s ``tol`` parameter exposes
  the scalar-only convergence probe for ad-hoc use, same pattern as
  dedup.label_propagate).
* The co-purchase expansion emits BOTH directions of every unordered
  co-occurrence, so the graph is symmetric: every node with an in-edge has
  an out-edge and the dangling-mass redistribution term vanishes — one
  less global scalar per round.

Cross-engine determinism: per-node contribution sums are floating-point
and summation order differs between Spark and DuckDB, but after 3 rounds
the divergence is ≤ a few ulps (~1e-17 absolute at rank ≈ 1/n); the
emitted score is rounded to 9 decimals, far coarser than the drift, so the
value hash agrees (same argument as textstats.tfidf_top_terms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

DAMPING = 0.85


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed co-purchase edges: (src, dst) distinct part pairs that
    appear in the same order, emitted in both directions.

    One equi-join on l_orderkey with bounded per-key fan-out + one
    distinct hash aggregate — linear in input at any scale.
    """
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = DAMPING,
    round_to: int = 9,
) -> DataFrame:
    """PageRank over a directed edge list via repeated join + aggregate.

    pr_0(v) = 1/n;  pr_{t+1}(v) = (1-d)/n + d · Σ_{(u,v)∈E} pr_t(u)/deg(u)

    Assumes every node has out-degree ≥ 1 (true for symmetric
    co-occurrence graphs); nodes with no IN-edges still receive the
    teleport term via the left join from the node set.  Returns
    (node, out_deg, pr) with pr rounded to ``round_to`` decimals.

    The returned frame carries ``_wqs_persisted`` handles (edge + degree
    frames, DISK_ONLY) for the registry's uniform release convention.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Loop-invariant weighted edge relation, reused every round.
    ew = edges.join(deg, "src").persist(StorageLevel.DISK_ONLY)
    nodes = deg.select(F.col("src").alias("node"), "out_deg").persist(
        StorageLevel.DISK_ONLY
    )
    n_frame = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select("dst", (F.col("pr") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    out = nodes.join(ranks, "node").select(
        "node", "out_deg", F.round("pr", round_to).alias("pr")
    )
    out._wqs_persisted = [ew, nodes]
    return out


def pagerank_sql(iterations: int = 3, damping: float = DAMPING) -> str:
    """Unrolled-CTE DuckDB mirror of :func:`pagerank` over the co-purchase
    graph built from the pre-registered ``lineitem`` view — one CTE per
    round, exactly the Spark arithmetic so round-9 values hash-match."""
    d = repr(damping)
    parts = [
        """
    e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    pr0 AS (SELECT src AS node, 1.0 / n AS pr FROM deg CROSS JOIN nn)
    """
    ]
    for t in range(iterations):
        parts.append(
            f"""
    c{t} AS (SELECT e.dst, SUM(p.pr / deg.out_deg) AS s
             FROM e JOIN pr{t} p ON e.src = p.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
    pr{t + 1} AS (SELECT deg.src AS node,
                       (1.0 - {d}) / n + {d} * COALESCE(c{t}.s, 0.0) AS pr
                FROM deg LEFT JOIN c{t} ON deg.src = c{t}.dst CROSS JOIN nn)
    """
        )
    body = ",".join(parts)
    return f"""
    WITH {body}
    SELECT deg.src AS node, deg.out_deg, round(p.pr, 9) AS pr
    FROM deg JOIN pr{iterations} p ON deg.src = p.node
    """
