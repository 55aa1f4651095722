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
    broadcast_ranks: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list via repeated join + aggregate.

    pr_0(v) = 1/n;  pr_{t+1}(v) = (1-d)/n + d · Σ_{(u,v)∈E} pr_t(u)/deg(u)

    Assumes every node has out-degree ≥ 1 (true for symmetric
    co-occurrence graphs); nodes with no IN-edges still receive the
    teleport term via the left join from the node set.  Returns
    (node, out_deg, pr) with pr rounded to ``round_to`` decimals.

    The returned frame carries ``_wqs_persisted`` handles (edge + degree
    frames, DISK_ONLY) for the registry's uniform release convention.

    ``broadcast_ranks``: when the node set is dimension-sized (item
    catalogs — 20k parts vs 2.4M edges here), broadcasting the narrow
    (node, pr) frame into each round's join skips the per-round edge
    shuffle entirely (the edge frame then never re-sorts; measured 9.8 s
    → see BENCH.md).  Leave False for web-scale node sets where ranks
    outgrow the broadcast budget — the SMJ path is the general one.
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
        rhs = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            ew.join(rhs, ew["src"] == rhs["node"])
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


def brand_copurchase_edges(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Co-purchase edges restricted to parts of the SAME brand (both
    directions, distinct) — the within-category affinity graph.

    The brand filter keeps the graph's edge count (and hence the triangle
    join below) bounded: cross-brand pairs dominate the unrestricted graph
    (~2.4M directed edges at sf0.1) while same-brand pairs stay ~25×
    sparser with the same per-order fan-out bound.
    """
    brand = part.select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("brand")
    )
    a = (
        lineitem.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
        )
        .join(F.broadcast(brand), F.col("src") == F.col("pk"))
        .select("ok", "src", F.col("brand").alias("brand_a"))
    )
    b = (
        lineitem.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
        )
        .join(F.broadcast(brand), F.col("dst") == F.col("pk"))
        .select("ok", "dst", F.col("brand").alias("brand_b"))
    )
    return (
        a.join(b, "ok")
        .filter(
            (F.col("src") != F.col("dst"))
            & (F.col("brand_a") == F.col("brand_b"))
        )
        .select("src", "dst")
        .distinct()
    )


def triangle_counts(edges: DataFrame, round_to: int = 9) -> DataFrame:
    """Per-node triangle count + local clustering coefficient via
    degree-ordered orientation (Cohen 2009 / the MapReduce "oriented
    wedge" algorithm).

    ``edges`` must be a symmetric directed edge list (both directions of
    every undirected edge present, no self-loops) — the shape
    :func:`copurchase_edges` / :func:`brand_copurchase_edges` emit.

    Scale design (100 TB):

    * Orientation by (degree, node-id) turns the graph into a DAG whose
      max out-degree is O(√m) regardless of skew — the hub that ruins the
      naive wedge join (Σ deg² with a celebrity node → quadratic) has all
      its edges pointed INTO it, so its wedge fan-out is zero.  Σ of
      oriented out-deg² is O(m^1.5) worst case, O(m·arboricity) typical.
    * Each triangle {u<v<w} in the (deg, id) total order is enumerated
      exactly once as wedge (u→v, u→w) closed by oriented edge (v→w):
      three hash joins + one explode + one hash aggregate, no windows,
      no driver state.
    * The comparison is on the composite (deg, id) directly — no
      deg·2³²+id packed key, so ids wider than 32 bits can't overflow.

    Returns (node, degree, triangles, lcc) for EVERY node (zero-triangle
    nodes included via the left join), lcc = 2T/(d(d−1)) rounded — the
    only float, computed from exact integers, so it value-hashes
    cross-engine.
    """
    und = edges.filter(F.col("src") < F.col("dst"))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree")
    )
    # Orient each undirected edge from the (deg, id)-smaller endpoint.
    da = deg.select(F.col("node").alias("src"), F.col("degree").alias("ds"))
    db = deg.select(F.col("node").alias("dst"), F.col("degree").alias("dd"))
    lo_first = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    o = (
        und.join(da, "src")
        .join(db, "dst")
        .select(
            F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
            F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
            F.when(lo_first, F.col("dd")).otherwise(F.col("ds")).alias("db_"),
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    w1 = o.select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.col("db_").alias("dv")
    )
    w2 = o.select(
        F.col("a").alias("u"), F.col("b").alias("w"), F.col("db_").alias("dw")
    )
    wedges = w1.join(w2, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closure = o.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tri = wedges.join(closure, ["v", "w"]).select("u", "v", "w")
    per_node = (
        tri.select(
            F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                round_to,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )
    out._wqs_persisted = o
    return out


def triangle_counts_sql(round_to: int = 9) -> str:
    """DuckDB mirror of :func:`triangle_counts` over
    :func:`brand_copurchase_edges` built from the pre-registered
    ``lineitem``/``part`` views — same orientation, same wedge closure,
    same rounding."""
    return f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      JOIN part pa ON a.l_partkey = pa.p_partkey
      JOIN part pb ON b.l_partkey = pb.p_partkey
      WHERE a.l_partkey <> b.l_partkey AND pa.p_brand = pb.p_brand
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM e GROUP BY src),
    o AS (
      SELECT CASE WHEN lo THEN src ELSE dst END AS a,
             CASE WHEN lo THEN dst ELSE src END AS b,
             CASE WHEN lo THEN dd ELSE ds END AS db_
      FROM (
        SELECT e.src, e.dst, da.degree AS ds, db.degree AS dd,
               (da.degree < db.degree
                OR (da.degree = db.degree AND e.src < e.dst)) AS lo
        FROM e JOIN deg da ON e.src = da.node JOIN deg db ON e.dst = db.node
        WHERE e.src < e.dst
      )
    ),
    tri AS (
      SELECT w1.u, w1.v, w2.w
      FROM (SELECT a AS u, b AS v, db_ AS dv FROM o) w1
      JOIN (SELECT a AS u, b AS w, db_ AS dw FROM o) w2 ON w1.u = w2.u
      JOIN o c ON c.a = w1.v AND c.b = w2.w
      WHERE (w1.dv < w2.dw) OR (w1.dv = w2.dw AND w1.v < w2.w)
    ),
    pn AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
            UNION ALL SELECT w FROM tri)
      GROUP BY node
    )
    SELECT deg.node, deg.degree,
           COALESCE(pn.triangles, 0) AS triangles,
           CASE WHEN deg.degree >= 2
                THEN round(2.0 * COALESCE(pn.triangles, 0)
                           / (deg.degree * (deg.degree - 1)), {round_to})
                ELSE 0.0 END AS lcc
    FROM deg LEFT JOIN pn ON deg.node = pn.node
    """


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


def bfs_distances(edges: DataFrame, max_depth: int = 4) -> DataFrame:
    """Single-source BFS shortest-path distances (hop counts) over a
    symmetric directed edge list — frontier expansion, the Pregel shape.

    The source is the minimum node id, derived as a one-row frame and
    joined in (no driver collect).  Each round joins only the FRONTIER
    (nodes first reached last round) against the loop-invariant persisted
    edge frame, then anti-joins the accumulated distance set so every
    node's edges are expanded exactly once — the property that makes BFS
    linear in edges at any scale, unlike full Bellman-Ford relaxation
    which re-joins the whole reached set every round.

    A FIXED ``max_depth`` keeps the unrolled plan statically bounded and
    the oracle expressible as a depth-bounded recursive CTE (DuckDB
    ``UNION`` recursion dedups (node, dist) pairs, so ``MIN(dist)`` per
    node equals the frontier-BFS first-discovery distance).  Each round's
    frontier is cut from its lineage with an EAGER ``localCheckpoint`` —
    the GraphX/Pregel discipline: without it the round-N plan textually
    repeats every earlier round's subtree and Catalyst re-plans an
    exponentially growing tree (measured 24–39 s at sf0.1 persisted-only
    vs ~4 s checkpointed; the recompute-on-executor-loss caveat of
    localCheckpoint is the standard iterative-graph trade and a real
    cluster would use reliable checkpointing on the same cadence).  The
    persisted edge frame is exposed via ``_wqs_persisted`` for release.

    Beyond-reference surface: reachability over the co-purchase graph
    (wolf_quake's report.rs has no graph traversal); the same plan serves
    killed-by influence radii or document-link neighborhoods.
    """
    e = edges.persist(StorageLevel.DISK_ONLY)
    frontier = (
        e.agg(F.min("src").alias("node"))
        .withColumn("dist", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    dist = frontier
    for d in range(1, max_depth + 1):
        frontier = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(d).cast("int"))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(frontier).localCheckpoint(eager=True)
    dist._wqs_persisted = [e]
    return dist


def bfs_distances_sql(max_depth: int = 4) -> str:
    """Depth-bounded recursive-CTE DuckDB mirror of :func:`bfs_distances`
    over :func:`brand_copurchase_edges` from the pre-registered
    ``lineitem``/``part`` views.  ``UNION`` (distinct) recursion bounds
    the walk at nodes × (depth+1) rows; ``MIN(dist)`` recovers the
    first-discovery hop count."""
    return f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      JOIN part pa ON a.l_partkey = pa.p_partkey
      JOIN part pb ON b.l_partkey = pb.p_partkey
      WHERE a.l_partkey <> b.l_partkey AND pa.p_brand = pb.p_brand
    ),
    s AS (SELECT MIN(src) AS node FROM e),
    walk(node, dist) AS (
        SELECT node, 0 FROM s
        UNION
        SELECT e.dst, w.dist + 1 FROM walk w
        JOIN e ON e.src = w.node WHERE w.dist < {max_depth}
    )
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist FROM walk GROUP BY node
    """


def personalized_pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = DAMPING,
    round_to: int = 9,
) -> DataFrame:
    """Personalized PageRank: random-walk-with-restart proximity to a
    single source node (teleport mass concentrated on the source instead
    of spread 1/n) — the graph-retrieval twin of :func:`bfs_distances`'
    hop counts, weighting *how connected* a node is to the source, not
    just how far.  Source = min node id, derived as a one-row broadcast
    frame (no driver collect).

    ppr_0(v) = [v = s];  ppr_{t+1}(v) = (1-d)·[v = s] + d·Σ ppr_t(u)/deg(u)

    Same per-round join+aggregate plan (and the same loop-invariant
    persisted weighted-edge relation) as :func:`pagerank`; fixed
    iteration count keeps the oracle an unrolled CTE chain.  Returns
    (node, ppr) rounded to ``round_to``, teleport-only nodes included.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ew = edges.join(deg, "src").persist(StorageLevel.DISK_ONLY)
    nodes = deg.select(F.col("src").alias("node"), "out_deg").persist(
        StorageLevel.DISK_ONLY
    )
    s_frame = nodes.agg(F.min("node").alias("s"))

    ranks = nodes.crossJoin(F.broadcast(s_frame)).select(
        "node",
        F.when(F.col("node") == F.col("s"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("pr"),
    )
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select("dst", (F.col("pr") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s_c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(s_frame))
            .select(
                "node",
                (
                    F.when(F.col("node") == F.col("s"), F.lit(1.0) - damping).otherwise(F.lit(0.0))
                    + F.lit(damping) * F.coalesce(F.col("s_c"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    out = ranks.select("node", F.round("pr", round_to).alias("ppr"))
    out._wqs_persisted = [ew, nodes]
    return out


def personalized_pagerank_sql(
    iterations: int = 3, damping: float = DAMPING
) -> str:
    """Unrolled-CTE DuckDB mirror of :func:`personalized_pagerank` over
    :func:`brand_copurchase_edges` from the pre-registered
    ``lineitem``/``part`` views — identical arithmetic and operand order
    so round-9 values hash-match."""
    d = repr(damping)
    parts = [
        """
    e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      JOIN part pa ON a.l_partkey = pa.p_partkey
      JOIN part pb ON b.l_partkey = pb.p_partkey
      WHERE a.l_partkey <> b.l_partkey AND pa.p_brand = pb.p_brand
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
    sv AS (SELECT MIN(src) AS s FROM deg),
    pr0 AS (SELECT deg.src AS node,
                   CASE WHEN deg.src = sv.s THEN 1.0 ELSE 0.0 END AS pr
            FROM deg CROSS JOIN sv)
    """
    ]
    for t in range(iterations):
        parts.append(
            f"""
    c{t} AS (SELECT e.dst, SUM(p.pr / deg.out_deg) AS s_c
             FROM e JOIN pr{t} p ON e.src = p.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
    pr{t + 1} AS (SELECT deg.src AS node,
                       (CASE WHEN deg.src = sv.s THEN 1.0 - {d} ELSE 0.0 END
                        + {d} * COALESCE(c{t}.s_c, 0.0)) AS pr
                FROM deg LEFT JOIN c{t} ON deg.src = c{t}.dst CROSS JOIN sv)
    """
        )
    body = ",".join(parts)
    return f"""
    WITH {body}
    SELECT node, round(pr, 9) AS ppr FROM pr{iterations}
    """
