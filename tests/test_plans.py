"""Physical-plan audits: codify the scale claims the query docstrings make.

Correctness is the oracle gate's job; these tests pin the *plan shape* so a
future edit can't silently reintroduce a scale-killer: a cartesian product,
a single-partition global window over the data, a lost pushed predicate, or
a dimension join that stops broadcasting.  Plans are inspected via the
executed-plan string (same surface `.explain("formatted")` prints).
"""

from __future__ import annotations

import pytest

from wolf_quake_spark.queries import queries

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_topk_plan(spark):
    p = plan_of(spark, "top_unshipped_revenue")
    assert "TakeOrderedAndProject" in p  # top-k, not a global sort
    assert "BroadcastHashJoin" in p  # filtered dim broadcasts
    assert "CartesianProduct" not in p
    # selective predicates reach the scans
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in p
    assert "LessThan(o_orderdate" in p
    assert "GreaterThan(l_shipdate" in p


def test_lww_compaction_single_shuffle(spark):
    p = plan_of(spark, "events_lww_compaction")
    # exactly one data exchange: the merge-key hash partitioning
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p
    assert "user_id" in p.split("Exchange hashpartitioning", 1)[1][:80]


def test_no_single_partition_window_in_rankings(spark):
    # the round-1 verdict flagged a global Window here; keep it fixed
    for name in ("user_ranking", "training_order_manifest"):
        p = plan_of(spark, name)
        assert "rangepartitioning" in p, name  # stage 1 of the two-stage rank
        # at most one SinglePartition exchange: the #partitions-sized offsets
        # frame — never the data path (which is range-partitioned)
        assert p.count("Exchange SinglePartition") <= 1, name
        assert "CartesianProduct" not in p, name


def test_broadcast_enrich_stays_broadcast(spark):
    p = plan_of(spark, "broadcast_enrich_region")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_decontamination_broadcasts_bench_side(spark):
    p = plan_of(spark, "decontamination_hits")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bloom_probe_is_jvm_side(spark):
    p = plan_of(spark, "decontamination_bloom")
    # the bitset probe must stay in codegen: no Python/Arrow eval operators
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_pricing_summary_pruned_scan(spark):
    p = plan_of(spark, "pricing_summary")
    # column pruning: the lineitem scan must not read all 11 columns
    scan = p.split("FileScan parquet", 1)[1]
    read_schema = scan.split("ReadSchema:", 1)[1]
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema


def test_q5_join_graph_plan(spark):
    p = plan_of(spark, "local_supplier_volume")
    # the only big-big edge is orders⋈lineitem; everything else broadcasts
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 3
    assert "GreaterThanOrEqual(o_orderdate" in p  # date range pushed to scan
    assert "EqualTo(r_name,ASIA)" in p  # region filter pushed


def test_funnel_single_aggregate_plan(spark):
    p = plan_of(spark, "funnel_conversion")
    # one user-keyed exchange + one global reduce; no joins or windows
    assert "Join" not in p
    assert "Window" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing evidence for the 100 TB claims: two tables bucketed+sorted
    on the join key sort-merge join with NO Exchange on either side — the
    co-located join layout the docs prescribe for repeated big-big joins."""
    import uuid

    db = f"wqs_bucket_test_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    # at fixture scale the optimizer would (rightly) broadcast this join;
    # pin sort-merge so the test exercises the big-big co-located layout
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .saveAsTable(f"{db}.orders_b"))
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .saveAsTable(f"{db}.lineitem_b"))
        ob = spark.table(f"{db}.orders_b")
        lb = spark.table(f"{db}.lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no shuffle below the join: bucket layout satisfies the join's
        # distribution requirement on both sides
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # result sanity vs the plain (shuffling) join
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_aqe_splits_skewed_join_partition(spark):
    """Skew evidence beyond the salted sessionizer: AQE detects the hot key
    at runtime and splits its partition across tasks (skew=true in the
    final SortMergeJoin), with results identical to the unoptimized join.
    Thresholds are lowered because a constant hot key compresses to almost
    nothing in shuffle blocks at test scale."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # the groupBy after the join would make AQE skip the split (it adds a
    # shuffle); force it so the test pins the mechanism itself
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try:
        left = spark.range(300000).select(
            F.when(F.col("id") % 10 == 0, F.col("id") % 97)
            .otherwise(F.lit(1))
            .alias("k")
        )
        right = spark.range(97).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
        )
        j = left.join(right, "k").groupBy("grp").count()
        got = sorted(map(tuple, j.collect()))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain = sorted(
            map(tuple, left.join(right, "k").groupBy("grp").count().collect())
        )
        assert got == plain
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_gap_stats_single_exchange(spark):
    p = plan_of(spark, "session_gap_stats")
    # the lag window's user_id partitioning is reused by the aggregate
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_pivot_no_distinct_values_job(spark):
    # explicit pivot values → pivotfirst with the list baked in (no eager
    # distinct-values scan); (day,type) pre-agg + day agg = two exchanges
    p = plan_of(spark, "events_daily_pivot")
    assert "pivotfirst(event_type" in p
    assert "click, error, purchase, signup, view" in p
    assert p.count("Exchange hashpartitioning") == 2


def test_inactivity_sessions_single_exchange(spark):
    p = plan_of(spark, "inactivity_sessions")
    # lag window, running sum, and final agg all share the user_id key
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_q13_preaggregates_before_join(spark):
    p = plan_of(spark, "cust_order_count_histogram")
    assert "CartesianProduct" not in p
    # orders must collapse to (custkey, count) before any join: the order
    # scan feeds a hash aggregate, never the join directly
    scan_part = p.split("orders.parquet", 1)[0]
    assert "Join" not in scan_part.rsplit("HashAggregate", 1)[-1]
    # two keyed exchanges: custkey pre-agg + the tiny histogram agg
    assert p.count("Exchange hashpartitioning") <= 2


def test_q17_brand_filter_pushed_and_no_cartesian(spark):
    p = plan_of(spark, "small_qty_part_revenue")
    assert "CartesianProduct" not in p
    assert "EqualTo(p_brand,Brand#5)" in p  # pushed to the part scan
    assert "BroadcastHashJoin" in p  # filtered part dim broadcasts


def test_q18_topk_and_semi_enrich(spark):
    p = plan_of(spark, "big_order_customers")
    assert "TakeOrderedAndProject" in p  # top-20 heaps, not a global sort
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_q21_scans_lineitem_once(spark):
    # the EXISTS/NOT-EXISTS decorrelation means NO lineitem self-join:
    # exactly one scan of the fact table in the whole plan
    p = plan_of(spark, "supplier_wait_blame")
    assert p.count("lineitem.parquet") == 1
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_cube_is_one_pass(spark):
    p = plan_of(spark, "sales_cube")
    assert "Expand" in p  # cube = Expand -> ONE aggregate, not 4 scans
    assert p.count("orders.parquet") == 1


def test_moving_stats_single_exchange(spark):
    p = plan_of(spark, "events_moving_stats")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_value_ranks_single_window_pass(spark):
    p = plan_of(spark, "events_value_ranks")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p
    assert p.count("Window") == 1  # all four functions share one window spec


def test_range_join_stays_equi(spark):
    # the bucketized band join must plan as an equi-join on the composite
    # (user, bucket) key — never a nested-loop over the range predicate
    p = plan_of(spark, "purchase_window_clicks")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_scd2_single_exchange(spark):
    # lag filter and lead stitch share one (user_id; ts, event_id) sort
    p = plan_of(spark, "user_props_scd2")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Window") <= 2  # no extra sort between the two windows
    assert "Exchange SinglePartition" not in p


def test_set_ops_plan_as_joins(spark):
    p = plan_of(spark, "clickers_not_buyers")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    p = plan_of(spark, "signup_to_purchase_users")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_q7_two_row_nation_broadcasts(spark):
    p = plan_of(spark, "nation_trade_flows")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 4
    # nation-pair filter pushed into both nation scans
    assert p.count("In(n_name, [NATION_1,NATION_2])") == 2


def test_daily_dense_spine_is_distributed(spark):
    p = plan_of(spark, "events_daily_dense")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # daily counts broadcast into the spine
    # the only SinglePartition exchange allowed is the 1-row bounds agg
    assert p.count("Exchange SinglePartition") <= 1


def test_q22_scalar_broadcast_and_anti_join(spark):
    p = plan_of(spark, "idle_rich_customers")
    # the global-average scalar joins as a 1-row broadcast, not a data-sized
    # cartesian; NOT EXISTS plans as LeftAnti on date-filtered orders
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in p
    assert "LeftAnti" in p
    assert "GreaterThanOrEqual(o_orderdate" in p  # pushed to the orders scan


def test_pareto_uses_distributed_prefix_sum(spark):
    p = plan_of(spark, "revenue_pareto_front")
    assert "rangepartitioning" in p  # stage 1 of the two-stage cumsum
    # SinglePartition allowed only for the #partitions offsets frame and
    # the 1-row final/total aggregates — never the customer data path
    assert p.count("Exchange SinglePartition") <= 3
    assert "CartesianProduct" not in p


def test_q10_filters_push_before_big_join(spark):
    p = plan_of(spark, "returned_item_losses")
    assert "TakeOrderedAndProject" in p
    assert "EqualTo(l_returnflag,R)" in p  # return flag at the lineitem scan
    assert "GreaterThanOrEqual(o_orderdate" in p  # quarter at the orders scan
    assert "CartesianProduct" not in p


def test_q19_or_predicate_splits_to_both_scans(spark):
    p = plan_of(spark, "bracketed_discount_revenue")
    # Catalyst derives single-side implications from the cross-side OR and
    # pushes each side's OR-of-ANDs tree into its own scan's PushedFilters
    assert "Or(Or(And(EqualTo(p_brand,Brand#3)" in p  # part scan
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in p  # lineitem scan
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_asof_stale_guard_single_exchange(spark):
    # the tolerance guard must add ZERO shuffles over the plain as-of:
    # both value and ts carries share one (user_id; ts, event_id) window
    p = plan_of(spark, "events_asof_stale_guard")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Window") == 1
    assert "Exchange SinglePartition" not in p


def test_q6_scan_bound_plan(spark):
    p = plan_of(spark, "forecast_revenue_change")
    # a scan-bound aggregate: predicates at the reader, 4-column projection,
    # no join, no data-wide exchange (only the final 1-row combine).  The
    # plan string truncates long filter lists, so assert on the FileScan
    # column bracket and the DataFilters prefix that always prints.
    scan = [l for l in p.split("\n") if "FileScan parquet" in l][0]
    cols = scan.split("FileScan parquet [", 1)[1].split("]", 1)[0]
    assert "l_extendedprice" in cols and "l_quantity" in cols
    assert "l_orderkey" not in cols  # projection pruned to the 4 used cols
    assert "isnotnull(l_shipdate" in scan  # filters reached the reader
    assert "Join" not in p


def test_q8_market_share_plan(spark):
    p = plan_of(spark, "nation_market_share")
    # every dimension broadcasts; no cartesian; the share never self-joins
    assert p.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in p
    assert "PushedFilters: [IsNotNull(p_type), EqualTo(p_type,PROMO)" in p
    assert "EqualTo(r_name,ASIA)" in p


def test_q15_view_reuse_plan(spark):
    p = plan_of(spark, "top_supplier_revenue")
    # tie-safe max over the revenue view joined back via broadcast, and the
    # ship-date window reaches the scan
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "GreaterThanOrEqual(l_shipdate" in p


def test_q2_min_struct_plan(spark):
    p = plan_of(spark, "min_price_supplier_per_part")
    # correlated-min as min(struct): one aggregate, no window, no
    # per-part subquery join explosion
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "PushedFilters: [IsNotNull(p_size), LessThan(p_size,10)" in p


def test_semdedup_cell_confined_plan(spark):
    p = plan_of(spark, "semdedup_prune")
    # the pairwise-cosine join is keyed on cent_id (cell-confined) — a
    # cross join here would be the all-pairs scale-killer
    assert "CartesianProduct" not in p


def test_q9_profit_dims_broadcast(spark):
    p = plan_of(spark, "product_type_profit")
    # part/supplier/nation (and at this SF even orders) build broadcast
    # sides; the profit expression is a single integer sum — no second pass
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p
    assert "StartsWith" in p or "StringContains(p_name,gear)" in p or "Filter" in p
    assert p.count("HashAggregate") == 2  # partial + final, one agg pass


def test_q11_scalar_threshold_plan(spark):
    p = plan_of(spark, "important_part_values")
    # the grand total joins back as a 1-row broadcast nested-loop (the Q22
    # convention) — never a data-wide cartesian; nation filter is pushed
    assert "BroadcastNestedLoopJoin BuildRight" in p
    assert "CartesianProduct" not in p
    assert "EqualTo(n_name,NATION_3)" in p


def test_q12_lateness_plan(spark):
    p = plan_of(spark, "priority_lateness_by_status")
    # ship-date year window reaches the lineitem reader; the lateness
    # compare rides the join (row-local), and both priority counts come
    # from ONE aggregate pass
    assert "GreaterThanOrEqual(l_shipdate,1997-01-01" in p
    assert "CartesianProduct" not in p
    assert "Window" not in p


def test_q16_blacklist_anti_join_plan(spark):
    p = plan_of(spark, "supplier_count_by_part_attr")
    # NOT IN realizes as a broadcast LeftAnti (map-side drop); the filtered
    # part dim broadcasts; no cartesian anywhere
    assert "LeftAnti, BuildRight" in p
    assert "CartesianProduct" not in p
    assert "LessThan(s_acctbal,0.0)" in p


def test_q20_semi_chain_plan(spark):
    p = plan_of(spark, "promo_part_suppliers")
    # both IN subqueries realize as broadcast LeftSemi joins: the part
    # family filters the lineitem scan map-side, and the qualifying
    # supplier set broadcasts back — supplier itself is never shuffled
    assert p.count("LeftSemi, BuildRight") >= 2
    assert "CartesianProduct" not in p
    assert "GreaterThan(s_acctbal,0.0)" in p


def test_reservoir_per_group_topk_pushdown(spark):
    """The keyed reservoir's rank<=k filter must plan as WindowGroupLimit
    (Partial before the shuffle + Final after), so mega-groups keep a
    k-row heap per task instead of fully sorting."""
    from wolf_quake_spark.queries import queries

    plan = (
        queries()["reservoir_sample_per_lang"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    assert "Partial" in plan and "Final" in plan
