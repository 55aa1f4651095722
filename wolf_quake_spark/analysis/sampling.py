"""Deterministic stratified sampling for corpus rebalancing.

Downsampling over-represented strata (languages, sources) is a standard
training-data step.  At cluster scale it must NOT use ``df.sample`` or
``rand()``: those are partition-order-dependent, so the kept set changes
with cluster size, task retries, and AQE re-planning — unacceptable for a
reproducible corpus.  A multiplicative hash of the stable document id gives
a sample that is identical on 1 core or 1000 executors, survives re-runs,
and needs no shuffle at all (pure filter, fully pushed into the scan stage).

The salt decorrelates this bucket from the train/val/test split hash
(analysis/contamination.py): a doc's sampling fate is independent of its
split assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.contamination import HASH_MOD, KNUTH


def hash_bucket(doc_id: Column, salt: int = 0) -> Column:
    """Deterministic 0..999 bucket from a stable id (Knuth multiplicative)."""
    return ((doc_id * F.lit(KNUTH) + F.lit(salt)) % F.lit(HASH_MOD)) % F.lit(1000)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.5,
    key: str = "lang",
    salt: int = 12345,
) -> DataFrame:
    """Keep each doc with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep rate in [0, 1]; strata not listed
    use ``default_rate``.  Pure narrow filter — zero shuffle, zero RNG.
    """
    thresh = F.lit(None)
    case = None
    for k in sorted(rates):
        cond = F.col(key) == k
        val = F.lit(int(round(rates[k] * 1000)))
        case = F.when(cond, val) if case is None else case.when(cond, val)
    thresh = (
        case.otherwise(F.lit(int(round(default_rate * 1000))))
        if case is not None
        else F.lit(int(round(default_rate * 1000)))
    )
    return docs.filter(hash_bucket(F.col("doc_id"), salt) < thresh)


def global_enumerate(
    df: DataFrame, order: list[Column], out_col: str = "position"
) -> DataFrame:
    """Total-order global row numbering WITHOUT a single-partition window.

    Three stages, all parallel in the data size:

    1. ``repartitionByRange`` on the sort keys — ascending partition id is
       ascending global order;
    2. partition-local ``row_number`` (parallel across partitions);
    3. global position = local number + offset, where offsets come from a
       per-partition count frame (#partitions rows, broadcast back).

    The only single-partition window runs over that count frame, bounded by
    the partition count, never the data size.  ``order`` must be a total
    order (include a unique tiebreak) or positions are nondeterministic.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 2)
    local = (
        df.repartitionByRange(nparts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*order)),
        )
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order: list[Column],
    out_col: str = "running_total",
) -> DataFrame:
    """Total-order global running sum WITHOUT a single-partition window —
    the prefix-sum sibling of :func:`global_enumerate` (same three stages;
    stage 3's offset is the sum of all earlier partitions' values instead
    of their row counts).  ``order`` must be a total order."""
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 2)
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        df.repartitionByRange(nparts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lcs", F.sum(value_col).over(local_w))
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lcs")).cast("long"))
        .drop("_pid", "_lcs", "_off")
    )


def training_order(docs: DataFrame, seed: str = "epoch-0") -> DataFrame:
    """Reproducible global shuffle of the corpus into a training order.

    Training runs need the corpus in a pseudo-random order that is identical
    across cluster sizes, task retries, and re-runs — ``df.sample``-style
    RNG or ``rand()`` ordering is partition-dependent and unacceptable.  The
    shuffle key is ``md5(seed || doc_id)``: changing ``seed`` gives a fresh
    epoch permutation, and the enumeration is the two-stage range-partition
    pattern (:func:`global_enumerate`) so no stage touches more than one
    partition's rows at a time.
    """
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return global_enumerate(
        keyed, [F.asc("shuffle_key"), F.asc("doc_id")], out_col="position"
    )
