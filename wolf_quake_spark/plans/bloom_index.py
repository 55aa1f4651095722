"""Per-partition Bloom-filter index for point-lookup partition skipping.

The min/max stats in ``plans/partition_transforms.py``'s manifest prune
RANGE predicates; they are useless for a point lookup on a high-cardinality
key (``conv_id = 'c-93af…'``) because every partition's [min, max] spans
the whole key space.  Iceberg solves this with Bloom-filter blobs in Puffin
files (iceberg spec §Puffin, blob type ``apache-datasketches-theta-v1`` /
parquet's own ``bloom_filter``); this module is the same idea over the
repo's emulated table format: one Bloom bitset per partition directory,
stored in a JSON sidecar next to ``_partition_manifest.json``.

Construction is ONE distributed aggregation — explode each row's k bit
positions, ``groupBy(partition values, word index).agg(bit_or)`` — so the
driver collects at most ``n_partitions × m/60`` small rows no matter how
many rows the table has.  At 100 TB with day×bucket partitioning that is a
few thousand rows of int64 words for a table of 10^12 turns.

Hashing is the repo's portable md5-nibble fold (same substitution note as
``partition_transforms.bucket``): k seeded hashes ``fold(md5('bf<i>|' ||
value))[0:8] mod m``.  Portable means the ``bloom_partition_words``
registry query is oracle-checkable in DuckDB bit-for-bit; a production
port swaps in parquet's murmur/xxhash blocked bloom.  Words hold 60 bits
(shift < 60) so the stored values stay positive int64 in both engines —
no signed-overflow divergence between Spark ``shiftleft`` and DuckDB
``<<``.

No false negatives by construction: a value present in a partition always
sets bits the probe re-derives with the same expressions (the probe runs a
one-row Spark job rather than re-implementing the hash driver-side).
False positives only cost reading one extra partition — the residual
filter keeps results exact.

Reference parity: beyond-reference surface (the reference reads one log
file); driven by the north rule's Iceberg-table framing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wolf_quake_spark.plans.partition_transforms import (
    MANIFEST,
    _fold,
    _part_dir,
)

WORD_BITS = 60  # keep 1 << bit positive in signed int64 for Spark AND DuckDB


def bloom_positions(col: Column, m: int, k: int) -> Column:
    """Array of k bit positions in [0, m) for ``col`` (portable hash)."""
    return F.array(
        *[
            _fold(F.md5(F.concat(F.lit(f"bf{i}|"), col.cast("string"))), 0, 8)
            % m
            for i in range(k)
        ]
    )


def bloom_words_frame(
    df: DataFrame, part: Column, col: str, m: int, k: int
) -> DataFrame:
    """Per-partition Bloom words: ``(part, word, bits)`` — the one
    distributed aggregation both the index builder and the oracle-paired
    registry query share.  NULL key values set no bits (SQL equality to
    NULL is never true, so a point lookup never needs them)."""
    if m % WORD_BITS:
        raise ValueError(f"m must be a multiple of {WORD_BITS}")
    pos = (
        df.where(F.col(col).isNotNull())
        .select(part.alias("part"), F.explode(bloom_positions(F.col(col), m, k)).alias("p"))
    )
    return (
        pos.groupBy(
            "part",
            (F.col("p") / WORD_BITS).cast("long").alias("word"),
        )
        .agg(
            F.expr(f"bit_or(shiftleft(cast(1 as bigint), cast(p % {WORD_BITS} as int)))").alias(
                "bits"
            )
        )
    )


def bloom_words_sql(m: int, k: int, col: str, part_sql: str, table: str) -> str:
    """DuckDB mirror of ``bloom_words_frame`` (same portable hash)."""
    from wolf_quake_spark.portable_hash import fold_sql

    def fold(seed: int) -> str:
        acc = fold_sql(f"md5('bf{seed}|' || CAST({col} AS VARCHAR))", 0, 8)
        return f"({acc} % {m})"

    hashes = ", ".join(f"({fold(i)})" for i in range(k))
    return f"""
    WITH pos AS (
        SELECT {part_sql} AS part, unnest([{hashes}]) AS p
        FROM {table} WHERE {col} IS NOT NULL
    )
    SELECT part, CAST(p // {WORD_BITS} AS BIGINT) AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(p % {WORD_BITS} AS INTEGER)) AS bits
    FROM pos GROUP BY 1, 2
    """


BLOOM_SIDECAR = "_bloom_{col}.json"
NULL_PART = "__HIVE_DEFAULT_PARTITION__"  # NULL partition values in the key


def _sizing(max_rows: int, bits_per_row: int) -> int:
    """Smallest WORD_BITS multiple ≥ max(1024, max_rows × bits_per_row)."""
    want = max(1024, max_rows * bits_per_row)
    return ((want + WORD_BITS - 1) // WORD_BITS) * WORD_BITS


def build_bloom_index(
    spark: SparkSession,
    table_dir: str,
    col: str,
    bits_per_row: int = 10,
    k: int = 5,
) -> dict:
    """Build the per-partition Bloom sidecar for ``col`` over a
    hidden-partitioned table written by ``write_hidden_partitioned``.

    ``m`` is sized from the manifest's largest partition row count (one
    shared m keeps the aggregation single-pass; small partitions just get
    a sparser filter).  Words are stored sparsely ({word: bits}) so empty
    regions cost nothing in the JSON.
    """
    with open(os.path.join(table_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    part_cols = [p["name"] for p in manifest["spec"]]
    m = _sizing(max((p["n_rows"] for p in manifest["partitions"]), default=0), bits_per_row)

    raw = spark.read.option("basePath", table_dir).parquet(table_dir)
    part = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(NULL_PART))
            for c in part_cols
        ],
    )
    words = bloom_words_frame(raw, part, col, m, k).collect()

    parts: dict[str, dict[str, int]] = {}
    for r in words:
        parts.setdefault(r["part"], {})[str(r["word"])] = r["bits"]
    sidecar = {"col": col, "m": m, "k": k, "part_cols": part_cols, "partitions": parts}
    with open(os.path.join(table_dir, BLOOM_SIDECAR.format(col=col)), "w") as fh:
        json.dump(sidecar, fh, sort_keys=True)
    return sidecar


def bloom_point_lookup(
    spark: SparkSession, table_dir: str, col: str, value
) -> tuple[DataFrame, dict]:
    """Point lookup ``col = value`` reading only partitions whose Bloom
    may contain the value; exact equality re-applied as the residual
    filter.  Returns (frame, scan report).

    The probe's bit positions come from a one-row Spark job using the
    SAME expressions the builder used — build/probe hash parity is by
    construction, not by a reimplementation.
    """
    if value is None:
        raise ValueError("point lookup on NULL is never true in SQL")
    with open(os.path.join(table_dir, BLOOM_SIDECAR.format(col=col))) as fh:
        sidecar = json.load(fh)
    m, k = sidecar["m"], sidecar["k"]
    probe = (
        spark.range(1)
        .select(F.explode(bloom_positions(F.lit(value), m, k)).alias("p"))
        .collect()
    )
    positions = [r["p"] for r in probe]

    with open(os.path.join(table_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    part_cols = sidecar["part_cols"]
    keep = []
    for part in manifest["partitions"]:
        key = "\x1f".join(
            NULL_PART if part["values"][c] is None else str(part["values"][c])
            for c in part_cols
        )
        words = sidecar["partitions"].get(key, {})
        if all(
            int(words.get(str(p // WORD_BITS), 0)) >> (p % WORD_BITS) & 1
            for p in positions
        ):
            keep.append(part)
    report = {
        "partitions_total": len(manifest["partitions"]),
        "partitions_read": len(keep),
        "rows_in_read_partitions": sum(p["n_rows"] for p in keep),
    }
    if not keep:
        return spark.read.parquet(table_dir).limit(0), report
    paths = [_part_dir(table_dir, p["values"], part_cols) for p in keep]
    raw = spark.read.option("basePath", table_dir).parquet(*paths)
    dtype = raw.schema[col].dataType
    return raw.where(F.col(col) == F.lit(value).cast(dtype)), report
