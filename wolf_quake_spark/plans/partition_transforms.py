"""Iceberg-style hidden partition transforms + manifest-pruned reads.

The north rule targets Iceberg tables of transcripts; this container has no
Iceberg runtime jars, so (same convention as the snapshot/changes layer in
``plans/checkpoint.py``) the TABLE FORMAT is emulated as parquet + a JSON
manifest while the TRANSFORM SEMANTICS follow the Iceberg spec
(https://iceberg.apache.org/spec/#partition-transforms):

* ``bucket[N]``  — deterministic hash of the value, mod N.  The spec pins
  32-bit Murmur3; we use the repo's portable md5-nibble hash instead so
  every derived partition value is oracle-checkable in DuckDB (the
  contract that matters — deterministic, uniform, null-safe — is kept;
  the exact hash function is a sandbox substitution, called out here so a
  production port would swap in ``F.expr("murmur3")``-compatible hashing).
* ``truncate[W]`` — integers: ``v - (((v % W) + W) % W)`` (= ``W *
  floor(v / W)``, spec-exact including negatives); strings: first W chars.
* ``year / month / day / hour`` — UTC date parts of a timestamp (the
  session pins ``spark.sql.session.timeZone=UTC``), rendered as the
  spec's human-readable partition values (``2026``, ``2026-08``,
  ``2026-08-19``, ``2026-08-19-14``).
* NULL source values map to NULL partition values (spec rule), which
  parquet's partitionBy renders as ``__HIVE_DEFAULT_PARTITION__``.

"Hidden" means queries filter on the SOURCE column and the reader prunes
derived partitions itself — the user never mentions the partition column.
``pruned_read`` does that with the manifest's per-partition min/max stats
of each source column: a range predicate on the source column selects only
the partition directories whose stats intersect, then re-applies the exact
predicate as a residual filter (Iceberg's manifest-entry pruning, spec
§Scan Planning).  At 100 TB this is the difference between reading one
day's directory and scanning three years of transcripts.

Reference parity: wolf_quake reads one log file (reference/src/main.rs);
partition layout is beyond-reference surface driven by the north rule's
"Iceberg table ... partitioning handled explicitly".
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# canonical portable fold lives in portable_hash (one definition repo-wide);
# the old private names stay importable for existing call sites
from wolf_quake_spark.portable_hash import HEX as _HEX  # noqa: F401
from wolf_quake_spark.portable_hash import fold as _fold
from wolf_quake_spark.portable_hash import fold_sql as _fold_sql
from wolf_quake_spark.portable_hash import nib as _nib  # noqa: F401


def bucket(n: int, col: str) -> Column:
    """bucket[n]: portable-hash mod n, NULL-safe (see module docstring)."""
    h = F.md5(F.concat(F.lit("bkt"), F.col(col).cast("string")))
    return F.when(F.col(col).isNull(), F.lit(None)).otherwise(
        (_fold(h, 0, 8) % n).cast("int")
    )


def truncate(w: int, col: str) -> Column:
    """truncate[w]: W*floor(v/W) for integers (negatives included),
    substring for strings.  Type is resolved at plan time by the caller
    passing the right variant; this helper dispatches on use."""
    c = F.col(col)
    return c - (((c % w) + w) % w)


def truncate_str(w: int, col: str) -> Column:
    return F.substring(F.col(col), 1, w)


def years(col: str) -> Column:
    return F.date_format(col, "yyyy")


def months(col: str) -> Column:
    return F.date_format(col, "yyyy-MM")


def days(col: str) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


def hours(col: str) -> Column:
    return F.date_format(col, "yyyy-MM-dd-HH")


# DuckDB mirrors (for oracle-paired transform-value queries)
def bucket_sql(n: int, col: str) -> str:
    fold = _fold_sql(f"md5('bkt' || CAST({col} AS VARCHAR))", 0, 8)
    return (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"ELSE CAST({fold} % {n} AS INTEGER) END"
    )


def truncate_sql(w: int, col: str) -> str:
    return f"({col} - ((({col} % {w}) + {w}) % {w}))"


def days_sql(col: str) -> str:
    return f"strftime({col}, '%Y-%m-%d')"


def hours_sql(col: str) -> str:
    return f"strftime({col}, '%Y-%m-%d-%H')"


def months_sql(col: str) -> str:
    return f"strftime({col}, '%Y-%m')"


@dataclass
class PartitionSpec:
    """One hidden-partition field: derived name, source column, transform."""

    name: str
    source: str
    expr: Column


MANIFEST = "_partition_manifest.json"


def _dump_manifest(out_dir: str, manifest: dict) -> None:
    """tmp+rename: the manifest write is the commit point of every
    write/append — a crash mid-write must leave the previous manifest
    intact (same discipline as ``_spec_log_dump`` / ``ann_index._dump_meta``),
    never a truncated JSON that wedges every later pruned read/append."""
    path = os.path.join(out_dir, MANIFEST)
    with open(path + ".tmp", "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(path + ".tmp", path)


def write_hidden_partitioned(
    df: DataFrame, out_dir: str, spec: list[PartitionSpec]
) -> dict:
    """Write ``df`` partitioned by the spec's derived columns and record a
    manifest with per-partition row counts and min/max stats of every
    source column — the pruning index ``pruned_read`` consults.

    The stats aggregation is one hash-agg keyed by the derived partition
    tuple (same shuffle the write itself needs), so the manifest costs no
    extra full pass at scale.
    """
    derived = df
    for p in spec:
        derived = derived.withColumn(p.name, p.expr)
    part_cols = [p.name for p in spec]
    derived.write.mode("overwrite").partitionBy(*part_cols).parquet(out_dir)

    aggs = [F.count("*").alias("n_rows")]
    for p in spec:
        aggs.append(F.min(p.source).cast("string").alias(f"min_{p.source}"))
        aggs.append(F.max(p.source).cast("string").alias(f"max_{p.source}"))
    stats = derived.groupBy(*part_cols).agg(*aggs).collect()
    numeric = {
        p.source: df.schema[p.source].dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
        for p in spec
    }
    manifest = {
        "spec": [
            {"name": p.name, "source": p.source, "numeric": numeric[p.source]}
            for p in spec
        ],
        "partitions": [
            {
                "values": {c: (None if r[c] is None else str(r[c])) for c in part_cols},
                "n_rows": r["n_rows"],
                "stats": {
                    p.source: [r[f"min_{p.source}"], r[f"max_{p.source}"]]
                    for p in spec
                },
            }
            for r in stats
        ],
    }
    _dump_manifest(out_dir, manifest)
    return manifest


def _part_dir(out_dir: str, values: dict, part_cols: list[str]) -> str:
    # segment order MUST be spec order — the manifest JSON round-trips
    # through sort_keys=True, so values.items() order is alphabetical,
    # not the directory nesting order partitionBy wrote
    segs = [
        f"{k}={'__HIVE_DEFAULT_PARTITION__' if values[k] is None else values[k]}"
        for k in part_cols
    ]
    return os.path.join(out_dir, *segs)


def pruned_read(
    spark: SparkSession,
    out_dir: str,
    source_col: str,
    lo: str,
    hi: str,
) -> tuple[DataFrame, dict]:
    """Hidden-partition pruned scan: read only the partition directories
    whose manifest min/max stats of ``source_col`` intersect ``[lo, hi]``,
    then re-apply the exact predicate as the residual filter (bounds cast
    to the column's own type, so numeric and timestamp comparisons are
    typed, not lexical).  Returns (frame, scan report).

    The directory selection is manifest-driven (driver-side metadata only,
    like Iceberg scan planning); the data read is basePath-anchored so the
    partition columns stay available.  Stats are stored as canonical
    strings in the JSON manifest, compared by the SOURCE COLUMN'S TYPE
    recorded at write time: numeric columns numerically, everything else
    lexically (ISO timestamps/dates order correctly as strings, and
    string-column stats are lexical min/max, so a numeric-looking string
    value like an all-digits id must be compared lexically — a
    parseability heuristic would prune partitions the residual filter
    would have matched).
    """
    with open(os.path.join(out_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    spec_row = next(s for s in manifest["spec"] if s["source"] == source_col)
    # older manifests (pre-"numeric") fall back to lexical — never unsound,
    # only potentially under-pruning for numeric columns
    is_num = bool(spec_row.get("numeric", False))

    def key(v: str):
        return float(v) if is_num else v

    klo, khi = key(lo), key(hi)
    keep = []
    for part in manifest["partitions"]:
        mn, mx = part["stats"][source_col]
        if mn is None or mx is None:
            keep.append(part)  # all-NULL partition: stats can't exclude it
        elif not (key(mx) < klo or key(mn) > khi):
            keep.append(part)
    report = {
        "partitions_total": len(manifest["partitions"]),
        "partitions_read": len(keep),
        "rows_in_read_partitions": sum(p["n_rows"] for p in keep),
    }
    if not keep:
        empty = spark.read.parquet(out_dir).limit(0)
        return empty, report
    part_cols = [p["name"] for p in manifest["spec"]]
    paths = [_part_dir(out_dir, p["values"], part_cols) for p in keep]
    raw = spark.read.option("basePath", out_dir).parquet(*paths)
    dtype = raw.schema[source_col].dataType
    df = raw.where(
        F.col(source_col).between(
            F.lit(lo).cast(dtype), F.lit(hi).cast(dtype)
        )
    )
    return df, report


def pruned_read_points(
    spark: SparkSession,
    out_dir: str,
    source_col: str,
    values: list,
) -> tuple[DataFrame, dict]:
    """IN-list pruned scan (Iceberg scan planning with an IN predicate):
    keep only the partition directories whose manifest min/max stats of
    ``source_col`` can contain at least one of ``values``, then re-apply
    the exact ``isin`` predicate as the residual filter.  With an identity
    partition spec on ``source_col`` every kept directory IS one requested
    value — the point-lookup shape an IVF probe set or a tenant-id fetch
    wants: ``len(values)`` directories read out of the whole table."""
    with open(os.path.join(out_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    spec_row = next(s for s in manifest["spec"] if s["source"] == source_col)
    is_num = bool(spec_row.get("numeric", False))

    def key(v):
        return float(v) if is_num else str(v)

    vkeys = sorted(key(v) for v in values)
    keep = []
    for part in manifest["partitions"]:
        mn, mx = part["stats"][source_col]
        if mn is None or mx is None:
            keep.append(part)  # all-NULL partition: stats can't exclude it
        elif any(key(mn) <= vk <= key(mx) for vk in vkeys):
            keep.append(part)
    report = {
        "partitions_total": len(manifest["partitions"]),
        "partitions_read": len(keep),
        "rows_in_read_partitions": sum(p["n_rows"] for p in keep),
    }
    if not keep:
        empty = spark.read.parquet(out_dir).limit(0)
        return empty, report
    part_cols = [p["name"] for p in manifest["spec"]]
    paths = [_part_dir(out_dir, p["values"], part_cols) for p in keep]
    raw = spark.read.option("basePath", out_dir).parquet(*paths)
    dtype = raw.schema[source_col].dataType
    df = raw.where(
        F.col(source_col).isin(*[F.lit(v).cast(dtype) for v in values])
    )
    return df, report


def append_hidden_partitioned(
    df: DataFrame, out_dir: str, spec: list[PartitionSpec]
) -> dict:
    """Append to an existing hidden-partitioned table with O(added)
    metadata work: the new rows are written with ``mode("append")`` and
    only THEIR partition stats are aggregated, then merged into the
    existing manifest (min/max widen, n_rows add, new partitions insert) —
    the Iceberg commit discipline (per-snapshot manifests, never a full
    re-stat of the table).  Returns the merged manifest."""
    with open(os.path.join(out_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    derived = df
    for p in spec:
        derived = derived.withColumn(p.name, p.expr)
    part_cols = [p.name for p in spec]
    derived.write.mode("append").partitionBy(*part_cols).parquet(out_dir)

    aggs = [F.count("*").alias("n_rows")]
    for p in spec:
        aggs.append(F.min(p.source).cast("string").alias(f"min_{p.source}"))
        aggs.append(F.max(p.source).cast("string").alias(f"max_{p.source}"))
    stats = derived.groupBy(*part_cols).agg(*aggs).collect()
    numeric = {s["source"]: bool(s.get("numeric", False)) for s in manifest["spec"]}

    def _widen(old: str | None, new: str | None, src: str, take_min: bool):
        if old is None or new is None:
            # a NULL bound means the side is unknown/all-NULL — widening
            # with unknown stays unknown (never unsound, only under-pruning)
            return None
        ks = (lambda v: float(v)) if numeric[src] else (lambda v: v)
        better = min if take_min else max
        return old if better(ks(old), ks(new)) == ks(old) else new

    by_values = {
        tuple(sorted(p["values"].items())): p for p in manifest["partitions"]
    }
    for r in stats:
        vals = {c: (None if r[c] is None else str(r[c])) for c in part_cols}
        entry = by_values.get(tuple(sorted(vals.items())))
        if entry is None:
            manifest["partitions"].append(
                {
                    "values": vals,
                    "n_rows": r["n_rows"],
                    "stats": {
                        p.source: [r[f"min_{p.source}"], r[f"max_{p.source}"]]
                        for p in spec
                    },
                }
            )
        else:
            entry["n_rows"] += r["n_rows"]
            for p in spec:
                mn, mx = entry["stats"][p.source]
                entry["stats"][p.source] = [
                    _widen(mn, r[f"min_{p.source}"], p.source, True),
                    _widen(mx, r[f"max_{p.source}"], p.source, False),
                ]
    _dump_manifest(out_dir, manifest)
    return manifest


# --- partition spec EVOLUTION (multi-spec tables) --------------------------

SPEC_LOG = "_spec_log.json"


def parse_spec(descr: str) -> list[PartitionSpec]:
    """Transform-descriptor string → PartitionSpec list (derived names
    ``<col>_<kind>``): ``day:ts,hour:ts,bucket16:conv_id,trunc10:value,
    truncstr3:event_type``.  The canonical serialized form a spec log
    stores — Column exprs don't serialize, descriptors do."""
    out = []
    for item in descr.split(","):
        kind, col = item.split(":", 1)
        if kind == "day":
            out.append(PartitionSpec(f"{col}_day", col, days(col)))
        elif kind == "hour":
            out.append(PartitionSpec(f"{col}_hour", col, hours(col)))
        elif kind == "month":
            out.append(PartitionSpec(f"{col}_month", col, months(col)))
        elif kind == "year":
            out.append(PartitionSpec(f"{col}_year", col, years(col)))
        elif kind.startswith("truncstr"):
            w = int(kind[len("truncstr"):])
            out.append(PartitionSpec(f"{col}_t{w}", col, truncate_str(w, col)))
        elif kind.startswith("trunc"):
            w = int(kind[len("trunc"):])
            out.append(PartitionSpec(f"{col}_t{w}", col, truncate(w, col)))
        elif kind.startswith("bucket"):
            n = int(kind[len("bucket"):])
            out.append(PartitionSpec(f"{col}_b{n}", col, bucket(n, col)))
        else:
            raise ValueError(f"unknown transform {kind!r}")
    return out


def _spec_log_load(out_dir: str) -> dict:
    with open(os.path.join(out_dir, SPEC_LOG)) as fh:
        return json.load(fh)


def _spec_log_dump(out_dir: str, log: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, SPEC_LOG)
    with open(path + ".tmp", "w") as fh:
        json.dump(log, fh, indent=1, sort_keys=True)
    os.replace(path + ".tmp", path)


def create_evolving_table(df: DataFrame, out_dir: str, descr: str) -> dict:
    """Create a multi-spec hidden-partitioned table at spec 0."""
    log = {"current": 0, "specs": [descr], "next_commit": 0}
    _spec_log_dump(out_dir, log)
    return append_evolving(df, out_dir)


def evolve_partition_spec(out_dir: str, descr: str) -> int:
    """Change the table's partition layout WITHOUT rewriting any data —
    the Iceberg §Partition Evolution contract.  Metadata-only: the new
    spec is appended to the log and becomes current; every existing
    commit keeps its original directory layout and manifest, and the
    reader plans each commit under the spec it was WRITTEN with.  Returns
    the new spec id."""
    parse_spec(descr)  # validate before committing
    log = _spec_log_load(out_dir)
    log["specs"].append(descr)
    log["current"] = len(log["specs"]) - 1
    _spec_log_dump(out_dir, log)
    return log["current"]


def append_evolving(df: DataFrame, out_dir: str) -> dict:
    """Append a commit under the CURRENT spec: each commit is its own
    ``spec=<s>/commit=<c>`` directory with its own partition manifest (the
    per-manifest granularity Iceberg scan planning prunes at)."""
    log = _spec_log_load(out_dir)
    sid, cid = log["current"], log["next_commit"]
    sub = os.path.join(out_dir, f"spec={sid}", f"commit={cid}")
    manifest = write_hidden_partitioned(df, sub, parse_spec(log["specs"][sid]))
    log["next_commit"] = cid + 1
    _spec_log_dump(out_dir, log)
    return {"spec": sid, "commit": cid, "partitions": len(manifest["partitions"])}


def read_evolving_pruned(
    spark: SparkSession, out_dir: str, source_col: str, lo: str, hi: str
) -> tuple[DataFrame, dict]:
    """Range scan over a multi-spec table: every commit is pruned under
    the spec it was written with — commits whose spec partitions on
    ``source_col`` use their manifest min/max stats, commits whose spec
    doesn't are read in full (honestly reported) — and the residual
    predicate keeps every arm exact.  This is why partition evolution is
    safe: a query never depends on WHICH spec a row landed under, only
    pruning effectiveness differs.

    Derived partition columns (which differ across specs) are dropped
    before the union, so the result schema is the source schema for every
    spec mix."""
    log = _spec_log_load(out_dir)
    frames = []
    specs_report = []
    for sid, descr in enumerate(log["specs"]):
        spec_dir = os.path.join(out_dir, f"spec={sid}")
        if not os.path.isdir(spec_dir):
            continue
        # honor the committed horizon: append_evolving bumps next_commit
        # only AFTER the parquet + manifest land, so a crash between the
        # write and the bump leaves a commit= dir that was never
        # acknowledged (possibly torn, missing its MANIFEST).  Listing the
        # directory alone would read it; gating on cid < next_commit keeps
        # uncommitted dirs invisible, matching the journaled crash
        # discipline of plans/deletes.py and plans/snapshots.py.
        commits = sorted(
            d
            for d in os.listdir(spec_dir)
            if d.startswith("commit=") and int(d[7:]) < log["next_commit"]
        )
        spec = parse_spec(descr)
        sources = {p.source for p in spec}
        derived = [p.name for p in spec]
        pruned = source_col in sources
        srep = {
            "spec": sid, "descr": descr, "commits": len(commits),
            "pruned": pruned, "partitions_total": 0, "partitions_read": 0,
        }
        for c in commits:
            sub = os.path.join(spec_dir, c)
            if pruned:
                df, rep = pruned_read(spark, sub, source_col, lo, hi)
                srep["partitions_total"] += rep["partitions_total"]
                srep["partitions_read"] += rep["partitions_read"]
            else:
                raw = spark.read.option("basePath", sub).parquet(sub)
                dtype = raw.schema[source_col].dataType
                df = raw.where(
                    F.col(source_col).between(
                        F.lit(lo).cast(dtype), F.lit(hi).cast(dtype)
                    )
                )
                with open(os.path.join(sub, MANIFEST)) as fh:
                    n = len(json.load(fh)["partitions"])
                srep["partitions_total"] += n
                srep["partitions_read"] += n
            frames.append(df.drop(*derived))
        specs_report.append(srep)
    if not frames:
        raise ValueError(f"evolving table {out_dir!r} has no data commits")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out, {"specs": specs_report}
