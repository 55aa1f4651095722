"""Iceberg-style schema evolution over the emulated parquet table format.

Iceberg's evolution guarantees (spec §Schema Evolution) rest on one idea:
every column has a permanent numeric **field id**; data files store ids,
and readers resolve the CURRENT schema against each file by id, never by
name.  That makes add / rename / drop metadata-only operations — no data
file is ever rewritten, and a rename can never resurrect a dropped
column's data ("no side effects" rule).

Plain parquet under Spark has no field ids, so (same emulation convention
as ``plans/partition_transforms.py`` / ``plans/checkpoint.py``) the ids
live in a JSON schema log next to the data:

* ``_schema_log.json`` — append-only list of schema versions; each version
  maps field id → (name, spark type).  Writes stamp their schema version
  into the file path (``schema_version=N`` subdirectory), so a reader
  knows which historical name each file used for a given id.
* ``evolve(...)`` appends a new version built from add/rename/drop ops.
  Ids are never reused (Iceberg's invariant): adds allocate fresh ids,
  renames keep the id, drops retire it permanently.
* ``read_evolved`` reads every version's files with that version's
  name↦id mapping, renames to the CURRENT names by id, fills columns a
  file predates with NULL (Iceberg's missing-field rule), drops retired
  columns, and unions by the current schema.  The per-version reads stay
  separate parquet scans (column pruning still reaches each scan); the
  union is a zero-shuffle bag union.

At 100 TB this is the difference between an ALTER TABLE that finishes in
milliseconds and a petabyte rewrite.  Reference parity: beyond-reference
surface (the reference has one fixed struct, quake3_data.rs); driven by
the north rule's Iceberg-table framing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_LOG = "_schema_log.json"


@dataclass
class Field:
    fid: int
    name: str
    dtype: str  # Spark DDL type string


def _log_path(table_dir: str) -> str:
    return os.path.join(table_dir, SCHEMA_LOG)


def _load_log(table_dir: str) -> list[dict]:
    with open(_log_path(table_dir)) as fh:
        return json.load(fh)


def _dump_log(table_dir: str, log: list[dict]) -> None:
    os.makedirs(table_dir, exist_ok=True)
    with open(_log_path(table_dir), "w") as fh:
        json.dump(log, fh, indent=1, sort_keys=True)


def _version_entry(version: int, fields: list[Field], last_id: int) -> dict:
    return {
        "version": version,
        "last_assigned_id": last_id,
        "fields": [{"id": f.fid, "name": f.name, "type": f.dtype} for f in fields],
    }


def create_table(table_dir: str, schema: list[tuple[str, str]]) -> dict:
    """Initialize the schema log from (name, spark-type) pairs; ids are
    assigned 1..n in declaration order (Iceberg assigns ids the same way
    on table creation)."""
    fields = [Field(i + 1, n, t) for i, (n, t) in enumerate(schema)]
    entry = _version_entry(0, fields, len(fields))
    _dump_log(table_dir, [entry])
    return entry


def evolve(
    table_dir: str,
    add: list[tuple[str, str]] = (),
    rename: dict[str, str] | None = None,
    drop: list[str] = (),
) -> dict:
    """Append a new schema version: pure metadata, no data touched.

    Name-based ops resolve against the latest version's names; adds get
    fresh ids above ``last_assigned_id`` (never reused, so a re-added
    name is a NEW column that reads NULL from files written before it —
    the Iceberg drop-then-add semantics)."""
    log = _load_log(table_dir)
    cur = log[-1]
    rename = rename or {}
    by_name = {f["name"]: f for f in cur["fields"]}
    for old in list(rename) + list(drop):
        if old not in by_name:
            raise ValueError(f"no such column: {old}")
    fields = [
        Field(f["id"], rename.get(f["name"], f["name"]), f["type"])
        for f in cur["fields"]
        if f["name"] not in set(drop)
    ]
    last = cur["last_assigned_id"]
    for name, dtype in add:
        if any(f.name == name for f in fields):
            raise ValueError(f"column already exists: {name}")
        last += 1
        fields.append(Field(last, name, dtype))
    seen: set[str] = set()
    for f in fields:
        if f.name in seen:
            raise ValueError(f"rename collides on: {f.name}")
        seen.add(f.name)
    entry = _version_entry(cur["version"] + 1, fields, last)
    log.append(entry)
    _dump_log(table_dir, log)
    return entry


def write_version(df: DataFrame, table_dir: str, mode: str = "append") -> str:
    """Append ``df`` under the CURRENT schema version's directory.  The
    frame must carry exactly the current names (the write-time schema
    check Iceberg performs)."""
    log = _load_log(table_dir)
    cur = log[-1]
    want = [f["name"] for f in cur["fields"]]
    if sorted(df.columns) != sorted(want):
        raise ValueError(f"frame columns {sorted(df.columns)} != schema v{cur['version']} {sorted(want)}")
    out = os.path.join(table_dir, f"schema_version={cur['version']}")
    df.select(*want).write.mode(mode).parquet(out)
    return out


def read_evolved(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the whole table under the CURRENT schema, resolving every
    historical file by field id: rename-by-id, NULL-fill for fields a
    version predates, drop retired fields, then a zero-shuffle union."""
    log = _load_log(table_dir)
    cur = log[-1]
    out: DataFrame | None = None
    for entry in log:
        vdir = os.path.join(table_dir, f"schema_version={entry['version']}")
        if not os.path.isdir(vdir):
            continue
        raw = spark.read.parquet(vdir)
        cols = []
        for f in cur["fields"]:
            hist = next(
                (h for h in entry["fields"] if h["id"] == f["id"]), None
            )
            if hist is None:
                cols.append(F.lit(None).cast(f["type"]).alias(f["name"]))
            else:
                cols.append(F.col(hist["name"]).cast(f["type"]).alias(f["name"]))
        part = raw.select(*cols)
        out = part if out is None else out.unionByName(part)
    if out is None:
        ddl = ", ".join(f"{f['name']} {f['type']}" for f in cur["fields"])
        return spark.createDataFrame([], ddl)
    return out
