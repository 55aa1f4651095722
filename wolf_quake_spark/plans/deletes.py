"""Iceberg-style merge-on-read equality deletes.

An equality delete file records key tuples plus the SEQUENCE NUMBER at
which the delete was committed; at read time a data row is dead iff some
delete with a HIGHER sequence number matches its keys (Iceberg spec
§Row-level deletes / §Sequence numbers).  Deleting 10^6 conv_ids from a
10^12-turn table therefore writes a few MB of delete files and rewrites
nothing; readers pay one broadcast join until a compaction folds the
deletes in.

Emulation convention (same as the rest of ``plans/``): data appends land
under ``data/seq=N/`` and delete files under ``deletes/seq=M/`` with a
JSON log tracking the sequence counter.  The read path:

1. aggregate the (typically tiny) delete relation to ``max(seq)`` per
   key tuple — at most one row per deleted key,
2. broadcast it into a left join against the data scan,
3. keep rows where no delete matched or the delete predates the row
   (``delete_seq <= data_seq`` — a row re-inserted AFTER a delete
   survives it, the Iceberg re-insert semantics).

``compact_deletes`` rewrites the survivors as one new data append and
clears the delete directory — the maintenance job that caps read-side
join cost; row-identity equality with the MoR read is pytest-enforced.

Reference parity: beyond-reference surface (the reference never mutates
its input); driven by the north rule's Iceberg-table framing.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

SEQ_LOG = "_seq_log.json"


def _load(table_dir: str) -> dict:
    try:
        with open(os.path.join(table_dir, SEQ_LOG)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"last_seq": 0, "key_cols": None}


def _dump(table_dir: str, state: dict) -> None:
    # tmp + os.replace (atomic on POSIX), same discipline as
    # plans/snapshots._dump: a crash mid-write must never leave a
    # truncated seq log that wedges every later _load
    os.makedirs(table_dir, exist_ok=True)
    path = os.path.join(table_dir, SEQ_LOG)
    with open(path + ".tmp", "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(path + ".tmp", path)


def append_data(df: DataFrame, table_dir: str) -> int:
    """Append a data file set at the next sequence number."""
    _recover(table_dir)
    state = _load(table_dir)
    seq = state["last_seq"] + 1
    df.write.mode("errorifexists").parquet(
        os.path.join(table_dir, "data", f"seq={seq}")
    )
    state["last_seq"] = seq
    _dump(table_dir, state)
    return seq


def append_equality_deletes(
    keys: DataFrame, table_dir: str, key_cols: list[str]
) -> int:
    """Commit an equality-delete file: kills every matching data row with
    a lower sequence number.  Key columns are pinned on first use."""
    _recover(table_dir)
    state = _load(table_dir)
    if state["key_cols"] is None:
        state["key_cols"] = key_cols
    elif state["key_cols"] != key_cols:
        raise ValueError(f"delete key cols pinned to {state['key_cols']}")
    seq = state["last_seq"] + 1
    keys.select(*key_cols).distinct().write.mode("errorifexists").parquet(
        os.path.join(table_dir, "deletes", f"seq={seq}")
    )
    state["last_seq"] = seq
    _dump(table_dir, state)
    return seq


def read_mor(spark: SparkSession, table_dir: str) -> DataFrame:
    """Merge-on-read scan: data minus sequence-applicable equality
    deletes.  The delete relation is max-seq-per-key then broadcast, so
    the data side never shuffles.  Rolls any interrupted compaction
    forward first (single-writer assumption) so survivors are never seen
    twice."""
    _recover(table_dir)
    data_dir = os.path.join(table_dir, "data")
    data = spark.read.option("basePath", data_dir).parquet(data_dir)
    del_dir = os.path.join(table_dir, "deletes")
    if not os.path.isdir(del_dir) or not os.listdir(del_dir):
        return data.drop("seq") if "seq" in data.columns else data
    key_cols = _load(table_dir)["key_cols"]
    dels = (
        spark.read.option("basePath", del_dir)
        .parquet(del_dir)
        .groupBy(*key_cols)
        .agg(F.max("seq").alias("_del_seq"))
    )
    joined = data.join(broadcast(dels), on=key_cols, how="left")
    return joined.where(
        F.col("_del_seq").isNull() | (F.col("_del_seq") <= F.col("seq"))
    ).drop("_del_seq", "seq")


JOURNAL = "_compact_journal.json"


def _recover(table_dir: str) -> None:
    """Finish or discard an interrupted compaction (single-writer).

    Crash windows (the journal is the commit point, written only after the
    rewrite is row-count-verified):

    * no journal + an ``_compacting_seq=`` orphan → the crash predates the
      commit point: remove the orphan, nothing else changed.
    * journal present → roll FORWARD: rename the staged dir into place if
      that hadn't happened yet (underscore prefix keeps it invisible to
      readers until this moment), then retire the journal's old data dirs
      and the delete dir, bump the seq log, drop the journal.  Every step
      is idempotent, so recovery itself may crash and rerun.
    """
    data_dir = os.path.join(table_dir, "data")
    jpath = os.path.join(table_dir, JOURNAL)
    if not os.path.exists(jpath):
        if os.path.isdir(data_dir):
            for d in os.listdir(data_dir):
                if d.startswith("_compacting_seq="):
                    shutil.rmtree(os.path.join(data_dir, d))
        return
    try:
        with open(jpath) as fh:
            j = json.load(fh)
    except (json.JSONDecodeError, OSError):
        # journals are written atomically (tmp + rename), so an
        # unparseable one predates that discipline or is fs corruption —
        # either way the swap never started (renames happen strictly
        # after the journal commit), so drop it, reclaim the staged
        # orphan, and let the compaction be redone (plans/compact.py
        # learned this the hard way: one truncated journal wedged every
        # subsequent call in recovery)
        os.remove(jpath)
        if os.path.isdir(data_dir):
            for d in os.listdir(data_dir):
                if d.startswith("_compacting_seq="):
                    shutil.rmtree(os.path.join(data_dir, d))
        return
    staged = os.path.join(data_dir, f"_compacting_seq={j['new_seq']}")
    final = os.path.join(data_dir, f"seq={j['new_seq']}")
    if os.path.isdir(staged) and not os.path.isdir(final):
        os.rename(staged, final)
    for d in j["old_dirs"]:
        p = os.path.join(data_dir, d)
        if os.path.isdir(p):
            shutil.rmtree(p)
    del_dir = os.path.join(table_dir, "deletes")
    if os.path.isdir(del_dir):
        shutil.rmtree(del_dir)
    state = _load(table_dir)
    if state["last_seq"] < j["new_seq"]:
        state["last_seq"] = j["new_seq"]
        _dump(table_dir, state)
    os.remove(jpath)


def compact_deletes(spark: SparkSession, table_dir: str) -> dict:
    """Materialize the MoR view as one new data append, then retire the
    old data files and all delete files.

    Crash-safe via a journaled swap (plans/compact.py discipline): the
    rewrite lands in an underscore-staged dir Spark readers ignore, is
    row-count-verified, then a journal commits the swap; ``_recover``
    (run here and by ``read_mor``) rolls an interrupted swap forward so
    readers can never see survivors twice and the seq counter can never
    collide with a half-finished rewrite."""
    _recover(table_dir)
    survivors = read_mor(spark, table_dir)
    n_before = survivors.count()
    state = _load(table_dir)
    seq = state["last_seq"] + 1
    data_dir = os.path.join(table_dir, "data")
    staged = os.path.join(data_dir, f"_compacting_seq={seq}")
    survivors.write.mode("overwrite").parquet(staged)
    n_after = spark.read.parquet(staged).count()
    if n_after != n_before:
        shutil.rmtree(staged)
        raise RuntimeError(f"compaction row mismatch {n_before} != {n_after}")
    old_dirs = [
        d for d in os.listdir(data_dir) if d.startswith("seq=")
    ]
    jpath = os.path.join(table_dir, JOURNAL)
    with open(jpath + ".tmp", "w") as fh:
        json.dump({"new_seq": seq, "old_dirs": old_dirs}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(jpath + ".tmp", jpath)  # atomic commit point
    _recover(table_dir)  # roll the committed swap forward
    return {"rows": n_after, "data_seq": seq}
