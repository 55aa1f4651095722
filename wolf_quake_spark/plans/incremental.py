"""Incremental view maintenance over the batch lineage (materialized-view
refresh that never reprocesses old data).

The lineage manifest (plans/checkpoint.py) makes each sink an append log of
committed ``batch=<id>`` directories; any DISTRIBUTIVE aggregate over a sink
(counts, sums — anything with a merge function) can therefore be maintained
by folding only the batches committed since the last refresh into the stored
aggregate:

    new_view = reaggregate( old_view  ∪  aggregate(new batches) )

Cost per refresh is O(new data) + O(view size) — the view is re-read, but a
view is aggregate-sized (here: ≤29 MOD rows), never data-sized, so at
10¹²-turn scale a refresh touches only the latest batches.  This is the
Spark-side analog of an Iceberg incremental-scan consumer feeding a
materialized view.

The refresh itself is transactional against crashes: the new view lands in a
fresh ``v<N>`` directory, and a single atomic pointer-file replace flips
readers to it together with the processed-batch watermark; a crash before
the flip leaves the old view + watermark intact (the orphan ``v<N>`` dir is
re-overwritten on retry).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wolf_quake_spark.plans.checkpoint import Manifest


def _load_state(view_dir: str) -> dict:
    p = os.path.join(view_dir, "_view_state.json")
    if os.path.exists(p):
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)
    return {"processed": [], "version": 0}


def _store_state(view_dir: str, state: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=view_dir, prefix="._view_state_")
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(view_dir, "_view_state.json"))


def read_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """Current contents of the materialized view (via the version pointer)."""
    state = _load_state(view_dir)
    if state["version"] == 0:
        raise FileNotFoundError(f"no materialized view in {view_dir}")
    return spark.read.parquet(os.path.join(view_dir, f"v{state['version']}"))


def refresh_mod_totals(
    spark: SparkSession, out_dir: str, view_dir: str
) -> dict:
    """Maintain ``mod_totals(mod_name, n_kills)`` over the ``kills`` sink.

    Folds only batches committed since the previous refresh; returns a
    report with the batch ids processed this call (empty = no-op).
    """
    os.makedirs(view_dir, exist_ok=True)
    state = _load_state(view_dir)
    done = set(state["processed"])
    recs = Manifest(out_dir).records()
    new = [r.batch_id for r in recs if r.batch_id not in done]
    if not new:
        return {"processed_now": [], "version": state["version"]}

    # consume via the changes feed (checkpoint.read_changes) so this job and
    # ad-hoc incremental consumers share one definition of "new commits".
    # `since` must be in COMMIT order (the stored processed list is sorted
    # for readability, and each refresh consumes every new commit, so the
    # processed set is always a commit-log prefix — its last element in
    # manifest order is the true watermark).
    from wolf_quake_spark.plans.checkpoint import read_changes

    done_in_order = [r.batch_id for r in recs if r.batch_id in done]
    since = done_in_order[-1] if done_in_order else None
    changed, _wm = read_changes(spark, out_dir, "kills", since)
    delta = changed.groupBy("mod_name").agg(F.count("*").alias("n_kills"))
    if state["version"] > 0:
        old = spark.read.parquet(os.path.join(view_dir, f"v{state['version']}"))
        merged = (
            old.unionByName(delta)
            .groupBy("mod_name")
            .agg(F.sum("n_kills").cast("long").alias("n_kills"))
        )
    else:
        merged = delta.select("mod_name", F.col("n_kills").cast("long"))

    next_version = state["version"] + 1
    target = os.path.join(view_dir, f"v{next_version}")
    merged.write.mode("overwrite").parquet(target)
    _store_state(
        view_dir,
        {"processed": sorted(done | set(new)), "version": next_version},
    )
    # retain the immediately-previous version for one refresh cycle: a reader
    # that loaded _view_state.json just before the pointer flip may still be
    # mid-read of v<N-1>, so only v<N-2> (two flips stale) is reclaimed
    stale = next_version - 2
    if stale > 0:
        shutil.rmtree(os.path.join(view_dir, f"v{stale}"), ignore_errors=True)
    return {"processed_now": new, "version": next_version}
