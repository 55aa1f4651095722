"""Materialized IVFADC index over the hidden-partitioned table layer.

:mod:`wolf_quake_spark.analysis.similarity` implements IVFADC (Jegou et
al., TPAMI'11 SS5) as a single self-contained query — it retrains both
quantizers on every call, and its search stage must join the PQ codes
back to the cell assignment on ``vec_id`` before the probe filter can
prune anything: a full-corpus shuffle per query, the exact cost IVF
exists to avoid.  A real deployment trains ONCE and searches millions of
times; this module is that split:

* :func:`ivfpq_build_index` — train coarse k-means + residual PQ with the
  SAME deterministic recipe as ``ivfpq_search`` (so results stay
  bit-identical and oracle-checkable), then write

  - ``codes/``      (vec_id, cent_id, sub_id, code_id), hidden-partitioned
                    by identity(cent_id) via
                    :func:`plans.partition_transforms.write_hidden_partitioned`
                    — ``cent_id`` is joined in ONCE here, at build time;
  - ``centroids/``  (cent_id, cvec), ~sqrt(n) rows;
  - ``codebook/``   (sub_id, code_id, cvec), m x ks rows;
  - ``_ivfpq_index.json``  m / w / ks / dim / n / iters.

* :func:`ivfpq_index_search` — probe selection against the tiny centroid
  table, then :func:`pruned_read_points` reads ONLY the probed cells'
  partition directories (manifest-driven, n_probes dirs of k_cells
  total), broadcast ADC lookup-table join, one bounded top-k.  No
  ``vec_id`` exchange anywhere: the only shuffle left is the final
  per-candidate aggregation over the pruned ~n*n_probes/k_cells rows.

* :func:`ivfpq_encode` / :func:`ivfpq_index_append` — assign NEW vectors
  to the FROZEN cells and codebooks (no retraining) and append their
  codes with O(added) manifest work — the daily ingestion operation of a
  100 TB deployment.  Encoding unchanged vectors under the frozen
  structures reproduces their stored codes exactly (parity-tested).

Reference parity: wolf_quake has no ANN surface (reference/src/main.rs
parses one log); this is beyond-reference scope from the training-data
brief, matching FAISS's IndexIVFPQ build/search/add split re-expressed as
Spark DataFrame plans over a pruned table layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from wolf_quake_spark.analysis.similarity import (
    PQ_M,
    SCALE,
    _l2,
    _member_centroids,
    _pq_core,
    _quant,
    derived_ks,
    kmeans_assign,
)
from wolf_quake_spark.plans.partition_transforms import (
    PartitionSpec,
    append_hidden_partitioned,
    pruned_read_points,
    write_hidden_partitioned,
)

INDEX_META = "_ivfpq_index.json"


def _codes_spec() -> list[PartitionSpec]:
    # built lazily: Column construction needs an active SparkContext
    return [PartitionSpec("cell", "cent_id", F.col("cent_id"))]


def _dirs(index_dir: str) -> tuple[str, str, str, str]:
    return (
        os.path.join(index_dir, "codes"),
        os.path.join(index_dir, "centroids"),
        os.path.join(index_dir, "codebook"),
        os.path.join(index_dir, "assign_centroids"),
    )


def ivfpq_build_index(
    embeddings: DataFrame,
    index_dir: str,
    m: int = PQ_M,
    iters: int = 2,
    vec_col: str = "embedding",
) -> dict:
    """Train and materialize the IVFADC index (see module docstring).

    Identical training recipe to ``similarity.ivfpq_search`` steps 1-2
    (k-means cells -> member-mean centroids -> residual PQ), so a search
    over the written index returns the same top-k bit for bit.  The codes
    are stored WITH their cell id — the one build-time ``vec_id`` join
    that every subsequent search no longer pays — and partitioned by it,
    so a probe set becomes partition pruning instead of a filter over a
    full scan.  Returns a small build report."""
    from pyspark import StorageLevel

    asg = kmeans_assign(embeddings, iters=iters, vec_col=vec_col)
    q = asg._wqs_persisted  # (vec_id, qe) DISK_ONLY
    kmeans_lloyd_cents = asg._wqs_centroids  # k driver rows
    asg = asg.persist(StorageLevel.DISK_ONLY)
    cents = _member_centroids(q, asg).persist(StorageLevel.DISK_ONLY)

    n = q.count()
    dim = len(q.select("qe").first()["qe"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    w = dim // m
    ks = derived_ks(n)

    resid = (
        q.join(asg, "vec_id")
        .join(broadcast(cents), "cent_id")
        .select("vec_id", F.zip_with("qe", "cvec", lambda x, y: x - y).alias("qe"))
    )
    codes, cb = _pq_core(resid, m, iters, ks, w)
    subs_handle = codes._wqs_persisted

    codes_dir, cents_dir, cb_dir, lloyd_dir = _dirs(index_dir)
    # THE amortized join: codes pick up cent_id once, here — searches
    # never see a vec_id exchange again
    stored = codes.join(asg, "vec_id").select(
        "vec_id", "cent_id", "sub_id", "code_id"
    )
    manifest = write_hidden_partitioned(stored, codes_dir, _codes_spec())
    cents.write.mode("overwrite").parquet(cents_dir)
    cb.write.mode("overwrite").parquet(cb_dir)
    # the final Lloyd centroids, restricted to NON-EMPTY cells (an empty
    # cell has no member-mean centroid to take residuals against, and the
    # build never assigned anything there): ingest-time cell assignment
    # runs the exact argmin the build ran, keeping encode/stored parity
    lloyd = kmeans_lloyd_cents.join(
        broadcast(asg.select("cent_id").distinct()), "cent_id", "left_semi"
    )
    lloyd.write.mode("overwrite").parquet(lloyd_dir)

    n_cells = len(manifest["partitions"])
    meta = {
        "m": m,
        "w": w,
        "ks": ks,
        "dim": dim,
        "n": n,
        "iters": iters,
        "n_cells": n_cells,
        "codes_version": 0,
        "stream_epochs": {},
    }
    _dump_meta(index_dir, meta)

    for h in (q, asg, cents, subs_handle):
        if h is not None:
            h.unpersist()
    return {**meta, "codes_partitions": n_cells}


def _load_meta(index_dir: str) -> dict:
    """Load the index meta and SELF-HEAL the vector count: ``n`` is
    derived from the committed partition manifests (main codes table +
    committed epochs), not trusted from the stored counter.  The manifest
    / ledger rename is therefore the single atomic commit point for every
    write path in the module — a crash between a code append and the
    meta rewrite can no longer leave a stale ``n`` (the stored value is
    just a cache of this derivation)."""
    with open(os.path.join(index_dir, INDEX_META)) as fh:
        meta = json.load(fh)
    meta["n"] = _derived_n(index_dir, meta)
    return meta


def _derived_n(index_dir: str, meta: dict) -> int:
    """Vector count from the committed manifests: Σ code rows / m over
    the main codes table and every COMMITTED streaming epoch.  A few
    tiny JSON reads — the same metadata Iceberg derives record counts
    from, never a data scan."""
    from wolf_quake_spark.plans.partition_transforms import MANIFEST

    rows = 0
    for d in [_codes_dir_of(index_dir, meta)] + _committed_epoch_dirs(
        index_dir, meta
    ):
        try:
            with open(os.path.join(d, MANIFEST)) as fh:
                man = json.load(fh)
        except FileNotFoundError:
            continue
        rows += sum(p["n_rows"] for p in man["partitions"])
    return rows // max(1, int(meta.get("m", 1)))


def _dump_meta(index_dir: str, meta: dict) -> None:
    """tmp+rename: the meta write is the atomic commit point for epoch
    ingestion and compaction (same discipline as the snapshot log)."""
    path = os.path.join(index_dir, INDEX_META)
    with open(path + ".tmp", "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    os.replace(path + ".tmp", path)


def _codes_dir_of(index_dir: str, meta: dict) -> str:
    v = int(meta.get("codes_version", 0))
    return os.path.join(index_dir, "codes" if v == 0 else f"codes_v{v}")


def _committed_epoch_dirs(index_dir: str, meta: dict) -> list[str]:
    """Epoch code dirs named in the COMMITTED ledger only — a crash
    between an epoch's data write and the meta commit leaves its dir
    invisible (and the replay overwrites it idempotently)."""
    out = []
    for stream, ids in sorted(meta.get("stream_epochs", {}).items()):
        for e in sorted(ids):
            out.append(os.path.join(index_dir, "codes_epochs", f"{stream}-{e}"))
    return out


def _pruned_codes_union(
    spark: SparkSession, index_dir: str, meta: dict, probe_ids: list
) -> tuple[DataFrame, dict]:
    """Manifest-pruned read of the probed cells across the main codes
    table AND every committed streaming epoch (bounded by compaction)."""
    dirs = [_codes_dir_of(index_dir, meta)]
    dirs += _committed_epoch_dirs(index_dir, meta)
    frames, report = [], {"partitions_total": 0, "partitions_read": 0,
                          "rows_in_read_partitions": 0, "code_tables": len(dirs)}
    for d in dirs:
        df, rep = pruned_read_points(spark, d, "cent_id", probe_ids)
        frames.append(df.select("vec_id", "cent_id", "sub_id", "code_id"))
        for key in ("partitions_total", "partitions_read", "rows_in_read_partitions"):
            report[key] += rep[key]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out, report


def ivfpq_index_search(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    n_probes: int = 3,
    k: int = 10,
) -> DataFrame:
    """ADC top-k against a MATERIALIZED index: probe the ``n_probes``
    nearest cells (one tiny scan of the ~sqrt(n)-row centroid table),
    read ONLY those cells' code partitions via manifest pruning, score by
    a broadcast per-cell lookup table, take the top k.  Bit-identical to
    ``similarity.ivfpq_search`` over the same corpus (same trained
    structures, same exact-integer ADC math, same tiebreaks), but the
    scan cost is ``n * n_probes / k_cells`` code rows READ (not filtered)
    and there is no codes-to-assignment join at all.

    Attach the pruning evidence via ``df._wqs_scan_report``."""
    meta = _load_meta(index_dir)
    m, w = meta["m"], meta["w"]
    _, cents_dir, cb_dir, _ = _dirs(index_dir)

    qlit = F.array(
        *[F.lit(int(round(x * SCALE))).cast("long") for x in query_vec]
    )
    cents = spark.read.parquet(cents_dir)
    # probe selection: k_cells rows -> n_probes ids; metadata-scale collect
    # (the same driver-side footprint as Iceberg scan planning)
    probe_rows = (
        cents.select("cent_id", "cvec", _l2(F.col("cvec"), qlit).alias("d"))
        .orderBy("d", "cent_id")
        .limit(n_probes)
        .collect()
    )
    probe_ids = [r["cent_id"] for r in probe_rows]
    probes = spark.createDataFrame(
        [(r["cent_id"], r["cvec"]) for r in probe_rows],
        "cent_id int, cellvec array<long>",
    )

    codes, report = _pruned_codes_union(spark, index_dir, meta, probe_ids)

    # per-cell ADC lookup table: n_probes x m x ks rows, broadcast-sized
    cbv = spark.read.parquet(cb_dir).select(
        "sub_id", "code_id", F.col("cvec").alias("codeword")
    )
    sub_q = F.slice(qlit, F.col("sub_id") * w + 1, w)
    sub_c = F.slice(F.col("cellvec"), F.col("sub_id") * w + 1, w)
    lut = probes.crossJoin(broadcast(cbv)).select(
        "cent_id",
        "sub_id",
        "code_id",
        _l2(
            F.col("codeword"), F.zip_with(sub_q, sub_c, lambda x, y: x - y)
        ).alias("pd2"),
    )
    out = (
        codes.join(broadcast(lut), ["cent_id", "sub_id", "code_id"])
        .groupBy("vec_id")
        .agg(F.sum("pd2").cast("long").alias("adc_d2"))
        .orderBy(F.asc("adc_d2"), F.asc("vec_id"))
        .limit(k)
    )
    out._wqs_scan_report = report
    return out


LUT_BROADCAST_MAX_ROWS = 1_000_000  # ~40 MB of (qid, keys, pd2) rows


def ivfpq_index_batch_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    n_probes: int = 3,
    k: int = 10,
    qid_col: str = "qid",
    vec_col: str = "embedding",
    lut_broadcast_max_rows: int = LUT_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Bulk ADC top-k for a WHOLE query frame against the materialized
    index — the shape a data pipeline actually runs (dedup a new batch
    against the corpus, mine neighbors for a training set), vs the
    single-vector interactive :func:`ivfpq_index_search`.

    Plan: per-query probe selection is one keyed window over
    n_q x k_cells broadcast-scored rows; the probe frame is PERSISTED
    (DISK_ONLY) because three consumers read it — the probe-id/LUT-size
    stats job, the LUT build, and (via the ids) the pruned codes read.
    The per-(query, cell) ADC lookup tables form one frame of
    n_q x n_probes x m x ks rows joined onto a manifest-pruned read of
    the UNION of all probed cells — ADAPTIVELY: broadcast while that
    product stays under ``lut_broadcast_max_rows`` (interactive batches),
    else a cent_id-co-partitioned shuffle join (both sides repartitioned
    on the cell key, so a 10^7-query dedup batch never tries to ship a
    tens-of-GB LUT through the driver).  The switch is driven by the
    exact per-cell probe counts collected in the stats job, not a guess.
    Final top-k is a per-qid keyed window.  Everything stays
    exact-integer, so the batch results equal n independent single
    searches and the DuckDB oracle bit-for-bit — on BOTH join paths
    (parity-tested).  Returns (qid, vec_id, adc_d2)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    meta = _load_meta(index_dir)
    m, w = meta["m"], meta["w"]
    _, cents_dir, cb_dir, _ = _dirs(index_dir)

    cents = spark.read.parquet(cents_dir)
    qn = queries.select(
        F.col(qid_col).alias("qid"), _quant(F.col(vec_col)).alias("qe")
    )
    scored = qn.crossJoin(broadcast(cents)).select(
        "qid",
        "qe",
        "cent_id",
        "cvec",
        _l2(F.col("qe"), F.col("cvec")).alias("d"),
    )
    probes = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rn") <= n_probes)
        .select(
            "qid",
            "cent_id",
            F.zip_with("qe", "cvec", lambda x, y: x - y).alias("rq"),
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    # ONE metadata-scale job serves two needs: the distinct probed cells
    # (drives manifest pruning) and the exact probe-row count per cell
    # (sizes the LUT for the adaptive join below).  <= k_cells rows.
    cell_rows = probes.groupBy("cent_id").agg(F.count("*").alias("c")).collect()
    probe_ids = [r["cent_id"] for r in cell_rows]
    n_probe_rows = sum(r["c"] for r in cell_rows)
    lut_rows = n_probe_rows * m * meta["ks"]
    # per-(query, cell) lookup tables against the cell-residual query
    subs = probes.select(
        "qid",
        "cent_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("sub_id"),
                    F.slice("rq", s * F.lit(w) + 1, w).alias("svec"),
                ),
            )
        ).alias("e"),
    ).select(
        "qid",
        "cent_id",
        F.col("e.sub_id").alias("sub_id"),
        F.col("e.svec").alias("svec"),
    )
    cbv = spark.read.parquet(cb_dir).select(
        "sub_id", "code_id", F.col("cvec").alias("codeword")
    )
    lut = subs.join(broadcast(cbv), "sub_id").select(
        "qid",
        "cent_id",
        "sub_id",
        "code_id",
        _l2(F.col("svec"), F.col("codeword")).alias("pd2"),
    )
    codes, report = _pruned_codes_union(spark, index_dir, meta, probe_ids)
    join_keys = ["cent_id", "sub_id", "code_id"]
    if lut_rows <= lut_broadcast_max_rows:
        scored_codes = codes.join(broadcast(lut), join_keys)
        report["lut_join"] = "broadcast"
    else:
        # the LUT grows linearly with the query batch — above the bound,
        # co-partition both sides on the cell key and sort-merge-join
        # instead of shipping it through the driver.  HashPartitioning on
        # cent_id (a subset of the join keys) satisfies the join's
        # clustered distribution, so no second shuffle is inserted.  The
        # merge hint matters: the LUT comes off a crossJoin + window, so
        # Catalyst's size estimate under-counts it and would happily
        # auto-broadcast the very frame this branch exists to keep off
        # the driver — we know the exact row count, the estimator doesn't.
        scored_codes = codes.repartition("cent_id").join(
            lut.repartition("cent_id").hint("merge"), join_keys
        )
        report["lut_join"] = "shuffle"
    report["lut_rows"] = lut_rows
    cand = scored_codes.groupBy("qid", "vec_id").agg(
        F.sum("pd2").cast("long").alias("adc_d2")
    )
    out = (
        cand.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.asc("adc_d2"), F.asc("vec_id")
                )
            ),
        )
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "adc_d2")
    )
    out._wqs_scan_report = report
    out._wqs_persisted = probes
    return out


def ivfpq_encode(
    new_embeddings: DataFrame,
    assign_cents: DataFrame,
    mean_cents: DataFrame,
    cb: DataFrame,
    m: int,
    w: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against FROZEN index structures — no retraining.

    Runs the exact two argmins the BUILD ran: the cell is the nearest
    final Lloyd centroid (``assign_cents`` — the argmin ``kmeans_assign``
    finished with; nearest member-mean disagrees on boundary vectors),
    the residual is against the assigned cell's MEMBER-MEAN centroid
    (``mean_cents`` — what the search LUT subtracts), and each subspace
    takes the nearest frozen codeword.  Integer L2^2 everywhere, ties to
    the lowest id, so the DuckDB oracle reproduces every code and
    re-encoding unchanged vectors reproduces their stored codes exactly
    (parity-tested).  Two broadcast joins + two bounded argmin aggs over
    n*m narrow rows.  Returns (vec_id, cent_id, sub_id, code_id)."""
    qn = new_embeddings.select("vec_id", _quant(F.col(vec_col)).alias("qe"))
    scored = qn.crossJoin(broadcast(assign_cents)).select(
        "vec_id",
        "qe",
        "cent_id",
        _l2(F.col("qe"), F.col("cvec")).alias("dist"),
    )
    asg = (
        scored.groupBy("vec_id", "qe")
        .agg(F.min(F.struct("dist", "cent_id")).alias("b"))
        .select("vec_id", "qe", F.col("b.cent_id").alias("cent_id"))
    )
    best = asg.join(broadcast(mean_cents), "cent_id").select(
        "vec_id",
        "cent_id",
        F.zip_with("qe", "cvec", lambda x, y: x - y).alias("rq"),
    )
    subs = best.select(
        "vec_id",
        "cent_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("sub_id"),
                    F.slice("rq", s * F.lit(w) + 1, w).alias("svec"),
                ),
            )
        ).alias("e"),
    ).select(
        "vec_id",
        "cent_id",
        F.col("e.sub_id").alias("sub_id"),
        F.col("e.svec").alias("svec"),
    )
    cbv = cb.select("sub_id", "code_id", F.col("cvec").alias("codeword"))
    return (
        subs.join(broadcast(cbv), "sub_id")
        .select(
            "vec_id",
            "cent_id",
            "sub_id",
            "code_id",
            _l2(F.col("svec"), F.col("codeword")).alias("dist"),
        )
        .groupBy("vec_id", "cent_id", "sub_id")
        .agg(F.min(F.struct("dist", "code_id")).alias("mn"))
        .select("vec_id", "cent_id", "sub_id", F.col("mn.code_id").alias("code_id"))
    )


def ivfpq_index_encode(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`ivfpq_encode` with the frozen structures read from a
    materialized index directory."""
    meta = _load_meta(index_dir)
    _, cents_dir, cb_dir, lloyd_dir = _dirs(index_dir)
    return ivfpq_encode(
        new_embeddings,
        spark.read.parquet(lloyd_dir),
        spark.read.parquet(cents_dir),
        spark.read.parquet(cb_dir),
        meta["m"],
        meta["w"],
        vec_col=vec_col,
    )


def ivfpq_index_append(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame,
    vec_col: str = "embedding",
) -> dict:
    """Ingest new vectors into the materialized index: encode against the
    frozen structures and append their codes with O(added) manifest work
    (:func:`append_hidden_partitioned` widens only the touched cells'
    stats).  The index never retrains on ingest — recall drift is measured
    separately (``ivfpq_index_recall_after_ingest``) and answered with a
    rebuild, the FAISS add/retrain split.

    Crash discipline: the manifest merge inside
    ``append_hidden_partitioned`` (tmp+rename) is the commit point;
    ``n`` is re-derived from the committed manifests (``_derived_n``) so
    a crash between the append and the meta rewrite leaves no stale
    count — the meta write here only refreshes the cache."""
    meta = _load_meta(index_dir)
    codes_dir = _codes_dir_of(index_dir, meta)
    encoded = ivfpq_index_encode(spark, index_dir, new_embeddings, vec_col=vec_col)
    manifest = append_hidden_partitioned(encoded, codes_dir, _codes_spec())
    meta["n"] = _derived_n(index_dir, meta)
    _dump_meta(index_dir, meta)
    return {"appended_cells_touched": len(manifest["partitions"]), **meta}


def ivfpq_index_append_epoch(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame,
    epoch_id: int,
    stream_name: str = "embeddings",
    vec_col: str = "embedding",
) -> dict:
    """Exactly-once STREAMING ingest epoch: encode the micro-batch against
    the frozen structures into its own epoch-scoped code table
    (``codes_epochs/<stream>-<epoch>``), then commit the epoch id into the
    ledger with the atomic meta rename.  ``foreachBatch`` delivery is
    at-least-once — a replayed epoch is either (a) already in the ledger
    (skipped here) or (b) crashed before the meta commit, in which case
    its half-written dir was reader-invisible and the replay overwrites
    it idempotently.  Searches read main codes plus every COMMITTED
    epoch; :func:`ivfpq_index_compact` folds epochs back into one table."""
    meta = _load_meta(index_dir)
    ledger = meta.setdefault("stream_epochs", {}).setdefault(stream_name, [])
    if epoch_id in ledger:
        return {"skipped": True, "epoch": epoch_id, "stream": stream_name}
    encoded = ivfpq_index_encode(spark, index_dir, new_embeddings, vec_col=vec_col)
    edir = os.path.join(index_dir, "codes_epochs", f"{stream_name}-{epoch_id}")
    manifest = write_hidden_partitioned(encoded, edir, _codes_spec())
    n_added = sum(p["n_rows"] for p in manifest["partitions"])
    ledger.append(int(epoch_id))
    meta["n"] = _derived_n(index_dir, meta)  # ledger now includes the epoch
    _dump_meta(index_dir, meta)  # atomic commit point
    return {
        "skipped": False,
        "epoch": epoch_id,
        "stream": stream_name,
        "code_rows": n_added,
        "cells_touched": len(manifest["partitions"]),
    }


def ivfpq_index_compact(spark: SparkSession, index_dir: str) -> dict:
    """Fold every committed streaming epoch back into ONE codes table
    (the maintenance action bounding search fan-in): the union of the
    current codes table and all committed epochs is rewritten into a new
    ``codes_v<k+1>`` directory, the meta flips to it and clears the
    ledger in one atomic rename, and the superseded directories are
    removed afterwards — a crash in between leaves them orphaned but
    ignored (the committed meta never points at them)."""
    import shutil

    meta = _load_meta(index_dir)
    old_dirs = [_codes_dir_of(index_dir, meta)]
    old_dirs += _committed_epoch_dirs(index_dir, meta)
    if len(old_dirs) == 1:
        return {"compacted": 0, "codes_version": meta.get("codes_version", 0)}
    frames = [
        spark.read.parquet(d).select("vec_id", "cent_id", "sub_id", "code_id")
        for d in old_dirs
    ]
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    new_v = int(meta.get("codes_version", 0)) + 1
    new_dir = os.path.join(index_dir, f"codes_v{new_v}")
    manifest = write_hidden_partitioned(union, new_dir, _codes_spec())
    meta["codes_version"] = new_v
    meta["stream_epochs"] = {}
    _dump_meta(index_dir, meta)  # atomic flip
    for d in old_dirs:
        shutil.rmtree(d, ignore_errors=True)
    ep_root = os.path.join(index_dir, "codes_epochs")
    if os.path.isdir(ep_root) and not os.listdir(ep_root):
        os.rmdir(ep_root)
    return {
        "compacted": len(old_dirs),
        "codes_version": new_v,
        "partitions": len(manifest["partitions"]),
    }
