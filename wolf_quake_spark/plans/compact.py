"""Small-file compaction for parquet sink layouts (Iceberg ``rewrite_data_files``
analog for the parquet fallback).

Streaming drains and per-batch idempotent writes (plans/pipeline.py,
streaming/adapter.py) accumulate many small files per sink directory — the
classic operational tax at scale: every downstream scan pays file-open and
footer-read costs per file, and the driver pays listing time.  This job
rewrites each leaf directory to ``ceil(total_bytes / target_bytes)`` files.

Correctness is verified from parquet FOOTERS only (row counts summed before
and after) — metadata reads, never a second data pass.  The rewrite itself
is the only data pass, and it is leaf-parallel on the cluster.

Hive-style partition directories (``lang=en/``) are preserved: files are
rewritten in place inside each leaf, so partition columns keep deriving from
the directory names and partition pruning is unaffected.  Re-running is a
no-op (every leaf already at its target file count is skipped).

Crash safety: the swap is journaled.  Rewritten files are verified in an
underscore-prefixed tmp dir (invisible to Spark readers), a per-leaf
``_compact_journal.json`` records the exact old/new file names, then new
files move in (uuid-unique names), then originals are removed, then the
journal.  A crash in any window is repaired by ``_recover_leaf`` on the next
run: journal present → finish the pending moves/deletes; no journal → orphan
tmp dirs are dropped.  Rows are therefore never lost — the worst transient
state is old+new coexisting inside one leaf, which only a reader racing the
single writer can observe (parquet-fallback caveat; the Iceberg analog
commits the same swap atomically in metadata).

At 100 TB the same shape applies per partition: leaves compact
independently (embarrassingly parallel across partitions), the driver holds
only file metadata, and ``target_bytes`` should match the scan-optimal file
size (512 MB–1 GB for columnar scans).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class CompactionReport:
    leaves: dict[str, dict] = field(default_factory=dict)

    @property
    def files_before(self) -> int:
        return sum(v["files_before"] for v in self.leaves.values())

    @property
    def files_after(self) -> int:
        return sum(v["files_after"] for v in self.leaves.values())

    @property
    def rows(self) -> int:
        return sum(v["rows"] for v in self.leaves.values())


_JOURNAL = "_compact_journal.json"


def _leaf_dirs(root: str) -> list[str]:
    """Leaf data dirs under ``root`` — skipping underscore-prefixed dirs
    (in-flight ``_compact_tmp_*`` rewrites, Spark metadata), which Spark
    readers also ignore."""
    leaves = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith("_")]
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _recover_leaf(leaf: str) -> bool:
    """Finish a crash-interrupted swap recorded in the leaf's journal.

    Idempotent: moves any still-staged new files in, removes any surviving
    originals, then drops the journal.  Returns True if recovery ran."""
    jpath = os.path.join(leaf, _JOURNAL)
    if not os.path.exists(jpath):
        return False
    try:
        with open(jpath, encoding="utf-8") as fh:
            j = json.load(fh)
    except (json.JSONDecodeError, OSError):
        # the journal is written atomically (tmp + rename), so an
        # unparseable journal can only be a pre-atomic-write artifact or
        # filesystem corruption — in either case the swap never started
        # (moves happen strictly after the rename), so the correct repair
        # is: drop the journal, let the orphan-tmp sweep reclaim staging,
        # and redo the rewrite.  Without this guard one truncated file
        # wedged compact_dir permanently (every run died in recovery).
        os.remove(jpath)
        return False
    for src, dst in j["moves"]:
        if os.path.exists(src) and not os.path.exists(os.path.join(leaf, dst)):
            shutil.move(src, os.path.join(leaf, dst))
    for old in j["old"]:
        p = os.path.join(leaf, old)
        if os.path.exists(p):
            os.remove(p)
    if os.path.isdir(j["tmp"]):
        shutil.rmtree(j["tmp"], ignore_errors=True)
    os.remove(jpath)
    return True


def _drop_orphan_tmps(root: str) -> None:
    """Remove journal-less ``_compact_tmp_*`` dirs (crash before any swap
    began — the rewrite is simply redone)."""
    for dirpath, dirnames, _files in os.walk(root):
        for d in list(dirnames):
            if d.startswith("_compact_tmp_"):
                shutil.rmtree(os.path.join(dirpath, d), ignore_errors=True)
                dirnames.remove(d)


def _footer_rows(files: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def compact_dir(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> CompactionReport:
    """Compact every leaf directory under ``root`` to its target file count.

    Raises ``RuntimeError`` if any leaf's rewritten footer row count differs
    from the original (the old files are left untouched in that case).
    Repairs any crash-interrupted prior run first (see module docstring).
    """
    # finish interrupted swaps before looking at leaf contents, then drop
    # journal-less tmp dirs (their rewrite never got verified — redo it)
    for dirpath, _dn, filenames in os.walk(root):
        if _JOURNAL in filenames:
            _recover_leaf(dirpath)
    _drop_orphan_tmps(root)
    report = CompactionReport()
    for leaf in _leaf_dirs(root):
        files = sorted(
            os.path.join(leaf, f)
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        )
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total / target_bytes))
        if n_out >= len(files):
            report.leaves[leaf] = {
                "files_before": len(files),
                "files_after": len(files),
                "rows": _footer_rows(files),
                "skipped": True,
            }
            continue
        rows_before = _footer_rows(files)
        tmp = os.path.join(root, f"_compact_tmp_{uuid.uuid4().hex[:8]}")
        (
            spark.read.parquet(*files)
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        new_files = sorted(
            os.path.join(tmp, f) for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        rows_after = _footer_rows(new_files)
        if rows_after != rows_before:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compaction row mismatch in {leaf}: {rows_before} -> {rows_after}"
            )
        # journaled swap: record intent, move verified files IN first (uuid
        # names — no clash with prior compactions), only then delete
        # originals; a crash anywhere is repaired by _recover_leaf
        run_id = uuid.uuid4().hex[:8]
        moves = [
            (f, f"compact-{run_id}-{i:05d}.parquet") for i, f in enumerate(new_files)
        ]
        # atomic journal publish: write-to-tmp + fsync + rename, so a crash
        # mid-write can never leave a half-journal (the recovery contract
        # above depends on "journal present ⇒ journal complete")
        jpath = os.path.join(leaf, _JOURNAL)
        jtmp = jpath + ".tmp"
        with open(jtmp, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "tmp": tmp,
                    "moves": moves,
                    "old": [os.path.basename(f) for f in files],
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(jtmp, jpath)
        for src, dst in moves:
            shutil.move(src, os.path.join(leaf, dst))
        for f in files:
            os.remove(f)
        os.remove(jpath)
        shutil.rmtree(tmp, ignore_errors=True)
        report.leaves[leaf] = {
            "files_before": len(files),
            "files_after": len(new_files),
            "rows": rows_before,
            "skipped": False,
        }
    return report
