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

At 100 TB the same shape applies per partition: leaves compact
independently (embarrassingly parallel across partitions), the driver holds
only file metadata, and ``target_bytes`` should match the scan-optimal file
size (512 MB–1 GB for columnar scans).
"""

from __future__ import annotations

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


def _leaf_dirs(root: str) -> list[str]:
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


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
    """
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
        for f in files:
            os.remove(f)
        for i, f in enumerate(new_files):
            shutil.move(f, os.path.join(leaf, f"compact-{i:05d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        report.leaves[leaf] = {
            "files_before": len(files),
            "files_after": len(new_files),
            "rows": rows_before,
            "skipped": False,
        }
    return report
