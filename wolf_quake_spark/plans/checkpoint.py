"""Per-partition lineage + metrics manifest — resumable batch runs.

The north_rule requires the job to "checkpoint per-partition lineage and
metrics to resume mid-run".  Model:

* The input is split into **batches of whole input files** (an Iceberg/
  Parquet table partitioned or bucketed by ``conv_id`` keeps every
  conversation inside one file group, which is the correctness precondition —
  the pipeline's own writers produce conv-partitioned output, and the
  scale generator does too).
* Each batch runs the full pipeline and lands in ``<sink>/batch=<id>/``
  via an overwrite, so re-running a half-written batch is idempotent.
* After a batch's sinks land, the manifest gains one entry: batch id, the
  exact input files (lineage), per-sink row counts, wall seconds.  The
  manifest is rewritten atomically (tmp + rename), so a crash mid-batch
  leaves the previous manifest intact and the batch simply re-runs.
* On restart, completed batch ids are skipped.

This is framework code, deliberately engine-agnostic: on a real cluster the
same manifest sits next to Iceberg snapshot ids.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from dataclasses import asdict, dataclass, field


@dataclass
class BatchRecord:
    batch_id: str
    input_files: list[str]
    sink_counts: dict[str, int]
    wall_secs: float
    extra: dict = field(default_factory=dict)


class Manifest:
    """Atomic JSON manifest of completed batches."""

    def __init__(self, out_dir: str) -> None:
        self.path = os.path.join(out_dir, "_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self._records: dict[str, BatchRecord] = {}
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as f:
                data = json.load(f)
            for rec in data.get("batches", []):
                self._records[rec["batch_id"]] = BatchRecord(**rec)

    @property
    def completed(self) -> set[str]:
        return set(self._records)

    def records(self) -> list[BatchRecord]:
        return list(self._records.values())

    def record(self, rec: BatchRecord) -> None:
        self._records[rec.batch_id] = rec
        self._flush()

    def totals(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for rec in self._records.values():
            for sink, n in rec.sink_counts.items():
                out[sink] = out.get(sink, 0) + n
        return out

    def _flush(self) -> None:
        payload = {"batches": [asdict(r) for r in self._records.values()]}
        d = os.path.dirname(self.path)
        fd, tmp = tempfile.mkstemp(dir=d, prefix="._manifest_")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(payload, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


def read_as_of(spark, out_dir: str, sink: str, upto: int | str):
    """Snapshot read: the sink as of the first ``upto`` committed batches
    (int), or up to and including batch id ``upto`` (str) — the
    Iceberg read-at-snapshot analog over the lineage manifest.

    The manifest's record order IS the commit sequence (each batch appends
    its record only after its sinks land, and the JSON round-trips in
    insertion order), so "as of batch k" is exactly the union of the first
    k ``batch=<id>`` directories — no data is rewritten or copied to serve
    historical reads, same as Iceberg snapshot isolation.  Raises
    ``KeyError`` for an unknown batch id and ``ValueError`` for an empty
    selection.
    """
    recs = Manifest(out_dir).records()
    if isinstance(upto, str):
        ids: list[str] = []
        for r in recs:
            ids.append(r.batch_id)
            if r.batch_id == upto:
                break
        else:
            raise KeyError(f"unknown batch id {upto!r}")
    else:
        ids = [r.batch_id for r in recs[:upto]]
    if not ids:
        raise ValueError("empty snapshot selection")
    paths = [os.path.join(out_dir, sink, f"batch={i}") for i in ids]
    return spark.read.parquet(*paths)


def read_changes(spark, out_dir: str, sink: str, since: str | None):
    """Incremental-consumption dual of :func:`read_as_of`: the rows
    committed AFTER batch id ``since`` (``None`` = from the beginning).

    Returns ``(df, watermark)`` where ``watermark`` is the newest batch id
    covered — pass it back as the next call's ``since`` to consume each
    commit exactly once (the Iceberg incremental-scan contract).  Returns
    ``(None, since)`` when nothing new has committed; raises ``KeyError``
    for an unknown ``since``.
    """
    recs = Manifest(out_dir).records()
    if since is None:
        start = 0
    else:
        ids = [r.batch_id for r in recs]
        if since not in ids:
            raise KeyError(f"unknown batch id {since!r}")
        start = ids.index(since) + 1
    new = [r.batch_id for r in recs[start:]]
    if not new:
        return None, since
    paths = [os.path.join(out_dir, sink, f"batch={i}") for i in new]
    return spark.read.parquet(*paths), new[-1]


def batch_id_for(files: list[str]) -> str:
    h = hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()
    return h[:16]


def plan_batches(files: list[str], files_per_batch: int) -> list[tuple[str, list[str]]]:
    files = sorted(files)
    out = []
    for i in range(0, len(files), files_per_batch):
        chunk = files[i : i + files_per_batch]
        out.append((batch_id_for(chunk), chunk))
    return out
