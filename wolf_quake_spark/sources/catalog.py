"""Thin source/sink catalog adapter: Iceberg when configured, Parquet fallback.

The target deployment writes to Iceberg tables (``df.writeTo(...)``,
snapshot-isolated appends); the sandbox bundles no iceberg-spark-runtime jar,
so the adapter transparently falls back to a partitioned-Parquet layout with
the same logical semantics:

* append        → Iceberg ``append()``            | parquet ``mode=append``
* batch rewrite → Iceberg ``overwritePartitions``| parquet overwrite of the
                  ``batch=<id>`` subdirectory (idempotent re-runs)

Switching a real cluster to Iceberg is config-only: pass
``iceberg_catalog="my_cat.db"`` and ship the runtime jar in spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession, catalog: str) -> bool:
    try:
        cat = catalog.split(".", 1)[0]
        return spark.conf.get(f"spark.sql.catalog.{cat}", None) is not None
    except Exception:
        return False


class SinkCatalog:
    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        iceberg_catalog: str | None = None,
        table_format: str = "parquet",
    ) -> None:
        """``table_format="snapshot"`` lands every sink in an emulated
        snapshot table (plans/snapshots.py): per-batch APPEND commits with
        a batch-id ledger written atomically with each snapshot, so a
        batch replayed after a crash between sink commit and manifest
        record appends nothing twice — the Iceberg-sink semantics the
        north rule describes, without the runtime jar."""
        if table_format not in ("parquet", "snapshot"):
            raise ValueError(f"unknown table_format {table_format!r}")
        self.spark = spark
        self.base_path = base_path
        self.table_format = table_format
        self.iceberg_catalog = (
            iceberg_catalog
            if iceberg_catalog and _iceberg_available(spark, iceberg_catalog)
            else None
        )

    # -- writes -------------------------------------------------------------

    def _table_dir(self, sink: str) -> str:
        return os.path.join(self.base_path, sink)

    def _snapshot_committed(self, sink: str, batch_id: str) -> bool:
        from wolf_quake_spark.plans import snapshots as sn

        return batch_id in sn._load(self._table_dir(sink))["batches"]

    def _snapshot_write(self, df: DataFrame, sink: str, batch_id: str) -> None:
        from pyspark.sql import functions as F

        from wolf_quake_spark.plans import snapshots as sn

        tbl = self._table_dir(sink)
        stamped = df.withColumn("batch_id", F.lit(batch_id))
        state = sn._load(tbl)
        if state["current_id"] is None and not state["snapshots"]:
            sn.create_table(stamped, tbl, [], batch_key=batch_id)
        else:
            sn.append(stamped, tbl, batch_key=batch_id)

    def write_batch(self, df: DataFrame, sink: str, batch_id: str) -> None:
        """Idempotent per-batch write: re-running a batch replaces its rows
        (parquet/Iceberg) or is skipped via the batch ledger (snapshot)."""
        if self.iceberg_catalog:
            from pyspark.sql import functions as F

            (
                df.withColumn("batch_id", F.lit(batch_id))
                .writeTo(f"{self.iceberg_catalog}.{sink}")
                .overwritePartitions()
            )
            return
        if self.table_format == "snapshot":
            if not self._snapshot_committed(sink, batch_id):
                self._snapshot_write(df, sink, batch_id)
            return
        df.write.mode("overwrite").parquet(self._batch_path(sink, batch_id))

    def write_batch_counted(self, df: DataFrame, sink: str, batch_id: str) -> int:
        """``write_batch`` + row count from the write job itself.

        Uses ``df.observe`` (a CollectMetrics node evaluated by the write
        action) instead of reading the sink back — at scale a read-back count
        is a second full pass over every byte written, so the observed metric
        is the default and read-back verification is opt-in
        (``run_batch(verify=True)``).
        """
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        if self.table_format == "snapshot" and self._snapshot_committed(
            sink, batch_id
        ):
            # replayed batch: nothing is written, so no observe action would
            # run (obs.get would block) — count the committed rows instead
            return self.read_batch(sink, batch_id).count()
        obs = Observation(f"{sink}:{batch_id}")
        self.write_batch(df.observe(obs, F.count(F.lit(1)).alias("rows")), sink, batch_id)
        return int(obs.get["rows"])

    def append(self, df: DataFrame, sink: str) -> None:
        if self.iceberg_catalog:
            df.writeTo(f"{self.iceberg_catalog}.{sink}").append()
            return
        df.write.mode("append").parquet(os.path.join(self.base_path, sink))

    # -- reads --------------------------------------------------------------

    def read_batch(self, sink: str, batch_id: str) -> DataFrame:
        """Read back one batch's rows (count-after-write doubles as a write
        integrity check for the manifest)."""
        if self.iceberg_catalog:
            return (
                self.spark.read.table(f"{self.iceberg_catalog}.{sink}")
                .where(f"batch_id = '{batch_id}'")
            )
        if self._is_snapshot_sink(sink):
            from pyspark.sql import functions as F

            from wolf_quake_spark.plans import snapshots as sn

            return (
                sn.read_snapshot(self.spark, self._table_dir(sink))
                .where(F.col("batch_id") == batch_id)
                .drop("batch_id")
            )
        return self.spark.read.parquet(self._batch_path(sink, batch_id))

    def read(self, sink: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.table(f"{self.iceberg_catalog}.{sink}")
        if self._is_snapshot_sink(sink):
            from wolf_quake_spark.plans import snapshots as sn

            return sn.read_snapshot(self.spark, self._table_dir(sink)).drop(
                "batch_id"
            )
        return self.spark.read.parquet(os.path.join(self.base_path, sink, "*"))

    def _is_snapshot_sink(self, sink: str) -> bool:
        """Readers auto-detect the sink layout from the snapshot log's
        presence, so a report/read over a snapshot-sink run resolves the
        CURRENT snapshot (isolation) instead of glob-reading every data
        file — a glob would also see orphaned/rewritten files."""
        from wolf_quake_spark.plans.snapshots import SNAP_LOG

        return self.table_format == "snapshot" or os.path.exists(
            os.path.join(self._table_dir(sink), SNAP_LOG)
        )

    def _batch_path(self, sink: str, batch_id: str) -> str:
        return os.path.join(self.base_path, sink, f"batch={batch_id}")
