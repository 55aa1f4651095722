"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline shape (extract → broadcast enrich →
window sessionize → aggregate) on the sf0.001 tables; ``queries`` /
``oracle_sql`` expose the operator registry in
``wolf_quake_spark/queries.py`` (each Spark program paired with a DuckDB
oracle on the same parquet).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wolf_quake_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionized, enriched per-session aggregates on events."""
    sf_dir = "/root/testdata/sf0.001"
    sessions = _q.queries()["sessionize_user_events"](spark, sf_dir)
    scores = _q.queries()["signed_user_score"](spark, sf_dir)
    lookup = F.broadcast(
        spark.createDataFrame(
            [("signup", "acquisition"), ("purchase", "revenue"), ("click", "engagement"),
             ("view", "engagement"), ("error", "reliability")],
            "event_type string, category string",
        )
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    enriched = (
        ev.join(lookup, "event_type", "left")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("category").alias("n_categories"),
        )
    )
    return (
        sessions.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events_sessions"))
        .join(scores, "user_id")
        .join(enriched.drop("n_events"), "user_id")
        .orderBy("user_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
