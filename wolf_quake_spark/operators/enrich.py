"""Stage 2 — broadcast enrichment (SURVEY.md §2.3, E1-E3).

The reference's ``MeanDeath::from(u32)`` is a total function: ids 1..28 map
to named causes, everything else to ``Unknown`` (src/quake3_data.rs:69-103);
``Display`` provides labels like 7 → "Rocket Splash" (quake3_data.rs:105-139).

Spark-first: a 29-row dimension, **broadcast hash join** (zero shuffle) +
``coalesce(mod_name, 'Unknown')`` for totality.  The same pattern enriches
the transcript ``tool`` tag (north_star's tool-tag lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.data_model import (
    UNKNOWN_MOD,
    UNKNOWN_TOOL_CATEGORY,
    mod_lookup_df,
    tool_lookup_df,
)


def enrich_mod(df: DataFrame, mod_col: str = "mod_id") -> DataFrame:
    """Adds ``mod_name`` via broadcast join; unknown/NULL ids → 'Unknown'."""
    spark = df.sparkSession
    lookup = F.broadcast(mod_lookup_df(spark))
    out = df.join(lookup, on=df[mod_col] == lookup["mod_id"], how="left").drop(
        lookup["mod_id"]
    )
    return out.withColumn("mod_name", F.coalesce(F.col("mod_name"), F.lit(UNKNOWN_MOD)))


def enrich_tool(transcripts: DataFrame) -> DataFrame:
    """Adds ``tool_category`` to transcripts via broadcast tool-tag lookup."""
    spark = transcripts.sparkSession
    lookup = F.broadcast(tool_lookup_df(spark))
    out = transcripts.join(lookup, on="tool", how="left")
    return out.withColumn(
        "tool_category",
        F.when(F.col("tool").isNull(), F.lit(None).cast("string")).otherwise(
            F.coalesce(F.col("tool_category"), F.lit(UNKNOWN_TOOL_CATEGORY))
        ),
    )
