"""Strict-mode validation — analogs of the reference's runtime aborts.

The reference errors out when a Kill credits a player who isn't in
``players_data`` yet ("Killer/Victim not found", parser.rs:137-150) or when a
ClientUserinfoChanged references a never-connected client (panic,
parser.rs:81-84).  Because ``players_data`` accumulates from the last flush,
"is in players_data at line L" ≡ "a ClientConnect for that client occurred in
the same game span at a position < L".

In lenient mode these become ``unexpected_error`` reject rows; in strict mode
the pipeline raises if any exist (the reference aborts the whole run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.data_model import (
    EV_KILL,
    EV_USERINFO,
    R_UNEXPECTED,
    WORLD_ID,
)
from wolf_quake_spark.operators.aggregates import roster


def orphan_references(sessionized: DataFrame) -> DataFrame:
    """Rows whose credited/named player has no earlier ClientConnect in-game.

    Returns reject-shaped rows (conv_id, turn_idx, line_no, reason, raw).
    """
    r = roster(sessionized)
    keys = ["conv_id", "game_id", "client_id"]
    pos = F.struct("turn_idx", "line_no")

    kills = sessionized.filter(
        (F.col("event_type") == EV_KILL) & F.col("game_id").isNotNull()
    ).withColumn(
        "client_id",
        F.when(F.col("killer_id") == WORLD_ID, F.col("victim_id")).otherwise(
            F.col("killer_id")
        ),
    )
    orphan_kills = (
        kills.join(r, keys, "left")
        .filter(
            F.col("first_connect_pos").isNull()
            | (F.col("first_connect_pos") > pos)
        )
        .select(
            "conv_id",
            "turn_idx",
            "line_no",
            F.when(F.col("killer_id") == WORLD_ID, F.lit(f"{R_UNEXPECTED}:victim_not_found"))
            .otherwise(F.lit(f"{R_UNEXPECTED}:killer_not_found"))
            .alias("reason"),
            "raw",
        )
    )

    uinfo = sessionized.filter(
        (F.col("event_type") == EV_USERINFO) & F.col("game_id").isNotNull()
    )
    orphan_uinfo = (
        uinfo.join(r, keys, "left")
        .filter(
            F.col("first_connect_pos").isNull()
            | (F.col("first_connect_pos") > pos)
        )
        .select(
            "conv_id",
            "turn_idx",
            "line_no",
            F.lit(f"{R_UNEXPECTED}:player_not_found").alias("reason"),
            "raw",
        )
    )
    return orphan_kills.unionByName(orphan_uinfo)
