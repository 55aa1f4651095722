"""Stage — fan-out routing to per-event-type sinks (SURVEY.md §2.1 S3, §1.3).

Every gated line routes to exactly one sink family:

* ``kills``           — typed Kill records, enriched with ``mod_name``
* ``game_boundaries`` — InitGame/ShutdownGame markers with flush disposition
* ``player_state``    — ClientConnect / ClientUserinfoChanged
* ``rejects``         — malformed gated lines (extract-stage reasons) plus,
  in lenient mode, the reference's runtime-abort analogs
  (operators/validate.py)

Sink schemas follow FIXTURES.md §5.  The input is the sessionized frame, so
every routed row carries its ``game_id`` lineage (NULL = discarded EOF tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.data_model import (
    EV_CONNECT,
    EV_INIT,
    EV_KILL,
    EV_REJECT,
    EV_SHUTDOWN,
    EV_USERINFO,
)
from wolf_quake_spark.operators.enrich import enrich_mod
from wolf_quake_spark.operators.validate import orphan_references

SINKS = ("kills", "game_boundaries", "player_state", "rejects")


def route(sessionized: DataFrame, with_orphans: bool = True) -> dict[str, DataFrame]:
    base = ["conv_id", "turn_idx", "line_no"]

    kills = enrich_mod(
        sessionized.filter(F.col("event_type") == EV_KILL).select(
            *base, "killer_id", "victim_id", "mod_id", "game_id", F.col("raw").alias("text")
        )
    ).select(
        *base, "killer_id", "victim_id", "mod_id", "mod_name", "game_id", "text"
    )

    boundaries = sessionized.filter(
        F.col("event_type").isin(EV_INIT, EV_SHUTDOWN)
    ).select(
        *base,
        F.when(F.col("event_type") == EV_INIT, F.lit("init"))
        .otherwise(F.lit(EV_SHUTDOWN))
        .alias("kind"),
        "is_flush",
        "game_id",
    )

    player_state = sessionized.filter(
        F.col("event_type").isin(EV_CONNECT, EV_USERINFO)
    ).select(
        *base,
        F.when(F.col("event_type") == EV_CONNECT, F.lit("connect"))
        .otherwise(F.lit("userinfo"))
        .alias("kind"),
        "client_id",
        "name",
        "game_id",
    )

    rejects = sessionized.filter(F.col("event_type") == EV_REJECT).select(
        *base, "reason", "raw"
    )
    if with_orphans:
        rejects = rejects.unionByName(orphan_references(sessionized))

    return {
        "kills": kills,
        "game_boundaries": boundaries,
        "player_state": player_state,
        "rejects": rejects,
    }
