"""Stage 4 — per-game aggregates (SURVEY.md §2.5-2.6, A1-A7 / R1-R3).

All aggregates run over the sessionized event frame.  Each is a standard
hash aggregate (map-side partial + final), so skewed conv_ids are absorbed
by partial aggregation; the ranking window partitions by (conv_id, game_id),
which is far finer-grained than conv_id and thus skew-tolerant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wolf_quake_spark.data_model import (
    EV_CONNECT,
    EV_KILL,
    EV_USERINFO,
    WORLD_ID,
)
from wolf_quake_spark.operators.enrich import enrich_mod
from wolf_quake_spark.operators.sessionize import games_frame

GAME_KEY = ("conv_id", "game_id")


def kills_of(sessionized: DataFrame) -> DataFrame:
    return sessionized.filter(
        (F.col("event_type") == EV_KILL) & F.col("game_id").isNotNull()
    )


def game_totals(sessionized: DataFrame) -> DataFrame:
    """A1 — total kills per game, **including world kills**; games with zero
    kills still appear (reference pushes empty games too, parser.rs:190-197).
    """
    games = games_frame(sessionized)
    counts = kills_of(sessionized).groupBy(*GAME_KEY).agg(F.count("*").alias("total_kills"))
    return (
        games.join(counts, list(GAME_KEY), "left")
        .select(
            "conv_id",
            "game_id",
            F.coalesce("total_kills", F.lit(0)).alias("total_kills"),
        )
    )


def mod_histogram(sessionized: DataFrame) -> DataFrame:
    """A2 + E1/E2 — kills by means-of-death, with display labels.

    The id→enum mapping happens per kill *before* counting (reference:
    MeanDeath::from at parser.rs:121), so all out-of-range ids merge into a
    single 'Unknown' bucket.  Order: partial-agg on mod_id first (cheap,
    bounded key space), broadcast-enrich the tiny result, then re-agg on the
    label — two aggregations but the second runs on ≤ (games × 29ish) rows.
    """
    hist = (
        kills_of(sessionized)
        .groupBy("conv_id", "game_id", "mod_id")
        .agg(F.count("*").alias("kills"))
    )
    return (
        enrich_mod(hist)
        .groupBy("conv_id", "game_id", "mod_name")
        .agg(F.sum("kills").alias("kills"))
    )


def player_scores(sessionized: DataFrame) -> DataFrame:
    """A3 — signed score deltas.

    World kills (killer_id == 1022) decrement the victim; any other kill —
    including self-kills — increments the killer (parser.rs:137-151; the
    self-kill-then-world-kill netting to 0 is asserted by the reference's own
    test at parser.rs:660).

    A delta only applies if the credited player had already connected in the
    same game span (the reference errors on "Killer/Victim not found",
    parser.rs:137-150; in lenient mode such kills still count toward totals
    and the histogram but mutate no score — see operators/validate.py).
    """
    k = kills_of(sessionized)
    credit = F.when(F.col("killer_id") == WORLD_ID, F.col("victim_id")).otherwise(
        F.col("killer_id")
    )
    delta = F.when(F.col("killer_id") == WORLD_ID, F.lit(-1)).otherwise(F.lit(1))
    deltas = k.select(
        "conv_id",
        "game_id",
        credit.alias("client_id"),
        delta.alias("delta"),
        F.struct("turn_idx", "line_no").alias("pos"),
    )
    r = roster(sessionized)
    keys = ["conv_id", "game_id", "client_id"]
    return (
        deltas.join(r, keys, "inner")
        .filter(F.col("pos") > F.col("first_connect_pos"))
        .groupBy(*keys)
        .agg(F.sum("delta").alias("score"))
    )


def roster(sessionized: DataFrame) -> DataFrame:
    """A4/A6 — a player is on a game's roster iff a ClientConnect for them
    landed in that game's span (or_insert semantics: reconnects are no-ops,
    parser.rs:54-57).  Tracks the first connect position for strict-mode
    ordering checks.
    """
    return (
        sessionized.filter(
            (F.col("event_type") == EV_CONNECT) & F.col("game_id").isNotNull()
        )
        .groupBy("conv_id", "game_id", "client_id")
        .agg(
            F.min(F.struct("turn_idx", "line_no")).alias("first_connect_pos"),
        )
    )


def player_names(sessionized: DataFrame) -> DataFrame:
    """A5 — last ClientUserinfoChanged in the game wins (parser.rs:81-84).

    Only userinfo rows for an already-connected player apply (the reference
    panics on "Player not found"; lenient mode ignores the row).
    """
    uinfo = sessionized.filter(
        (F.col("event_type") == EV_USERINFO) & F.col("game_id").isNotNull()
    ).withColumn("pos", F.struct("turn_idx", "line_no"))
    r = roster(sessionized)
    keys = ["conv_id", "game_id", "client_id"]
    return (
        uinfo.join(r, keys, "inner")
        .filter(F.col("pos") > F.col("first_connect_pos"))
        .groupBy(*keys)
        .agg(F.max_by("name", F.col("pos")).alias("name"))
    )


def player_ranking(sessionized: DataFrame) -> DataFrame:
    """A3-A6 + R1 — roster + last-name + signed score, ranked descending.

    Single-shuffle formulation: connects, userinfos and kill credits are
    normalized to one (conv_id, game_id, client_id)-keyed stream; a running
    min over that key gives "already connected at this row" (the reference's
    players_data membership check), and one hash aggregate produces roster
    presence, last valid name, and the signed score.  The groupBy reuses the
    window's hash partitioning, so the whole thing is one exchange — versus
    the naive roster⟕names⟕scores shape (3 shuffles + 2 joins).

    The reference sorts a HashMap's values, so its tie order is unspecified
    (quake3_data.rs:25-31, report.rs:123-124); we add the deterministic
    ``client_id`` tiebreak and document the divergence.
    """
    client = F.when(
        F.col("event_type") == EV_KILL,
        F.when(F.col("killer_id") == WORLD_ID, F.col("victim_id")).otherwise(
            F.col("killer_id")
        ),
    ).otherwise(F.col("client_id"))
    pc = sessionized.filter(
        F.col("event_type").isin(EV_CONNECT, EV_USERINFO, EV_KILL)
        & F.col("game_id").isNotNull()
    ).select(
        "conv_id",
        "game_id",
        client.alias("client_id"),
        "event_type",
        "name",
        F.when(F.col("killer_id") == WORLD_ID, F.lit(-1))
        .otherwise(F.lit(1))
        .alias("delta"),
        F.struct("turn_idx", "line_no").alias("pos"),
    )
    w = (
        Window.partitionBy("conv_id", "game_id", "client_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    connected_before = F.min(
        F.when(F.col("event_type") == EV_CONNECT, F.col("pos"))
    ).over(w).isNotNull()
    pc = pc.withColumn("_conn_before", connected_before)
    agg = (
        pc.groupBy("conv_id", "game_id", "client_id")
        .agg(
            F.max(F.col("event_type") == EV_CONNECT).alias("_on_roster"),
            F.max_by(
                F.when(
                    (F.col("event_type") == EV_USERINFO) & F.col("_conn_before"),
                    F.col("name"),
                ),
                F.struct(
                    ((F.col("event_type") == EV_USERINFO) & F.col("_conn_before")).alias("v"),
                    F.col("pos").alias("p"),
                ),
            ).alias("_name"),
            F.sum(
                F.when(
                    (F.col("event_type") == EV_KILL) & F.col("_conn_before"),
                    F.col("delta"),
                ).otherwise(F.lit(0))
            ).alias("_score"),
        )
        .filter(F.col("_on_roster"))
        .select(
            "conv_id",
            "game_id",
            "client_id",
            F.coalesce("_name", F.lit("unknown")).alias("name"),
            F.col("_score").cast("long").alias("score"),
        )
    )
    wr = Window.partitionBy("conv_id", "game_id").orderBy(
        F.desc("score"), F.asc("client_id")
    )
    return agg.withColumn("rank", F.row_number().over(wr))


def game_summaries(sessionized: DataFrame) -> DataFrame:
    """A7/J4 — one nested row per game: totals + ranked roster + histogram.

    The Vec<Game> analog (parser.rs:7-21) as a single DataFrame, assembled by
    joining the three aggregate frames on (conv_id, game_id); AQE picks the
    join strategy (these frames are tiny relative to the input).
    """
    totals = game_totals(sessionized)
    ranking = (
        player_ranking(sessionized)
        .groupBy(*GAME_KEY)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "client_id", "name", "score"))
            ).alias("players")
        )
    )
    hist = (
        mod_histogram(sessionized)
        .groupBy(*GAME_KEY)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("mod_name", "kills")))
            ).alias("kills_by_means_death")
        )
    )
    return (
        totals.join(ranking, list(GAME_KEY), "left")
        .join(hist, list(GAME_KEY), "left")
        .orderBy("conv_id", "game_id")
    )
