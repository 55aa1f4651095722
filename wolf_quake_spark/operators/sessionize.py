"""Stage 3 — game sessionization (SURVEY.md §2.4, G1-G4).

Reference semantics (src/quake3_parser/parser.rs:159-217): one forward pass
with mutable accumulators, flushed into a finished ``Game`` when

* ``ShutdownGame:`` is seen — always (parser.rs:190-197);
* ``InitGame:`` is seen **and** the kill histogram is non-empty
  (parser.rs:180-189).  A kill-less InitGame-opened segment is *not*
  flushed — its roster leaks into the next game;
* accumulators still open at EOF are discarded (parser.rs:214-216).

The conditional InitGame flush looks recursive ("flush iff ≥1 kill since the
*previous flush*"), but it has a closed form that needs no sequential scan:

    An InitGame marker flushes iff the raw segment immediately before it
    (between the previous boundary marker of any kind and itself) contains
    at least one Kill event.

Proof sketch (induction over markers): if the immediately-preceding segment
has a kill, that kill is certainly after the last flush, so the histogram is
non-empty.  If it has none, the previous marker either flushed (cleared) or —
by the induction hypothesis — there were already zero kills since the last
flush; either way the histogram is empty at this marker.  ∎

That closed form makes sessionization a *single window pass* per ``conv_id``:
one exchange + one sort, after which every derived quantity (running kill
count, last-marker lookback, flush flags, game ids, EOF cutoff) is a window
expression over the same window frame family — no applyInPandas, no join, no
second shuffle.  At 100 TB this is the minimum possible shuffle for
order-dependent sessionization; the only residual risk is a mega-conversation
serializing one task, which the generator bounds and the bench exercises
(see BENCH.md).

Tests cross-check this closed form against a direct accumulator oracle on
hypothesis-generated event soups (tests/test_pipeline.py and tests/util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wolf_quake_spark.data_model import (
    BOUNDARY_EVENTS,
    EV_INIT,
    EV_KILL,
    EV_SHUTDOWN,
)

ORDER_COLS = ("turn_idx", "line_no")


def assign_games(events: DataFrame) -> DataFrame:
    """Adds ``game_id`` (1-based, per conv, in flush order) to every event row.

    Input: the extract stage's output (event rows only; rejects may be present
    and are passed through — they never influence sessionization, mirroring
    the reference where a malformed line aborts rather than mutating state).

    Output columns: input columns + ``game_id`` (long, NULL for rows after
    the last flush — the discarded EOF tail, G4) + ``is_flush`` (true on the
    boundary marker that closed its game).  Boundary markers that close a
    game get that game's id; non-flushing InitGame markers belong to the
    (possibly dropped) next game, matching where their segment's roster goes.
    """
    w = Window.partitionBy("conv_id").orderBy(*ORDER_COLS)
    w_cur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    is_marker = F.col("event_type").isin(*BOUNDARY_EVENTS)
    is_kill = (F.col("event_type") == EV_KILL).cast("long")

    df = events.withColumn("_cum_kills", F.sum(is_kill).over(w_cur))
    # running kill count at the last boundary marker strictly before this row
    # (cum kills is monotone, so MAX over preceding markers == value at the
    # latest preceding marker)
    df = df.withColumn(
        "_prev_marker_kills",
        F.coalesce(F.max(F.when(is_marker, F.col("_cum_kills"))).over(w_prev), F.lit(0)),
    )
    df = df.withColumn(
        "is_flush",
        is_marker
        & (
            (F.col("event_type") == EV_SHUTDOWN)
            | (F.col("_cum_kills") - F.col("_prev_marker_kills") > 0)
        ),
    )
    df = df.withColumn("_flush_incl", F.sum(F.col("is_flush").cast("long")).over(w_cur))
    df = df.withColumn("_n_flush", F.sum(F.col("is_flush").cast("long")).over(w_all))

    # events / non-flush markers → next flush's game; flush markers → own game
    candidate = F.when(F.col("is_flush"), F.col("_flush_incl")).otherwise(
        F.col("_flush_incl") + 1
    )
    game_id = F.when(candidate <= F.col("_n_flush"), candidate)
    return df.withColumn("game_id", game_id).drop(
        "_cum_kills", "_prev_marker_kills", "_flush_incl", "_n_flush"
    )


def games_frame(sessionized: DataFrame) -> DataFrame:
    """One row per finished game: (conv_id, game_id, end_kind).

    ``end_kind`` records how the game closed (``shutdown`` always flushes,
    ``init`` only via the conditional path) — useful for lineage/debugging.
    """
    return (
        sessionized.filter(F.col("is_flush"))
        .select(
            "conv_id",
            "game_id",
            F.when(F.col("event_type") == EV_INIT, F.lit("init"))
            .otherwise(F.lit("shutdown"))
            .alias("end_kind"),
        )
    )
