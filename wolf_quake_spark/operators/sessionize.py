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


def assign_games_salted(events: DataFrame, chunk_turns: int = 4096) -> DataFrame:
    """``assign_games`` with explicit skew handling for mega-conversations.

    The plain path shuffles on ``conv_id`` alone, so one huge conversation
    serializes its whole window scan onto a single task (the north rule's
    skew case: "conv_id salting handles skewed mega-conversations at shuffle
    time").  This variant salts the shuffle key to
    ``(conv_id, chunk = turn_idx div chunk_turns)`` and reconstructs the
    exact same per-row answer with a distributed segmented scan:

    1. **Local scans** per chunk (window over the salted key): local kill
       prefix sums and local last-marker lookbacks — a mega conv now spreads
       over ``n_turns / chunk_turns`` parallel tasks.
    2. **Chunk summaries** (one tiny row per chunk): kills in chunk, kills
       at the chunk's last marker, the first marker's kind/position, and the
       flush count among markers whose decision is chunk-local (every marker
       with an earlier marker in the same chunk — the conditional InitGame
       flush of the closed form above depends only on kills since the
       *previous* marker, so only each chunk's FIRST marker needs carry-in).
    3. **Carry window** per conv over the summaries (short: one row per
       chunk): exclusive kill/flush prefix sums, last-marker carry, per-conv
       flush totals, and the first-marker flush decision.
    4. **Join back** on the salted key.  The big side already hashes on
       ``(conv_id, _chunk)`` from step 1, so only the tiny carry frame moves
       (AQE broadcasts it outright below its threshold); one more sort-only
       window numbers the flushes.

    Output is row-identical to ``assign_games`` for every ``chunk_turns``
    (property-tested against it).  Cost: the same single big exchange, but
    hashed on the salted key; parallelism is bounded by chunk count instead
    of conversation count.  At 10^12 turns pick ``chunk_turns`` so the carry
    frame stays small (e.g. 1M turns/chunk ⇒ ≤1M carry rows) — it only has
    to beat the biggest conversation, not the table.
    """
    if chunk_turns < 1:
        raise ValueError(f"chunk_turns must be >= 1, got {chunk_turns}")
    in_cols = events.columns
    is_marker = F.col("event_type").isin(*BOUNDARY_EVENTS)
    is_shutdown = F.col("event_type") == EV_SHUTDOWN
    is_kill = (F.col("event_type") == EV_KILL).cast("long")

    df = events.withColumn("_chunk", F.floor(F.col("turn_idx") / chunk_turns))
    wl = Window.partitionBy("conv_id", "_chunk").orderBy(*ORDER_COLS)
    wl_cur = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wl_prev = wl.rowsBetween(Window.unboundedPreceding, -1)

    # 1. local scans: kill prefix (markers are never kills, so a marker row's
    # _lck == kills strictly before it in the chunk) + last-marker lookback
    df = df.withColumn("_lck", F.sum(is_kill).over(wl_cur)).withColumn(
        "_lpm", F.max(F.when(is_marker, F.col("_lck"))).over(wl_prev)
    )

    # flush decision for markers preceded by a marker in the SAME chunk is
    # purely local (kills since previous marker = _lck - _lpm)
    local_flush = is_marker & F.col("_lpm").isNotNull() & (
        is_shutdown | (F.col("_lck") - F.col("_lpm") > 0)
    )
    marker_pos = F.when(is_marker, F.struct(*ORDER_COLS))
    # 2. chunk summaries — one row per (conv, chunk)
    summ = df.groupBy("conv_id", "_chunk").agg(
        F.sum(is_kill).alias("_ck"),
        F.max(F.when(is_marker, F.col("_lck"))).alias("_clm"),
        F.min_by(
            F.struct(is_shutdown.alias("sd"), F.col("_lck").alias("k")), marker_pos
        ).alias("_fm"),
        F.sum(local_flush.cast("long")).alias("_nfl"),
    )

    # 3. carry window per conv (short: chunk count per conv)
    wc = Window.partitionBy("conv_id").orderBy("_chunk")
    wc_prev = wc.rowsBetween(Window.unboundedPreceding, -1)
    wc_all = wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    summ = summ.withColumn(
        "_carry", F.coalesce(F.sum("_ck").over(wc_prev), F.lit(0))
    ).withColumn(
        "_pm_in",
        F.max(
            F.when(F.col("_clm").isNotNull(), F.col("_carry") + F.col("_clm"))
        ).over(wc_prev),
    )
    first_flush = F.col("_fm").isNotNull() & (
        F.col("_fm.sd")
        | (F.col("_carry") + F.col("_fm.k") - F.coalesce(F.col("_pm_in"), F.lit(0)) > 0)
    )
    summ = summ.withColumn("_cf", F.col("_nfl") + first_flush.cast("long"))
    carries = summ.select(
        "conv_id",
        "_chunk",
        "_carry",
        "_pm_in",
        F.coalesce(F.sum("_cf").over(wc_prev), F.lit(0)).alias("_fcarry"),
        F.sum("_cf").over(wc_all).alias("_nf"),
    )

    # 4. join carries back (big side keeps its (conv_id, _chunk) hashing;
    # AQE broadcasts the carry frame when it is small) and number flushes
    df = df.join(carries, ["conv_id", "_chunk"])
    kills_since = F.when(
        F.col("_lpm").isNotNull(), F.col("_lck") - F.col("_lpm")
    ).otherwise(
        F.col("_carry") + F.col("_lck") - F.coalesce(F.col("_pm_in"), F.lit(0))
    )
    df = df.withColumn("is_flush", is_marker & (is_shutdown | (kills_since > 0)))
    df = df.withColumn(
        "_flush_incl",
        F.col("_fcarry") + F.sum(F.col("is_flush").cast("long")).over(wl_cur),
    )
    candidate = F.when(F.col("is_flush"), F.col("_flush_incl")).otherwise(
        F.col("_flush_incl") + 1
    )
    game_id = F.when(candidate <= F.col("_nf"), candidate)
    return df.withColumn("game_id", game_id).select(
        *in_cols, "is_flush", "game_id"
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
