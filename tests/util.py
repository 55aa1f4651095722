"""Shared helpers: run the full pipeline on a raw log and collect results."""

from __future__ import annotations

from wolf_quake_spark.data_model import MOD_LOOKUP_ROWS, UNKNOWN_MOD
from wolf_quake_spark.datagen import transcripts_from_log
from wolf_quake_spark.operators import (
    assign_games,
    extract_events,
    extract_events_sql,
    game_totals,
    mod_histogram,
    player_ranking,
)

MOD_BY_ID = dict(MOD_LOOKUP_ROWS)


def mod_label(mod_id: int) -> str:
    return MOD_BY_ID.get(mod_id, UNKNOWN_MOD)


def pipeline_games(spark, log_text: str, lines_per_turn: int = 1, sql: bool = False):
    """Run extract → sessionize → aggregate; return {game_id: summary}."""
    tr = transcripts_from_log(spark, log_text, "c0", lines_per_turn)
    ev = extract_events_sql(tr) if sql else extract_events(tr)
    sess = assign_games(ev).cache()
    try:
        totals = {r.game_id: r.total_kills for r in game_totals(sess).collect()}
        hists: dict[int, dict[str, int]] = {g: {} for g in totals}
        for r in mod_histogram(sess).collect():
            hists[r.game_id][r.mod_name] = r.kills
        players: dict[int, dict[int, tuple[str, int]]] = {g: {} for g in totals}
        ranks: dict[int, list[tuple[int, int]]] = {g: [] for g in totals}
        for r in player_ranking(sess).collect():
            players[r.game_id][r.client_id] = (r.name, r.score)
            ranks[r.game_id].append((r.rank, r.client_id))
    finally:
        sess.unpersist()
    return {
        g: {
            "total_kills": totals[g],
            "hist": hists[g],
            "players": players[g],
            "ranks": sorted(ranks[g]),
        }
        for g in totals
    }


def oracle_games(log_text: str):
    from tests.oracle import scan_lines

    games, rejects = scan_lines(log_text.split("\n"))
    out = {}
    for i, g in enumerate(games, start=1):
        out[i] = {
            "total_kills": g.total_kills,
            "hist": {},
            "players": dict(g.players),
        }
        for mod_id, n in g.hist.items():
            lbl = mod_label(mod_id)
            out[i]["hist"][lbl] = out[i]["hist"].get(lbl, 0) + n
    return out, rejects


def assert_matches_oracle(spark_games, oracle, *, check_ranks: bool = True):
    assert set(spark_games) == set(oracle), (
        f"game ids differ: spark={sorted(spark_games)} oracle={sorted(oracle)}"
    )
    for g in oracle:
        sg, og = spark_games[g], oracle[g]
        assert sg["total_kills"] == og["total_kills"], f"game {g} totals"
        assert sg["hist"] == og["hist"], f"game {g} histogram"
        assert sg["players"] == og["players"], f"game {g} players"
        if check_ranks:
            # ranks must be a permutation consistent with desc score,
            # client_id tiebreak
            expect = sorted(
                og["players"].items(), key=lambda kv: (-kv[1][1], kv[0])
            )
            got = [cid for _, cid in sg["ranks"]]
            assert got == [cid for cid, _ in expect], f"game {g} rank order"
