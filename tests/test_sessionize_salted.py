"""assign_games_salted must be row-identical to assign_games for every
chunk size — the salted segmented scan is a pure execution-strategy change
(skew handling for mega-conversations), never a semantics change.
"""

from __future__ import annotations

import random

import pytest

from wolf_quake_spark.datagen import read_reference_log, transcripts_from_log
from wolf_quake_spark.operators import (
    assign_games,
    assign_games_salted,
    extract_events,
)

EVENT_SCHEMA = "conv_id string, turn_idx int, line_no int, event_type string"


def _rows_equal(a, b):
    return {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def _random_events(seed: int, n_convs: int, n_rows: int):
    rng = random.Random(seed)
    rows = []
    for c in range(n_convs):
        for t in range(n_rows):
            et = rng.choices(
                ["init", "shutdown", "kill", "connect", "other"],
                weights=[2, 2, 6, 2, 3],
            )[0]
            rows.append((f"conv{c}", t, 0, et))
    return rows


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_salted_equals_plain_on_random_soup(spark, seed):
    rows = _random_events(seed, n_convs=4, n_rows=120)
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    plain = assign_games(ev)
    for chunk_turns in (1, 2, 7, 64, 10_000):
        assert _rows_equal(assign_games_salted(ev, chunk_turns), plain), (
            f"seed={seed} chunk_turns={chunk_turns}"
        )


def test_salted_edge_cases(spark):
    cases = [
        [],  # empty
        [("c", 0, 0, "kill"), ("c", 1, 0, "kill")],  # no markers → all dropped
        [("c", 0, 0, "init"), ("c", 4, 0, "shutdown")],  # markers only
        # marker exactly on a chunk boundary (turn_idx divisible by chunk)
        [("c", 0, 0, "kill"), ("c", 2, 0, "init"), ("c", 3, 0, "kill"),
         ("c", 4, 0, "init"), ("c", 5, 0, "shutdown")],
        # multi-line turns: chunking must never split a turn
        [("c", 0, 0, "kill"), ("c", 0, 1, "init"), ("c", 0, 2, "kill"),
         ("c", 1, 0, "shutdown"), ("c", 1, 1, "kill")],
    ]
    for rows in cases:
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        plain = assign_games(ev)
        for chunk_turns in (1, 2, 3):
            assert _rows_equal(assign_games_salted(ev, chunk_turns), plain), rows


def test_salted_rejects_bad_chunk_turns(spark):
    ev = spark.createDataFrame([], EVENT_SCHEMA)
    with pytest.raises(ValueError):
        assign_games_salted(ev, chunk_turns=0)


def test_salted_matches_plain_on_qgames(spark):
    log = read_reference_log("qgames.log")
    if log is None:
        pytest.skip("reference examples not available")
    tr = transcripts_from_log(spark, log, "qgames", lines_per_turn=3)
    ev = extract_events(tr).cache()
    try:
        plain = assign_games(ev)
        for chunk_turns in (7, 512):
            assert _rows_equal(assign_games_salted(ev, chunk_turns), plain)
    finally:
        ev.unpersist()
