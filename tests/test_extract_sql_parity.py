"""Exact-row parity of the pure-Catalyst extractor against the Arrow
default path on adversarial inputs — protection for the split-based
tokenization rewrite (one tokenization per line instead of ~7 regex scans).
"""

from __future__ import annotations

import random

from wolf_quake_spark.datagen import transcripts_from_log
from wolf_quake_spark.operators.extract import extract_events_sql
from wolf_quake_spark.operators.extract_arrow import extract_events_arrow


ADVERSARIAL_LINES = [
    "  0:00 InitGame: \\sv_floodProtect\\1\\capturelimit\\8",
    " 20:34 ClientConnect: 2",
    "\t1:47 ClientUserinfoChanged: 2 n\\Dono da Bola\\t\\0\\model\\sarge",
    "12:13 Kill: 2 3 7: Oootsimo killed Zeh by MOD_ROCKET_SPLASH",
    "12:13 Kill: +2 +3 +7: plus-signed ids",
    "12:13 Kill: 4294967295 3 7: max u32 killer",
    "12:13 Kill: 4294967296 3 7: u32 overflow killer",
    "12:13 Kill: 99999999999 3 7: eleven digit killer",
    "12:13 Kill: +99999999999 3 7: plus eleven digits",
    "12:13 Kill: +4294967295 3 7: plus max u32",
    "12:13 Kill: 2 3 x7: non-numeric mod",
    "12:13 Kill: 2 3 7x: mod without colon shape",
    "12:13 Kill: 2 3",
    "12:13 Kill: 2",
    "12:13 Kill:",
    "12:13 ClientConnect: 007",
    "12:13 ClientConnect: ١٢٣",
    "12:13 ClientConnect: -3",
    "981:06 ClientUserinfoChanged: 2 ",
    "981:06 ClientUserinfoChanged: 2 n\\\\t\\0",
    "  \t  ",
    "",
    "no-timestamp Kill: 2 3 7:",
    "abc Kill: 2 3 7:",
    "0:0 ShutdownGame:",
    "00:00 ShutdownGame:",
    "00:00 Item: 4 weapon_rocketlauncher",
    "00:00 say: hello   world  ",
    "0:00 Kill: 2 3 7:   trailing   spaces   ",
    "0:00 Kill:\t2\t3\t7:\ttabs between fields",
    ":::: ShutdownGame:",
    "1234 Kill: 2 3 10:",
    "99:99:99 Kill: 1022 2 22:",
]


def _parity(spark, log_text: str, lines_per_turn: int) -> None:
    tr = transcripts_from_log(spark, log_text, "cX", lines_per_turn)
    cols = [
        "conv_id", "turn_idx", "line_no", "event_type", "killer_id",
        "victim_id", "mod_id", "client_id", "name", "reason", "raw",
    ]
    a = sorted(
        map(tuple, extract_events_arrow(tr, audit=True).select(cols).collect())
    )
    s = sorted(
        map(tuple, extract_events_sql(tr, audit=True).select(cols).collect())
    )
    assert a == s


def test_sql_parity_adversarial_lines(spark):
    _parity(spark, "\n".join(ADVERSARIAL_LINES), lines_per_turn=3)


def test_sql_parity_randomized(spark):
    rng = random.Random(1234)
    toks = [
        "0:00", "12:13", "abc", "", " ", "\t", "Kill:", "ClientConnect:",
        "ClientUserinfoChanged:", "InitGame:", "ShutdownGame:", "say:",
        "2", "+7", "1022", "4294967296", "n\\Zeh\\t\\0", "7:", "x:", ":",
        "99999999999", "+99999999999", "٣", "--", "MOD_ROCKET",
    ]
    lines = [
        " ".join(rng.choice(toks) for _ in range(rng.randint(0, 7)))
        for _ in range(400)
    ]
    _parity(spark, "\n".join(lines), lines_per_turn=rng.choice([1, 2, 5]))
