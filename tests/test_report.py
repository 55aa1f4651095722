"""Report renderer tests — byte-compatibility with the reference goldens.

The reference's tie order (equal scores / equal cause counts) is HashMap
iteration order, i.e. unspecified (quake3_data.rs:25-31, report.rs:49-51), so
byte-exact comparison holds for tie-free tables and multiset-of-lines
equality for the rest (a tie permutation swaps whole padded lines).
"""

from __future__ import annotations

import pytest

from tests.oracle import scan_lines
from tests.util import mod_label
from wolf_quake_spark.datagen import read_reference_log
from wolf_quake_spark.report import GameReport, render_html, render_text

# the published golden from src/main.rs:89-106 (reference test output — data)
MAIN_RS_GOLDEN = "\n".join(
    [
        "╭────────┬──────────────────┬─────────────────┬──────────────────╮",
        "│        │                  │                 │                  │",
        "│        │ Total game kills │ Kill Rank       │  Death Causes    │",
        "│        │                  │ (Player: Score) │  (Cause: Count)  │",
        "│        │                  │                 │                  │",
        "├────────┼──────────────────┼─────────────────┼──────────────────┤",
        "│        │                  │                 │                  │",
        "│ Game 1 │        1         │   Player1: -1   │  TriggerHurt: 1  │",
        "│        │                  │                 │                  │",
        "├────────┼──────────────────┼─────────────────┼──────────────────┤",
        "│        │                  │                 │                  │",
        "│        │                  │   Player2: 2    │ Rocket Splash: 2 │",
        "│ Game 2 │        3         │                 │                  │",
        "│        │                  │   Player1: -1   │ TriggerHurt: 1   │",
        "│        │                  │                 │                  │",
        "╰────────┴──────────────────┴─────────────────┴──────────────────╯",
    ]
)


def oracle_reports(log: str) -> list[GameReport]:
    games, _ = scan_lines(log.split("\n"))
    out = []
    for i, g in enumerate(games, 1):
        players = sorted(g.players.values(), key=lambda p: -p[1])
        hist: dict[str, int] = {}
        for m, n in g.hist.items():
            lbl = mod_label(m)
            hist[lbl] = hist.get(lbl, 0) + n
        causes = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append(GameReport(i, g.total_kills, list(players), causes))
    return out


def test_main_rs_inline_byte_exact():
    log = read_reference_log("simpletest.log")
    if log is None:
        pytest.skip("reference examples not available")
    lines = log.rstrip("\n").split("\n")
    lines.insert(18, lines[17])  # the main.rs variant doubles the RocketSplash line
    got = render_text(oracle_reports("\n".join(lines)))
    assert got == MAIN_RS_GOLDEN


def test_qgames_report_multiset_exact():
    log = read_reference_log("qgames.log")
    want_txt = read_reference_log("qgames_report.txt")
    if log is None or want_txt is None:
        pytest.skip("reference examples not available")
    got = render_text(oracle_reports(log)).split("\n")
    want = want_txt.rstrip("\n").split("\n")
    assert len(got) == len(want)
    # >75% of whole lines are position-exact (ties are the minority)
    same = sum(1 for a, b in zip(got, want) if a == b)
    assert same / len(want) > 0.75

    # column-wise: frame + Game/total columns byte-exact everywhere; the
    # players and causes columns may permute *within a game block* only
    # among equal-score/count entries (reference tie order is unspecified)
    def blocks(lines):
        out, cur = [], []
        for ln in lines:
            if set(ln) <= set("╭╮╰╯├┤┬┴┼─"):
                if cur:
                    out.append(cur)
                cur = []
            else:
                cur.append(ln.split("│")[1:-1])
        return out

    gb, wb = blocks(got), blocks(want)
    assert len(gb) == len(wb)
    for gcells, wcells in zip(gb, wb):
        for row_g, row_w in zip(gcells, wcells):
            assert row_g[0] == row_w[0] and row_g[1] == row_w[1]  # Game N, total
        for col in (2, 3):
            g_col = [r[col] for r in gcells]
            w_col = [r[col] for r in wcells]
            assert sorted(g_col) == sorted(w_col), f"column {col} content differs"


def test_report_type_projections():
    g = [GameReport(1, 2, [("A", 2)], [("Rocket", 2)])]
    allcols = render_text(g, "all")
    pr = render_text(g, "player-rank")
    md = render_text(g, "mean-death")
    assert "Kill Rank" in allcols and "Death Causes" in allcols
    assert "Kill Rank" in pr and "Death Causes" not in pr
    assert "Death Causes" in md and "Kill Rank" not in md


def test_html_renders():
    g = [GameReport(1, 2, [("A & B", 2)], [("Rocket", 2)])]
    h = render_html(g)
    assert "<table" in h and "A &amp; B: 2" in h and "Game 1" in h


def test_qgames_report_html_multiset_exact():
    """Byte-compat with the reference HTML golden (report.rs:142-150).

    Same tie tolerance as the text golden test: a tie permutation swaps whole
    ``<p>`` content lines inside one cell, leaving the line multiset and all
    structural lines invariant.
    """
    log = read_reference_log("qgames.log")
    want_html = read_reference_log("qgames_report.html")
    if log is None or want_html is None:
        pytest.skip("reference examples not available")
    got = render_html(oracle_reports(log)).split("\n")
    want = want_html.split("\n")
    assert len(got) == len(want)
    assert sorted(got) == sorted(want)  # tie permutations only
    same = sum(1 for a, b in zip(got, want) if a == b)
    assert same / len(want) > 0.9  # structure + tie-free content position-exact

    # within each <td>/<th> cell the multiset of <p> contents must match
    def cells(lines):
        out, cur = [], None
        for ln in lines:
            s = ln.strip()
            if s in ("<td>", "<th>"):
                cur = []
            elif s in ("</td>", "</th>"):
                out.append(sorted(cur))
                cur = None
            elif cur is not None and s not in ("<div>", "</div>", "<p>", "</p>"):
                cur.append(s)
        return out

    assert cells(got) == cells(want)


def test_stateful_sink_report_matches_batch_report(spark, tmp_path):
    """Execution-path independence: the text report rendered from the
    stateful streaming sink is byte-identical to the one rendered from the
    batch pipeline's aggregate sinks, on the qgames fixture."""
    from wolf_quake_spark.datagen import read_reference_log, transcripts_from_log
    from wolf_quake_spark.plans.pipeline import run_resumable
    from wolf_quake_spark.report import (
        render_text,
        report_from_out_dir,
        reports_from_stateful_games,
    )
    from wolf_quake_spark.streaming import run_streaming_stateful

    log = read_reference_log("qgames.log")
    if log is None:
        import pytest

        pytest.skip("reference examples not present")
    tr = transcripts_from_log(spark, log, "qgames", lines_per_turn=3)
    landing = str(tmp_path / "landing")
    tr.orderBy("turn_idx").coalesce(1).write.parquet(landing)

    batch_out = str(tmp_path / "batch_out")
    run_resumable(spark, landing, batch_out, files_per_batch=8)
    batch_report = report_from_out_dir(spark, batch_out)

    stream_out = str(tmp_path / "stream_out")
    run_streaming_stateful(spark, landing, stream_out, max_files_per_trigger=1)
    games = spark.read.parquet(stream_out + "/games").collect()
    stream_report = render_text(reports_from_stateful_games(games))

    assert stream_report == batch_report
