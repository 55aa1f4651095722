"""Driver-side report rendering — byte-compatible with the reference.

The reference renders a `tabled` modern_rounded table with centered
horizontal + vertical alignment (src/report.rs:114-152).  Cell contents
(report.rs:40-78): per game one row ``[ "Game N", total, players, causes ]``
where players/causes cells are ``"\\nitem\\n"`` concatenated (so entries are
separated by blank lines), players sorted descending by kills
(quake3_data.rs:25-31) and causes descending by count (report.rs:49-51).

Rendering algorithm (reverse-engineered from the reference goldens,
examples/qgames_report.txt and src/main.rs:89-106, and verified byte-exact in
tests/test_report.py):

* each cell is a block of lines; block width = widest line; lines are
  left-aligned (right-padded) inside the block;
* column content width = max block width in the column; the block is then
  centered: ``floor(extra/2)`` spaces left, remainder right; plus 1 space of
  padding on both sides;
* row height = tallest cell; blocks are centered vertically with
  ``floor(extra/2)`` blank lines above, remainder below;
* modern_rounded frame: ``╭┬╮ ├┼┤ ╰┴╯`` corners, ``─``/``│`` rules, a
  horizontal rule between every pair of rows.

This is driver-side formatting of an already-collected (small) result — no
Spark primitive needed (SURVEY.md §2.1 S5).
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass, field


@dataclass
class GameReport:
    game_number: int
    total_kills: int
    players: list[tuple[str, int]] = field(default_factory=list)  # ordered
    causes: list[tuple[str, int]] = field(default_factory=list)  # ordered


def _cell_lines(entries: list[tuple[str, int]]) -> list[str]:
    # "\n{name}: {count}\n" per entry, concatenated, then split on '\n'
    s = "".join(f"\n{name}: {count}\n" for name, count in entries)
    return s.split("\n")


HEADERS = {
    "all": ["\n\n", "\nTotal game kills\n", "\nKill Rank\n(Player: Score)\n", "\nDeath Causes\n(Cause: Count)\n"],
    "player-rank": ["\n\n", "\nTotal game kills\n", "\nKill Rank\n(Player: Score)\n"],
    "mean-death": ["\n\n", "\nTotal game kills\n", "\nDeath Causes\n(Cause: Count)\n"],
}


def _rows_for(games: list[GameReport], report_type: str) -> list[list[list[str]]]:
    rows = [[h.split("\n") for h in HEADERS[report_type]]]
    for g in games:
        cells = [[f"Game {g.game_number}"], [str(g.total_kills)]]
        if report_type in ("all", "player-rank"):
            cells.append(_cell_lines(g.players))
        if report_type in ("all", "mean-death"):
            cells.append(_cell_lines(g.causes))
        rows.append(cells)
    return rows


def render_text(games: list[GameReport], report_type: str = "all") -> str:
    rows = _rows_for(games, report_type)
    ncols = len(rows[0])
    content_w = [
        max(max((len(ln) for ln in row[c]), default=0) for row in rows)
        for c in range(ncols)
    ]
    col_w = [w + 2 for w in content_w]  # 1 space padding each side

    def rule(left: str, mid: str, right: str) -> str:
        return left + mid.join("─" * w for w in col_w) + right

    out: list[str] = [rule("╭", "┬", "╮")]
    for r, row in enumerate(rows):
        if r > 0:
            out.append(rule("├", "┼", "┤"))
        height = max(len(c) for c in row)
        # vertical centering offsets per cell
        tops = [(height - len(c)) // 2 for c in row]
        for i in range(height):
            parts = []
            for c in range(ncols):
                cell = row[c]
                block_w = max((len(ln) for ln in cell), default=0)
                j = i - tops[c]
                line = cell[j] if 0 <= j < len(cell) else ""
                block_line = line.ljust(block_w) if 0 <= j < len(cell) else " " * block_w
                extra = content_w[c] - block_w
                left = extra // 2
                parts.append(" " + " " * left + block_line + " " * (extra - left) + " ")
            out.append("│" + "│".join(parts) + "│")
    out.append(rule("╰", "┴", "╯"))
    return "\n".join(out)


# Emitted verbatim by the reference's `table_to_html` with set_border(1) +
# global center alignment (src/report.rs:142-150); byte-for-byte per
# examples/qgames_report.html:1-8.
_HTML_STYLE = [
    "<style>",
    "    table, th, td {",
    "      border: 1px solid;",
    "    }",
    "    tbody > tr > td, thead > tr > th {",
    "      text-align: center;",
    "    }",
    "</style>",
]


def render_html(games: list[GameReport], report_type: str = "all") -> str:
    """HTML table, byte-compatible with the reference's `table_to_html` output
    (src/report.rs:142-150, golden examples/qgames_report.html).

    Layout: 4-space indent ladder ``<table>/<thead|tbody>/<tr>/<th|td>/<div>/
    <p>``; each cell line becomes one ``<p>`` whose content sits on its own
    line at +4 indent, except the empty line, which renders as a truly empty
    line (no indent).  File ends with a trailing newline.
    """
    rows = _rows_for(games, report_type)
    out = list(_HTML_STYLE)
    out.append("<table>")

    def emit_row(cells: list[list[str]], tag: str) -> None:
        out.append("        <tr>")
        for cell in cells:
            out.append(f"            <{tag}>")
            out.append("                <div>")
            for ln in cell:
                out.append("                    <p>")
                out.append("                        " + _html.escape(ln) if ln else "")
                out.append("                    </p>")
            out.append("                </div>")
            out.append(f"            </{tag}>")
        out.append("        </tr>")

    out.append("    <thead>")
    emit_row(rows[0], "th")
    out.append("    </thead>")
    out.append("    <tbody>")
    for row in rows[1:]:
        emit_row(row, "td")
    out.append("    </tbody>")
    out.append("</table>")
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# Assembly from pipeline aggregate sinks
# ---------------------------------------------------------------------------

def summaries_to_reports(
    totals_rows, ranking_rows, hist_rows, conv_id: str | None = None
) -> list[GameReport]:
    """Build ordered GameReport list from collected aggregate rows."""

    def keep(r):
        return conv_id is None or r.conv_id == conv_id

    games: dict[int, GameReport] = {}
    for r in totals_rows:
        if keep(r):
            games[r.game_id] = GameReport(r.game_id, r.total_kills)
    for r in sorted(ranking_rows, key=lambda r: (r.game_id, r.rank)):
        if keep(r) and r.game_id in games:
            games[r.game_id].players.append((r.name, r.score))
    # causes: descending count; tie order is unspecified in the reference
    # (HashMap iteration) — deterministic tiebreak on label here
    for r in sorted(hist_rows, key=lambda r: (r.game_id, -r.kills, r.mod_name)):
        if keep(r) and r.game_id in games:
            games[r.game_id].causes.append((r.mod_name, r.kills))
    return [games[k] for k in sorted(games)]


def reports_from_stateful_games(rows, conv_id: str | None = None) -> list[GameReport]:
    """Build the SAME ordered GameReport list from the stateful streaming
    sink's rows (streaming/stateful.py GAME_SCHEMA: per-game JSON histogram
    and roster) — so the report renderer is execution-path-independent:
    batch aggregates and the incremental state-store drain produce
    byte-identical reports (parity-tested against ``report_from_out_dir``).

    Ordering matches the batch path exactly: players by (score desc,
    client_id asc) — the documented deterministic tiebreak — and causes by
    (count desc, label asc).
    """
    import json as _json

    from wolf_quake_spark.data_model import MOD_LOOKUP_ROWS, UNKNOWN_MOD

    mod_names = dict(MOD_LOOKUP_ROWS)
    out: list[GameReport] = []
    for r in sorted(
        (r for r in rows if conv_id is None or r.conv_id == conv_id),
        key=lambda r: r.game_id,
    ):
        roster = _json.loads(r.players_json)
        players = [
            (name, kills)
            for cid, (name, kills) in sorted(
                roster.items(), key=lambda kv: (-kv[1][1], int(kv[0]))
            )
        ]
        hist = _json.loads(r.hist_json)
        causes = sorted(
            (
                (mod_names.get(int(mid), UNKNOWN_MOD), n)
                for mid, n in hist.items()
            ),
            key=lambda t: (-t[1], t[0]),
        )
        out.append(GameReport(r.game_id, r.total_kills, players, causes))
    return out


def report_from_out_dir(
    spark,
    out_dir: str,
    fmt: str = "text",
    report_type: str = "all",
    conv_ids: list[str] | None = None,
) -> str:
    """Render per-conversation reports from a pipeline run's aggregate sinks.

    The collect is bounded: sinks are filtered to the requested ``conv_ids``
    *before* collecting, so a multi-conversation run only ships the rows of
    the conversations being reported to the driver (a report is inherently
    per-conversation-small; an unfiltered collect over all conversations
    would not survive a 100x run).
    """
    from pyspark.sql import functions as F

    from wolf_quake_spark.sources.catalog import SinkCatalog

    cat = SinkCatalog(spark, out_dir)

    def load(name):
        df = cat.read(name)
        if conv_ids is not None:
            df = df.filter(F.col("conv_id").isin(conv_ids))
        return df.collect()

    totals = load("game_totals")
    ranking = load("player_ranking")
    hist = load("mod_histogram")
    convs = sorted({r.conv_id for r in totals})
    render = render_text if fmt == "text" else render_html
    chunks = []
    for cv in convs:
        reports = summaries_to_reports(totals, ranking, hist, conv_id=cv)
        head = f"== {cv} ==\n" if len(convs) > 1 else ""
        chunks.append(head + render(reports, report_type))
    return "\n\n".join(chunks)
