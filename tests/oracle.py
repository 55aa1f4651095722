"""Line-by-line accumulator oracle for tests.

Implements the pipeline's specified semantics (SURVEY.md §2) as a direct
sequential fold, the way the reference does it natively — used ONLY in tests
to cross-check the distributed/declarative Spark formulation, in particular
the closed-form sessionization in operators/sessionize.py.

Lenient-mode semantics (the pipeline default): malformed gated lines become
rejects; kills always count toward totals/histogram, but score/name mutations
apply only to already-connected players.
"""

from __future__ import annotations

from dataclasses import dataclass, field

WORLD_ID = 1022
U32_MAX = 4_294_967_295


@dataclass
class OGame:
    total_kills: int = 0
    hist: dict[int, int] = field(default_factory=dict)  # mod_id -> count
    players: dict[int, tuple[str, int]] = field(default_factory=dict)  # id -> (name, kills)


def _u32(tok: str) -> int | None:
    t = tok[1:] if tok.startswith("+") else tok
    if not t or not t.isascii() or not t.isdigit():
        return None
    v = int(t)
    return v if v <= U32_MAX else None


def scan_lines(lines: list[str]) -> tuple[list[OGame], list[str]]:
    """Returns (finished games, reject reasons in line order)."""
    games: list[OGame] = []
    rejects: list[str] = []
    cur = OGame()

    def flush():
        nonlocal cur
        games.append(cur)
        cur = OGame()

    for line in lines:
        parts = line.split()
        if not parts:
            continue
        t = parts[0]
        if len(t) < 4 or not all(c in "0123456789:" for c in t):
            continue
        if len(parts) < 2:
            rejects.append("log_part_not_found:event")
            continue
        ev = parts[1]
        if ev == "InitGame:":
            if cur.hist:
                flush()
        elif ev == "ShutdownGame:":
            flush()
        elif ev == "ClientConnect:":
            if len(parts) < 3:
                rejects.append("log_part_not_found:client_id")
                continue
            cid = _u32(parts[2])
            if cid is None:
                rejects.append("parse_int_error")
                continue
            cur.players.setdefault(cid, ("unknown", 0))
        elif ev == "ClientUserinfoChanged:":
            if len(parts) < 3:
                rejects.append("log_part_not_found:client_id")
                continue
            cid = _u32(parts[2])
            if cid is None:
                rejects.append("parse_int_error")
                continue
            rest = " ".join(parts[3:])
            name = rest[2:].split("\\", 1)[0]
            if cid in cur.players:
                cur.players[cid] = (name, cur.players[cid][1])
            else:
                rejects.append("unexpected_error:player_not_found")
        elif ev == "Kill:":
            if len(parts) < 3:
                rejects.append("log_part_not_found:killer_id")
                continue
            killer = _u32(parts[2])
            if killer is None:
                rejects.append("parse_int_error")
                continue
            if len(parts) < 4:
                rejects.append("log_part_not_found:victim_id")
                continue
            victim = _u32(parts[3])
            if victim is None:
                rejects.append("parse_int_error")
                continue
            if len(parts) < 5 or len(parts[4]) <= 1:
                rejects.append("log_part_not_found:mean_id")
                continue
            mod = _u32(parts[4][:-1])
            if mod is None:
                rejects.append("parse_int_error")
                continue
            cur.total_kills += 1
            cur.hist[mod] = cur.hist.get(mod, 0) + 1
            credit = victim if killer == WORLD_ID else killer
            delta = -1 if killer == WORLD_ID else 1
            if credit in cur.players:
                nm, k = cur.players[credit]
                cur.players[credit] = (nm, k + delta)
            else:
                rejects.append(
                    "unexpected_error:victim_not_found"
                    if killer == WORLD_ID
                    else "unexpected_error:killer_not_found"
                )
        # any other tag: ignored
    return games, rejects
