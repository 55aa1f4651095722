"""Property-based tests (hypothesis), mirroring the reference's proptest-
dominant style (SURVEY.md §5; reference: parser.rs:224-604,
quake3_data.rs:146-244, report.rs:370-424).

All properties run driver-side against the pandas extract kernel
(`_extract_batch`) and the sequential oracle (`tests/oracle.py`) — no JVM, so
hypothesis can afford hundreds of examples.  The Spark paths are tied to the
pandas kernel by the parity suites (tests/test_extract_arrow.py,
tests/test_extract.py), so these properties transfer.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.oracle import scan_lines
from tests.util import mod_label
from wolf_quake_spark.data_model import MOD_LOOKUP_ROWS, U32_MAX, UNKNOWN_MOD
from wolf_quake_spark.operators.extract import _extract_batch
from wolf_quake_spark.report import GameReport, render_text

u32s = st.integers(min_value=0, max_value=U32_MAX)
over_u32 = st.integers(min_value=U32_MAX + 1, max_value=1 << 70)


def extract_lines(lines: list[str], audit: bool = False) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {"conv_id": ["c"], "turn_idx": [0], "text": ["\n".join(lines)]}
    )
    return _extract_batch(pdf, audit=audit)


# ---- Kill projection round-trip (parser.rs:104-121; proptest :224-310) ----

@settings(max_examples=200, deadline=None)
@given(k=u32s, v=u32s, m=u32s, plus=st.booleans())
def test_kill_line_roundtrip(k, v, m, plus):
    sign = "+" if plus else ""
    out = extract_lines([f" 20:54 Kill: {sign}{k} {v} {m}: A killed B by MOD_X"])
    assert list(out["event_type"]) == ["kill"]
    r = out.iloc[0]
    assert (r["killer_id"], r["victim_id"], r["mod_id"]) == (k, v, m)
    assert pd.isna(r["reason"]) or r["reason"] is None


@settings(max_examples=100, deadline=None)
@given(k=over_u32, v=u32s, m=u32s)
def test_kill_overflow_rejects(k, v, m):
    # reference: u32 parse failure → ParseIntError (errors.rs:5-19)
    out = extract_lines([f" 20:54 Kill: {k} {v} {m}:"])
    assert list(out["event_type"]) == ["reject"]
    assert out.iloc[0]["reason"] == "parse_int_error"


@settings(max_examples=100, deadline=None)
@given(k=u32s, v=u32s)
def test_kill_missing_mod_rejects(k, v):
    # bare or 1-char mod token → LogPartNotFound("mean_id") (parser.rs:116-120)
    out = extract_lines([f" 20:54 Kill: {k} {v} :"])
    assert list(out["event_type"]) == ["reject"]
    assert out.iloc[0]["reason"] == "log_part_not_found:mean_id"


# ---- Userinfo name projection (parser.rs:64-87) ---------------------------

name_chars = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=126, blacklist_characters="\\"
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(cid=u32s, name=name_chars)
def test_userinfo_name_roundtrip(cid, name):
    # skip-2 ("n\"), take until next backslash (parser.rs:76-80)
    out = extract_lines([f" 0:02 ClientUserinfoChanged: {cid} n\\{name}\\t\\0\\model"])
    assert list(out["event_type"]) == ["userinfo"]
    r = out.iloc[0]
    assert r["client_id"] == cid
    assert (r["name"] or "") == name


# ---- Timestamp gate (parser.rs:167-174; proptest :311-360) ----------------

bad_tok = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=8,
).filter(lambda t: not (len(t) >= 4 and all(c in "0123456789:" for c in t)))


@settings(max_examples=200, deadline=None)
@given(tok=bad_tok)
def test_timestamp_gate_drops(tok):
    out = extract_lines([f"{tok} Kill: 1 2 3:"], audit=True)
    assert list(out["event_type"]) == ["dropped"]


# ---- MOD mapping total function (quake3_data.rs:69-139; proptest :146-244) -

@settings(max_examples=200, deadline=None)
@given(mod_id=u32s)
def test_mod_mapping_total(mod_id):
    named = dict(MOD_LOOKUP_ROWS)
    label = mod_label(mod_id)
    if 1 <= mod_id <= 28:
        assert label == named[mod_id]
    else:
        assert label == UNKNOWN_MOD


# ---- End-to-end invariants on random soups (parser.rs:663-699 analog) -----

kill_line = st.tuples(
    st.integers(0, 6).map(lambda i: 1022 if i == 0 else i),
    st.integers(1, 6),
    st.integers(0, 30),
).map(lambda t: f" 1:00 Kill: {t[0]} {t[1]} {t[2]}:")
connect_line = st.integers(1, 6).map(lambda c: f" 1:00 ClientConnect: {c}")
garbage_line = st.sampled_from(
    ["garbage", " 1:00 Item: 5 armor", "", " 1:00 say: hi", "x 1:00 Kill: 1 2 3:"]
)
event_line = st.one_of(kill_line, connect_line, garbage_line)


@settings(max_examples=100, deadline=None)
@given(body=st.lists(event_line, min_size=0, max_size=40))
def test_scan_invariants(body):
    lines = [" 0:00 InitGame: \\x\\y"] + body + [" 9:00 ShutdownGame:"]
    games, rejects = scan_lines(lines)
    assert len(games) == 1
    g = games[0]
    # total kills == histogram mass (parser.rs:8-12 denormalization invariant)
    assert g.total_kills == sum(g.hist.values())
    # signed scores: Σ deltas == (non-world kills) − (world kills), counting
    # only players ALREADY connected at kill time (lenient-mode semantics —
    # order matters, so replay the body sequentially)
    connected: set[int] = set()
    expect = 0
    for ln in body:
        p = ln.split()
        if len(p) >= 3 and p[1] == "ClientConnect:":
            connected.add(int(p[2]))
        elif len(p) >= 5 and p[1] == "Kill:":
            killer, victim = int(p[2]), int(p[3])
            if killer == 1022:
                expect -= 1 if victim in connected else 0
            else:
                expect += 1 if killer in connected else 0
    assert sum(k for _, k in g.players.values()) == expect


# ---- Report ordering law (quake3_data.rs:25-31; report.rs:370-424) --------

@settings(max_examples=100, deadline=None)
@given(
    players=st.lists(
        st.tuples(st.text("abcdef", min_size=1, max_size=5), st.integers(-50, 50)),
        min_size=0,
        max_size=8,
    )
)
def test_report_renders_players_desc(players):
    ordered = sorted(players, key=lambda p: -p[1])
    rpt = render_text([GameReport(1, 0, ordered, [])])
    # the players column renders exactly the given entries, in order
    lines = rpt.split("\n")
    rules = [i for i, ln in enumerate(lines) if ln and set(ln) <= set("╭╮╰╯├┤┬┴┼─")]
    body = lines[rules[1] + 1 : rules[2]]  # the single game block
    entries = [ln.split("│")[3].strip() for ln in body]
    assert [e for e in entries if e] == [f"{nm}: {sc}" for nm, sc in ordered]


# ---- Range-join bucketization (queries.q_purchase_window_clicks) ----------

epochs = st.integers(min_value=0, max_value=4_000_000_000)


@settings(max_examples=300, deadline=None)
@given(p=epochs, delta=st.integers(min_value=0, max_value=3599))
def test_trailing_hour_bucket_candidates_cover_all_matches(p, delta):
    """Any click in (p-3600, p] lands in hour bucket b(p)-1 or b(p) — the
    two candidate buckets the bucketized range join expands a purchase
    into, so the equi-join can never miss a true match."""
    c = p - delta  # c in (p-3600, p]
    assert (c // 3600) in ((p // 3600) - 1, p // 3600)


@settings(max_examples=300, deadline=None)
@given(p=epochs, c=epochs)
def test_bucket_filter_is_sound_and_candidates_bounded(p, c):
    """Bucket candidacy is a superset of the true range predicate (no false
    negatives), and each purchase expands to exactly two buckets."""
    in_range = (c > p - 3600) and (c <= p)
    candidate = (c // 3600) in ((p // 3600) - 1, p // 3600)
    if in_range:
        assert candidate
