"""Unit tests for the vectorized extract stage — every reference parser quirk.

Citations refer to /root/reference (see SURVEY.md §2.2).  The pandas batch
kernel is tested directly (no Spark) for speed; Spark-level equivalence of
the UDF and pure-SQL paths is covered in test_pipeline.py.
"""

from __future__ import annotations

import pandas as pd
import pytest

from wolf_quake_spark.operators.extract import _extract_batch


def run(lines, audit=False):
    pdf = pd.DataFrame(
        {"conv_id": ["c"] * len(lines), "turn_idx": range(len(lines)), "text": lines}
    )
    out = _extract_batch(pdf, audit=audit)
    return out.reset_index(drop=True)


def one(line, audit=False):
    out = run([line], audit=audit)
    assert len(out) == 1, f"expected 1 row, got\n{out}"
    return out.iloc[0]


# ---- timestamp gate (parser.rs:167-174) -----------------------------------

@pytest.mark.parametrize(
    "line",
    [
        "",
        "   ",
        "26 0:07 ShutdownGame:",  # first token too short — qgames.log:97 case
        "abc: InitGame:",  # non-numeric chars
        "1:2 Kill: 2 3 7:",  # len < 4
        "--- ----------------",
    ],
)
def test_gate_drops_silently(line):
    assert len(run([line])) == 0
    if line.strip():
        assert one(line, audit=True).event_type == "dropped"


@pytest.mark.parametrize("tok", ["0:00", "20:37", "981:27", "123456", "::::"])
def test_gate_accepts(tok):
    row = one(f" {tok} InitGame: \\foo\\bar")
    assert row.event_type == "init"


def test_gated_line_without_event_token_rejects():
    row = one(" 20:37")
    assert row.event_type == "reject"
    assert row.reason == "log_part_not_found:event"


# ---- dispatch (parser.rs:179-213) ------------------------------------------

def test_unhandled_tags_ignored():
    lines = [
        " 20:37 ClientBegin: 2",
        " 20:37 Item: 4 weapon_rocketlauncher",
        " 20:37 say: hi there",
        " 981:27 Exit: Timelimit hit.",
        " 20:37 score: 10  ping: 4  client: 2 Zeh",
        " 20:37 ClientDisconnect: 3",
    ]
    assert len(run(lines)) == 0
    audit = run(lines, audit=True)
    assert list(audit.event_type.unique()) == ["ignored"]


def test_shutdown():
    assert one(" 20:37 ShutdownGame:").event_type == "shutdown"


# ---- ClientConnect (parser.rs:43-60) ---------------------------------------

def test_connect_ok():
    row = one(" 20:34 ClientConnect: 2")
    assert row.event_type == "connect" and row.client_id == 2


def test_connect_missing_id():
    row = one(" 20:34 ClientConnect:")
    assert row.event_type == "reject"
    assert row.reason == "log_part_not_found:client_id"


@pytest.mark.parametrize("tok", ["-1", "2.5", "abc", "4294967296", "", "99999999999999999999"])
def test_connect_bad_id(tok):
    row = one(f" 20:34 ClientConnect: {tok}" if tok else " 20:34 ClientConnect:")
    assert row.event_type == "reject"


def test_connect_u32_boundary_and_plus_sign():
    # Rust u32::from_str accepts a leading '+' and values up to u32::MAX
    assert one(" 20:34 ClientConnect: 4294967295").client_id == 4294967295
    assert one(" 20:34 ClientConnect: +7").client_id == 7


# ---- ClientUserinfoChanged (parser.rs:64-87) --------------------------------

def test_userinfo_name_extraction():
    row = one(
        " 20:34 ClientUserinfoChanged: 2 "
        "n\\Isgalamido\\t\\0\\model\\xian/default\\hmodel\\xian/default"
    )
    assert row.event_type == "userinfo"
    assert row.client_id == 2
    assert row["name"] == "Isgalamido"


def test_userinfo_name_with_spaces():
    # tokens are re-joined with single spaces (split_whitespace semantics)
    row = one(" 20:38 ClientUserinfoChanged: 5 n\\Dono da   Bola\\t\\0\\model\\sarge")
    assert row["name"] == "Dono da Bola"


def test_userinfo_empty_rest_gives_empty_name():
    row = one(" 20:34 ClientUserinfoChanged: 2")
    assert row.event_type == "userinfo" and row["name"] == ""


def test_userinfo_short_rest():
    # skip-2-chars applies to the joined string (parser.rs:76-80)
    assert one(" 20:34 ClientUserinfoChanged: 2 n\\")["name"] == ""
    assert one(" 20:34 ClientUserinfoChanged: 2 nX")["name"] == ""
    assert one(" 20:34 ClientUserinfoChanged: 2 n\\A")["name"] == "A"


def test_userinfo_bad_client():
    assert one(" 20:34 ClientUserinfoChanged: x n\\A\\").event_type == "reject"


# ---- Kill (parser.rs:95-154) ------------------------------------------------

def test_kill_ok():
    row = one(" 20:54 Kill: 1022 2 22: <world> killed Isgalamido by MOD_TRIGGER_HURT")
    assert row.event_type == "kill"
    assert (row.killer_id, row.victim_id, row.mod_id) == (1022, 2, 22)


def test_kill_trailing_text_ignored():
    row = one(" 2:11 Kill: 3 4 7: Zeh killed Dono da Bola by MOD_ROCKET_SPLASH")
    assert (row.killer_id, row.victim_id, row.mod_id) == (3, 4, 7)


@pytest.mark.parametrize(
    "fields,reason",
    [
        ("", "log_part_not_found:killer_id"),
        ("3", "log_part_not_found:victim_id"),
        ("3 4", "log_part_not_found:mean_id"),
        ("3 4 7", "log_part_not_found:mean_id"),  # mod token len <= 1 (parser.rs:117-119)
        ("x 4 7:", "parse_int_error"),
        ("3 y 7:", "parse_int_error"),
        ("3 4 zz", "parse_int_error"),  # strip last char, parse "z" fails
        ("-3 4 7:", "parse_int_error"),
        ("4294967296 4 7:", "parse_int_error"),  # u32 overflow
    ],
)
def test_kill_malformed(fields, reason):
    line = f" 20:54 Kill: {fields}".rstrip()
    row = one(line)
    assert row.event_type == "reject", f"{line!r} -> {row.event_type}"
    assert row.reason == reason


def test_kill_mod_strip_is_unconditional():
    # the reference drops the final char without checking it's a colon
    row = one(" 20:54 Kill: 3 4 72")
    assert row.event_type == "kill" and row.mod_id == 7


def test_kill_error_precedence_is_left_to_right():
    row = one(" 20:54 Kill: x y zz")
    assert row.reason == "parse_int_error"
    row = one(" 20:54 Kill: x")
    assert row.reason == "parse_int_error"  # killer parse fails first? no — killer present but bad
    row = one(" 20:54 Kill:")
    assert row.reason == "log_part_not_found:killer_id"


# ---- multi-line turns / line numbering --------------------------------------

def test_multiline_turn_line_numbers():
    text = (
        " 0:00 InitGame: \\x\\y\n"
        "some prose the gate drops\n"
        " 0:01 ClientConnect: 2\n"
        " 0:02 Kill: 1022 2 22: <world> killed P by MOD_TRIGGER_HURT"
    )
    out = run([text])
    assert list(out.event_type) == ["init", "connect", "kill"]
    assert list(out.line_no) == [0, 2, 3]
    audit = run([text], audit=True)
    assert len(audit) == 4  # + the dropped prose line


def test_raw_preserves_line_bytes():
    line = " 20:54 Kill: 1022 2 22:   <world>   killed  Isgalamido by MOD_TRIGGER_HURT "
    assert one(line).raw == line


def test_audit_partitions_all_lines():
    texts = [
        " 0:00 InitGame: \\a\\b\nprose\n 0:01 say: hi\n 0:02 Kill: 2 3 7: x",
        "nothing here",
        " 1:00 ShutdownGame:",
    ]
    audit = run(texts, audit=True)
    # every input line appears exactly once
    n_lines = sum(t.count("\n") + 1 for t in texts)
    assert len(audit) == n_lines
    # reconstruct each turn's text from raw lines → byte-identical
    for turn, expect in enumerate(texts):
        got = "\n".join(
            audit[audit.turn_idx == turn].sort_values("line_no").raw.tolist()
        )
        assert got == expect


# ---------------------------------------------------------------------------
# Grok pattern compiler (operators/grok.py)
# ---------------------------------------------------------------------------


def test_compile_grok_groups_and_types():
    from wolf_quake_spark.operators.grok import compile_grok

    regex, fields = compile_grok("%{IP:ip} - %{INT:code} %{NUMBER:secs} %{GREEDYDATA:msg}")
    assert fields == [("ip", None), ("code", "long"), ("secs", "double"), ("msg", None)]
    import re as _re

    m = _re.fullmatch(regex, "10.0.0.7 - 404 1.25 not found")
    assert m.groups() == ("10.0.0.7", "404", "1.25", "not found")
    # literal text is escaped: a regex metachar in the pattern is literal
    regex2, _ = compile_grok("cost($)=%{INT:c}")
    assert _re.fullmatch(regex2, "cost($)=5").group(1) == "5"
    # unnamed tokens match without capturing
    regex3, f3 = compile_grok("%{WORD} %{INT:v}")
    assert f3 == [("v", "long")]
    assert _re.fullmatch(regex3, "abc 7").groups() == ("7",)
    # unknown type fails at compile time
    import pytest

    with pytest.raises(ValueError):
        compile_grok("%{NOPE:x}")


def test_grok_parse_types_and_reject_flag(spark):
    from wolf_quake_spark.operators.grok import grok_parse

    df = spark.createDataFrame(
        [(1, "INFO user=7 took 1.5"), (2, "garbage line"), (3, "WARN user=-2 took 0.25")],
        "id long, line string",
    )
    out = grok_parse(
        df, "line", "%{LOGLEVEL:level} user=%{INT:uid} took %{NUMBER:secs}", keep=["id"]
    )
    rows = {r["id"]: r for r in out.collect()}
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "string", "bigint", "double", "boolean",
    ]
    assert rows[1]["level"] == "INFO" and rows[1]["uid"] == 7 and rows[1]["secs"] == 1.5
    assert rows[3]["uid"] == -2 and rows[3]["secs"] == 0.25
    assert not rows[2]["_grok_matched"] and rows[2]["uid"] is None
    assert rows[1]["_grok_matched"] and rows[3]["_grok_matched"]


def test_assemble_multiline_folds_continuations(spark):
    from wolf_quake_spark.operators.grok import assemble_multiline

    rows = [
        ("h1", 1, 0, "ERROR boom"),
        ("h1", 1, 1, "  at frame_a"),
        ("h1", 1, 2, "\tat frame_b"),
        ("h1", 2, 0, "INFO fine"),
        ("h1", 3, 0, "  orphan continuation"),  # wait: sorts after event 2
        ("h2", 1, 0, "WARN solo"),
    ]
    df = spark.createDataFrame(rows, "host string, seq long, line_no long, line string")
    out = {(r["host"], r["event_no"]): r for r in
           assemble_multiline(df, "host", ["seq", "line_no"]).collect()}
    # h1: ERROR + 2 continuations fold into event 1; INFO is event 2; the
    # later orphan continuation attaches to the preceding INFO event
    assert out[("h1", 1)]["n_lines"] == 3
    assert out[("h1", 1)]["content"] == "ERROR boom\n  at frame_a\n\tat frame_b"
    assert out[("h1", 2)]["n_lines"] == 2  # INFO + trailing orphan
    assert out[("h2", 1)]["content"] == "WARN solo"


def test_assemble_multiline_leading_orphan_groups_as_event_zero(spark):
    from wolf_quake_spark.operators.grok import assemble_multiline

    rows = [("h", 1, "  stray"), ("h", 2, "START ok"), ("h", 3, "  tail")]
    df = spark.createDataFrame(rows, "host string, seq long, line string")
    out = {r["event_no"]: r for r in assemble_multiline(df, "host", ["seq"]).collect()}
    assert out[0]["content"] == "  stray"  # emitted, never dropped
    assert out[1]["content"] == "START ok\n  tail"


def test_kv_extract_map_and_named_keys(spark):
    from pyspark.sql import functions as F

    from wolf_quake_spark.operators.grok import kv_extract

    df = spark.createDataFrame(
        [(1, "a=1 b=x c=2.5"), (2, "b=y newkey=surprise")], "id long, line string"
    )
    a, b = kv_extract(F.col("line"), keys=["a", "b"])
    rows = {r["id"]: r for r in df.select("id", a, b).collect()}
    assert rows[1]["a"] == "1" and rows[1]["b"] == "x"
    assert rows[2]["a"] is None and rows[2]["b"] == "y"  # absent key -> NULL
    # schema-free: the raw map sees keys no pattern anticipated
    m = {r["id"]: r["m"] for r in df.select("id", kv_extract(F.col("line")).alias("m")).collect()}
    assert m[2]["newkey"] == "surprise"
