"""Stage 1 — vectorized extraction of typed event records from turn text.

Semantics replicate the reference's per-line parse loop exactly
(src/quake3_parser/parser.rs:159-217):

1. split ``text`` into lines; tokenize each line on whitespace;
2. timestamp gate: drop the line silently unless the first token has length
   ≥ 4 and every char is ``[0-9:]`` (parser.rs:167-174 — this is what skips
   the corrupt boundary line in the qgames fixture);
3. a gated line with no second token is an error —
   ``LogPartNotFound("event")`` (parser.rs:175-177); here it becomes a
   ``reject`` row instead of aborting;
4. dispatch on the second token: ``InitGame:`` / ``ShutdownGame:`` /
   ``ClientConnect:`` / ``ClientUserinfoChanged:`` / ``Kill:``; all other
   tags are silently ignored (parser.rs:212);
5. field parses mirror parse_client_connect (parser.rs:43-60), parse_user_info
   (parser.rs:64-87: name = remaining tokens joined by a single space, skip
   the first 2 chars, take until the next backslash) and parse_kill
   (parser.rs:95-154: killer/victim/mod as u32, the mod token must have
   length > 1 and is parsed after dropping its final char).

Three implementations with identical output (cross-checked by tests):

* :func:`extract_events` (= extract_arrow.extract_events_arrow) — the
  default: ``mapInArrow`` with pyarrow C compute kernels, per-event-type
  subset parsing.  Fastest (~5× the pandas path single-core).
* :func:`extract_events_pandas` — ``mapInPandas`` pandas UDF.  All work is
  pandas vectorized string ops over Arrow batches; no per-row Python.
* :func:`extract_events_sql` — pure Catalyst (``posexplode`` +
  ``regexp_extract``), fully JVM-side / whole-stage-codegen.  ~6× slower
  than the arrow path (several JVM regex evaluations per line); kept as the
  no-Python alternate.  `bench.py` compares the paths.

At 100 TB both are narrow (no shuffle): they parallelize linearly with input
splits, so this stage never bottlenecks scale-up.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.data_model import (
    EV_CONNECT,
    EV_DROPPED,
    EV_IGNORED,
    EV_INIT,
    EV_KILL,
    EV_REJECT,
    EV_SHUTDOWN,
    EV_USERINFO,
    EVENT_TAGS,
    EVENTS_SCHEMA,
    R_LOG_PART_NOT_FOUND,
    R_PARSE_INT,
    U32_MAX,
)

_GATE_RE = r"[0-9:]{4,}"
_OUT_COLS = [f.name for f in EVENTS_SCHEMA.fields]


def _u32_parse(tok: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Vectorized Rust-``str::parse::<u32>`` analog.

    Returns (value as nullable Int64, ok mask).  Accepts an optional leading
    ``+`` like Rust's u32 FromStr; rejects sign-less non-digits, empties and
    values above u32::MAX (overflow is a ParseIntError in the reference).
    """
    s = tok.fillna("")
    digits = s.str.fullmatch(r"\+?[0-9]{1,10}")
    val = pd.to_numeric(s.where(digits).str.lstrip("+"), errors="coerce").astype("Int64")
    ok = digits & (val <= U32_MAX).fillna(False)
    return val.where(ok), ok


def _explode_lines(pdf: pd.DataFrame) -> pd.DataFrame:
    """Flatten turns to one row per line, keeping (conv_id, turn_idx, line_no)."""
    text = pdf["text"].fillna("")
    # str.split("\n") matches Python splitlines-for-'\n' + Rust `.lines()`
    # closely enough for our corpus; Rust `.lines()` drops a trailing final
    # newline's empty tail — empty lines are skipped by the gate anyway.
    parts = text.str.split("\n")
    counts = parts.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    offsets = np.cumsum(counts) - counts
    # index of each line within its turn, fully vectorized
    line_no = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
    flat = pd.DataFrame(
        {
            "conv_id": np.repeat(pdf["conv_id"].to_numpy(), counts),
            "turn_idx": np.repeat(pdf["turn_idx"].to_numpy(), counts),
            "line_no": line_no.astype("int32"),
            "line": np.concatenate(parts.to_numpy()) if total else np.array([], dtype=object),
        }
    )
    return flat


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype="int32"),
            "line_no": pd.Series(dtype="int32"),
            "event_type": pd.Series(dtype=object),
            "killer_id": pd.Series(dtype="Int64"),
            "victim_id": pd.Series(dtype="Int64"),
            "mod_id": pd.Series(dtype="Int64"),
            "client_id": pd.Series(dtype="Int64"),
            "name": pd.Series(dtype=object),
            "reason": pd.Series(dtype=object),
            "raw": pd.Series(dtype=object),
        }
    )


def _extract_batch(pdf: pd.DataFrame, audit: bool) -> pd.DataFrame:
    if len(pdf) == 0:
        return _empty_out()
    flat = _explode_lines(pdf)
    if len(flat) == 0:
        return _empty_out()

    line = flat["line"]
    tok0 = line.str.extract(r"^\s*(\S+)", expand=False)
    gate = tok0.notna() & tok0.str.fullmatch(_GATE_RE).eq(True)

    out = flat.loc[gate, ["conv_id", "turn_idx", "line_no"]].copy()
    gline = line[gate]
    tag = gline.str.extract(r"^\s*\S+\s+(\S+)", expand=False)

    ev = tag.map(EVENT_TAGS)
    event_type = ev.where(tag.notna(), EV_REJECT)  # gated, no 2nd token → reject
    event_type = event_type.where(event_type.notna(), EV_IGNORED)

    n = len(out)
    killer = pd.Series(pd.NA, index=out.index, dtype="Int64")
    victim = killer.copy()
    mod = killer.copy()
    client = killer.copy()
    name = pd.Series(None, index=out.index, dtype=object)
    reason = pd.Series(None, index=out.index, dtype=object)

    no_tag = tag.isna()
    reason[no_tag] = f"{R_LOG_PART_NOT_FOUND}:event"

    # ---- Kill: killer victim mod (parser.rs:104-121) --------------------
    km = ev == EV_KILL
    if km.any():
        kx = gline[km].str.extract(r"^\s*\S+\s+\S+\s+(\S+)(?:\s+(\S+))?(?:\s+(\S+))?")
        k_val, k_ok = _u32_parse(kx[0])
        v_val, v_ok = _u32_parse(kx[1])
        mtok = kx[2]
        # mod token: missing or len<=1 → LogPartNotFound("mean_id"); else
        # drop the final char (the colon) and u32-parse the rest.
        m_present = mtok.notna() & (mtok.str.len() > 1)
        m_val, m_ok = _u32_parse(mtok.where(m_present).str[:-1])

        k_reason = pd.Series(None, index=kx.index, dtype=object)
        k_reason[m_present.eq(False)] = f"{R_LOG_PART_NOT_FOUND}:mean_id"
        k_reason[m_present & ~m_ok] = R_PARSE_INT
        k_reason[kx[1].isna()] = f"{R_LOG_PART_NOT_FOUND}:victim_id"
        k_reason[kx[1].notna() & ~v_ok] = R_PARSE_INT
        k_reason[kx[0].isna()] = f"{R_LOG_PART_NOT_FOUND}:killer_id"
        k_reason[kx[0].notna() & ~k_ok] = R_PARSE_INT

        ok = k_reason.isna()
        killer[km] = k_val.where(ok)
        victim[km] = v_val.where(ok)
        mod[km] = m_val.where(ok)
        reason[km] = k_reason
        event_type[km] = np.where(ok, EV_KILL, EV_REJECT)

    # ---- ClientConnect: client_id (parser.rs:43-60) ----------------------
    cm = ev == EV_CONNECT
    if cm.any():
        ctok = gline[cm].str.extract(r"^\s*\S+\s+\S+\s+(\S+)", expand=False)
        c_val, c_ok = _u32_parse(ctok)
        c_reason = pd.Series(None, index=ctok.index, dtype=object)
        c_reason[ctok.notna() & ~c_ok] = R_PARSE_INT
        c_reason[ctok.isna()] = f"{R_LOG_PART_NOT_FOUND}:client_id"
        ok = c_reason.isna()
        client[cm] = c_val.where(ok)
        reason[cm] = c_reason
        event_type[cm] = np.where(ok, EV_CONNECT, EV_REJECT)

    # ---- ClientUserinfoChanged: client_id + name (parser.rs:64-87) -------
    um = ev == EV_USERINFO
    if um.any():
        ux = gline[um].str.extract(r"^\s*\S+\s+\S+\s+(\S+)((?:\s+\S+)*)\s*$")
        u_val, u_ok = _u32_parse(ux[0])
        # remaining tokens joined by a single space (split_whitespace + join)
        rest = ux[1].fillna("").str.replace(r"\s+", " ", regex=True).str.strip()
        # skip 2 chars (the "n\" prefix), take until the next backslash
        uname = rest.str[2:].str.split("\\", n=1).str[0]
        u_reason = pd.Series(None, index=ux.index, dtype=object)
        u_reason[ux[0].notna() & ~u_ok] = R_PARSE_INT
        u_reason[ux[0].isna()] = f"{R_LOG_PART_NOT_FOUND}:client_id"
        ok = u_reason.isna()
        client[um] = u_val.where(ok)
        name[um] = uname.where(ok)
        reason[um] = u_reason
        event_type[um] = np.where(ok, EV_USERINFO, EV_REJECT)

    out["event_type"] = event_type.to_numpy()
    out["killer_id"] = killer
    out["victim_id"] = victim
    out["mod_id"] = mod
    out["client_id"] = client
    out["name"] = name
    out["reason"] = reason
    out["raw"] = gline

    if audit:
        dropped = flat.loc[~gate, ["conv_id", "turn_idx", "line_no"]].copy()
        dropped["event_type"] = EV_DROPPED
        for c in ("killer_id", "victim_id", "mod_id", "client_id"):
            dropped[c] = pd.Series(pd.NA, index=dropped.index, dtype="Int64")
        dropped["name"] = None
        dropped["reason"] = None
        dropped["raw"] = line[~gate]
        out = pd.concat([out, dropped], ignore_index=False)
    else:
        out = out[out["event_type"] != EV_IGNORED]

    out["turn_idx"] = out["turn_idx"].astype("int32")
    out["line_no"] = out["line_no"].astype("int32")
    return out[_OUT_COLS]


def extract_events_pandas(transcripts: DataFrame, audit: bool = False) -> DataFrame:
    """Vectorized pandas-UDF extraction (``mapInPandas``).

    ``audit=True`` additionally emits ``ignored`` (gated, unhandled tag) and
    ``dropped`` (failed the timestamp gate) rows so tests can verify that the
    routed rows exactly partition the input lines and that ``text`` is
    reconstructable byte-identically.

    Superseded as the default by the pyarrow-kernel implementation in
    extract_arrow.py (5× the single-core throughput, identical output);
    kept as the reference implementation and for the bench comparison.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf, audit=audit)

    cols = transcripts.select("conv_id", "turn_idx", "text")
    return cols.mapInPandas(gen, schema=EVENTS_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-Catalyst variant (JVM-side, whole-stage codegen; no Python workers)
# ---------------------------------------------------------------------------

def _u32_digits(tok: Column) -> Column:
    """Body of a ``^\\+?[0-9]{1,10}$``-shaped token (leading ``+`` stripped),
    NULL when the shape doesn't hold — translate/length arithmetic only, no
    per-token regex (the hot path runs this 4× per line)."""
    body = F.when(tok.startswith("+"), F.substring(tok, 2, 10)).otherwise(tok)
    # the substring above caps at 10 chars, so a '+' followed by >10 digits
    # must be re-rejected on the ORIGINAL length, not the truncated body
    ok = (
        (body != "")
        & (F.length(tok) <= F.when(tok.startswith("+"), 11).otherwise(10))
        & (F.length(F.translate(body, "0123456789", "")) == 0)
    )
    return F.when(ok, body)


def _u32_col(tok: Column) -> Column:
    body = _u32_digits(tok)
    val = body.cast("long")
    return F.when(body.isNotNull() & (val <= F.lit(U32_MAX)), val)


def extract_events_sql(transcripts: DataFrame, audit: bool = False) -> DataFrame:
    """Same semantics as :func:`extract_events`, built from Catalyst exprs.

    posexplode(split(text)) → ONE whitespace tokenization per line (split
    after an anchored leading-whitespace strip) → field selection by array
    index; the gate and u32 parses are translate/length arithmetic.  The
    original formulation re-scanned each line with ~7 independent regexes
    (tok0, tag, a 3-group kill regex evaluated 3×, rest) — measured 9.1 s →
    see BENCH.md after the rewrite at sf0.1/local[32].  Used as the
    performance alternate; `bench.py` measures both paths.
    """
    lines = transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode_outer(F.split(F.coalesce(F.col("text"), F.lit("")), "\n")).alias(
            "line_no", "line"
        ),
    ).withColumn("line_no", F.col("line_no").cast("int"))

    # one tokenization per line: strip leading whitespace (anchored regex),
    # split on whitespace runs.  A trailing whitespace run yields one
    # trailing "" element (Java split keeps it at limit -1) — harmless for
    # front-indexed fields; rest_norm trims it away.
    toks = F.split(F.regexp_replace("line", r"^\s+", ""), r"\s+")
    gated = (
        lines.withColumn("toks", toks)
        .withColumn("tok0", F.coalesce(F.get("toks", 0), F.lit("")))
        .withColumn(
            "gate",
            (F.length("tok0") >= 4)
            & (F.length(F.translate("tok0", "0123456789:", "")) == 0),
        )
    )
    if not audit:
        gated = gated.filter("gate")

    mapping = F.create_map(
        *[F.lit(x) for kv in EVENT_TAGS.items() for x in kv]
    )
    df = gated.withColumn(
        "tag", F.coalesce(F.get("toks", 1), F.lit(""))
    ).withColumn("ev", mapping[F.col("tag")])

    ktok = [F.coalesce(F.get("toks", i), F.lit("")) for i in (2, 3, 4)]
    mod_tok = ktok[2]
    mod_body = F.substring(mod_tok, 1, F.length(mod_tok) - F.lit(1))

    # tokens 4.. joined with single spaces == the old trim+collapse of the
    # raw remainder (interior runs can't survive a \s+ split; the possible
    # trailing "" joins as a trailing space that trim removes)
    rest_norm = F.trim(
        F.array_join(
            F.slice(
                F.col("toks"), 4, F.greatest(F.size("toks") - 3, F.lit(0))
            ),
            " ",
        )
    )
    uname = F.split(F.substring(rest_norm, 3, 1 << 30), r"\\", 2).getItem(0)

    killer = _u32_col(ktok[0])
    victim = _u32_col(ktok[1])
    mod = F.when(F.length(mod_tok) > 1, _u32_col(mod_body))
    client3 = _u32_col(ktok[0])

    is_kill = F.col("ev") == EV_KILL
    is_conn = F.col("ev") == EV_CONNECT
    is_uinfo = F.col("ev") == EV_USERINFO

    kill_reason = (
        F.when(ktok[0] == "", F.lit(f"{R_LOG_PART_NOT_FOUND}:killer_id"))
        .when(killer.isNull(), F.lit(R_PARSE_INT))
        .when(ktok[1] == "", F.lit(f"{R_LOG_PART_NOT_FOUND}:victim_id"))
        .when(victim.isNull(), F.lit(R_PARSE_INT))
        .when((ktok[2] == "") | (F.length(mod_tok) <= 1), F.lit(f"{R_LOG_PART_NOT_FOUND}:mean_id"))
        .when(mod.isNull(), F.lit(R_PARSE_INT))
    )
    conn_reason = F.when(ktok[0] == "", F.lit(f"{R_LOG_PART_NOT_FOUND}:client_id")).when(
        client3.isNull(), F.lit(R_PARSE_INT)
    )

    reason = (
        F.when(~F.col("gate"), F.lit(None).cast("string"))
        .when(F.col("tag") == "", F.lit(f"{R_LOG_PART_NOT_FOUND}:event"))
        .when(is_kill, kill_reason)
        .when(is_conn | is_uinfo, conn_reason)
    )
    event_type = (
        F.when(~F.col("gate"), F.lit(EV_DROPPED))
        .when(reason.isNotNull(), F.lit(EV_REJECT))
        .when(F.col("ev").isNotNull(), F.col("ev"))
        .otherwise(F.lit(EV_IGNORED))
    )

    ok = reason.isNull() & F.col("gate")
    out = df.select(
        "conv_id",
        "turn_idx",
        "line_no",
        event_type.alias("event_type"),
        F.when(ok & is_kill, killer).alias("killer_id"),
        F.when(ok & is_kill, victim).alias("victim_id"),
        F.when(ok & is_kill, mod).alias("mod_id"),
        F.when(ok & (is_conn | is_uinfo), client3).alias("client_id"),
        F.when(ok & is_uinfo, uname).alias("name"),
        reason.alias("reason"),
        F.col("line").alias("raw"),
    )
    if not audit:
        out = out.filter(F.col("event_type") != EV_IGNORED)
    return out


# The default extract path: pyarrow-kernel implementation (see extract_arrow.py
# for why).  Import placed at module end to keep this file's pandas reference
# implementation self-contained above it.
from wolf_quake_spark.operators.extract_arrow import (  # noqa: E402
    extract_events_arrow,
)

extract_events = extract_events_arrow

# extractor registry for pipeline/bench mode switches ("udf" = the default
# arrow path, kept for backward compatibility of the mode name)
EXTRACTORS = {
    "udf": extract_events_arrow,
    "arrow": extract_events_arrow,
    "pandas": extract_events_pandas,
    "sql": extract_events_sql,
}
