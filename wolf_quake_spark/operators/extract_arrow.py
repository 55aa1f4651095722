"""Arrow-native extraction — the same semantics as operators/extract.py's
pandas path, executed entirely in pyarrow.compute C kernels via ``mapInArrow``.

Why: profiling showed the pandas implementation's ``str`` accessor ops run
per-element Python loops on object dtype (~4.4 s of a 6.6 s batch), so the
extract stage — the pipeline's dominant cost — was CPU-bound in the Python
interpreter.  pyarrow's RE2-backed kernels (``extract_regex``,
``match_substring_regex``, ``split_pattern``) vectorize in C, and
``mapInArrow`` also skips the Arrow→pandas→Arrow conversion at the UDF
boundary.

Semantics notes (kept bit-identical to the pandas path; the cross-check test
asserts row equality on fixtures and generated soups):

* ``extract_regex`` yields a NULL struct when the whole pattern misses and
  empty strings for unmatched optional groups — unambiguous here because
  every group is ``\\S+`` (can never match empty).
* RE2 has no lookarounds/backrefs; none are used.
* ``.$`` strips one trailing codepoint, matching Python ``str[:-1]``.

Reference semantics replicated (citations in operators/extract.py):
timestamp gate parser.rs:167-174, tag dispatch parser.rs:179-213, kill parse
parser.rs:104-121, connect parser.rs:43-60, userinfo name parser.rs:64-87.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

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

_OUT_PA_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("line_no", pa.int32()),
        ("event_type", pa.string()),
        ("killer_id", pa.int64()),
        ("victim_id", pa.int64()),
        ("mod_id", pa.int64()),
        ("client_id", pa.int64()),
        ("name", pa.string()),
        ("reason", pa.string()),
        ("raw", pa.string()),
    ]
)

_TAGS = pa.array(list(EVENT_TAGS), pa.string())
_TAG_CODES = pa.array(list(EVENT_TAGS.values()), pa.string())

_KILL_RE = r"^\s*\S+\s+\S+\s+(?P<k>\S+)(?:\s+(?P<v>\S+))?(?:\s+(?P<m>\S+))?"
_REST_RE = r"^\s*\S+\s+\S+\s+\S+(?P<rest>(?:\s+\S+)*)\s*$"

# Whitespace codepoints Python's re \s (the pandas path, Unicode-aware — like
# the reference's Rust split_whitespace) matches but RE2's \s (= [ \t\n\f\r]
# only — NOT \x0B) does not.  Matching lines are pre-normalized to ASCII
# space before the RE2 kernels so tokenization is identical across the three
# extract paths; the ORIGINAL line still flows to the ``raw`` output column
# untouched (per-turn/per-line byte identity).
_NON_ASCII_WS_RE = (
    "[\\x{000B}\\x{001C}-\\x{001F}\\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}"
    "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"
)


def _true(mask: pa.Array) -> pa.Array:
    """NULL→False (arrow comparisons propagate nulls; we need strict bools)."""
    return pc.fill_null(mask, False)


def _u32(tok: pa.Array) -> tuple[pa.Array, pa.Array]:
    """Rust ``str::parse::<u32>`` analog: optional '+', digits, ≤ u32::MAX.

    ``tok`` uses "" for missing (unmatched optional group).  Returns
    (int64 values with NULL where invalid, strict-bool ok mask).
    """
    shape_ok = _true(pc.match_substring_regex(tok, r"^\+?[0-9]{1,10}$"))
    digits = pc.if_else(shape_ok, pc.replace_substring_regex(tok, r"^\+", ""), None)
    val = pc.cast(digits, pa.int64(), safe=False)
    ok = _true(pc.and_(shape_ok, pc.less_equal(val, U32_MAX)))
    return pc.if_else(ok, val, None), ok


def _reason_chain(*cond_reason: tuple[pa.Array, str]) -> pa.Array:
    """First-match-wins reason chain (NULL when no condition holds)."""
    out = pa.nulls(len(cond_reason[0][0]), pa.string())
    for cond, reason in reversed(cond_reason):
        out = pc.if_else(cond, pa.scalar(reason, pa.string()), out)
    return out


def _field(struct_arr: pa.Array, name: str) -> pa.Array:
    """Struct field with NULL structs flattened to "" (treated as missing)."""
    return pc.fill_null(pc.struct_field(struct_arr, name), "")


def _empty_batch() -> pa.RecordBatch:
    return pa.RecordBatch.from_pydict(
        {f.name: pa.array([], f.type) for f in _OUT_PA_SCHEMA}, schema=_OUT_PA_SCHEMA
    )


def _subset_batch(
    base: dict[str, pa.Array],
    mask: pa.Array,
    event_type,
    *,
    killer=None,
    victim=None,
    mod=None,
    client=None,
    name=None,
    reason=None,
) -> pa.RecordBatch | None:
    """Output rows for one tag subset; field args are already subset-length."""
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return None
    n = len(idx)
    take = pa.array(idx)

    def col(v, typ):
        if v is None:
            return pa.nulls(n, typ)
        if isinstance(v, str):
            return pa.array([v] * n, typ)
        return pc.cast(v, typ)

    return pa.RecordBatch.from_arrays(
        [
            pc.take(base["conv_id"], take),
            pc.take(base["turn_idx"], take),
            pc.take(base["line_no"], take),
            col(event_type, pa.string()),
            col(killer, pa.int64()),
            col(victim, pa.int64()),
            col(mod, pa.int64()),
            col(client, pa.int64()),
            col(name, pa.string()),
            col(reason, pa.string()),
            pc.take(base["line"], take),
        ],
        schema=_OUT_PA_SCHEMA,
    )


def _extract_record_batches(rb: pa.RecordBatch, audit: bool) -> list[pa.RecordBatch]:
    """Per-tag subset processing: the expensive field regexes run only over
    the rows of their own event type (kills ≈ 20 % of lines, userinfo a few
    %), instead of every gated line.  Output row order is grouped by subset —
    downstream never depends on intra-partition order (everything keys on
    (conv_id, turn_idx, line_no))."""
    if rb.num_rows == 0:
        return []
    text = pc.fill_null(pc.cast(rb.column("text"), pa.string()), "")
    parts = pc.split_pattern(text, "\n")
    line = pc.list_flatten(parts)
    # normalized copy for matching only; `line` itself feeds the raw column.
    # Detection first: the common all-ASCII batch then pays one RE2 scan and
    # skips the string rebuild entirely (mline aliases line, zero-copy).
    has_uws = pc.match_substring_regex(line, _NON_ASCII_WS_RE)
    if pc.any(pc.fill_null(has_uws, False)).as_py():
        mline = pc.replace_substring_regex(line, _NON_ASCII_WS_RE, " ")
    else:
        mline = line
    parent = pc.list_parent_indices(parts)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(counts.sum())
    offsets = np.cumsum(counts) - counts
    line_no = pa.array(
        (np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)).astype(np.int32)
    )
    conv_id = pc.take(pc.cast(rb.column("conv_id"), pa.string()), parent)
    turn_idx = pc.take(pc.cast(rb.column("turn_idx"), pa.int32()), parent)

    tok0 = pc.struct_field(pc.extract_regex(mline, r"^\s*(?P<t0>\S+)"), "t0")
    gate = _true(pc.match_substring_regex(tok0, r"^[0-9:]{4,}$")).to_numpy(
        zero_copy_only=False
    )

    dropped_batch = None
    if audit:
        dropped_batch = _subset_batch(
            {"conv_id": conv_id, "turn_idx": turn_idx, "line_no": line_no, "line": line},
            ~gate,
            EV_DROPPED,
        )
    keep = pa.array(np.flatnonzero(gate))
    base = {
        "conv_id": pc.take(conv_id, keep),
        "turn_idx": pc.take(turn_idx, keep),
        "line_no": pc.take(line_no, keep),
        "line": pc.take(line, keep),
    }
    gline = pc.take(mline, keep)  # matching copy; base["line"] stays raw
    if len(gline) == 0:
        return [dropped_batch] if dropped_batch is not None else []

    tag = pc.struct_field(pc.extract_regex(gline, r"^\s*\S+\s+(?P<tag>\S+)"), "tag")
    no_tag = pc.is_null(tag).to_numpy(zero_copy_only=False)
    ev = pc.take(_TAG_CODES, pc.index_in(tag, value_set=_TAGS))
    ign = pc.and_(pc.is_null(ev), pc.is_valid(tag)).to_numpy(zero_copy_only=False)
    ev = ev.to_numpy(zero_copy_only=False)

    out: list[pa.RecordBatch | None] = [dropped_batch]
    out.append(
        _subset_batch(base, no_tag, EV_REJECT, reason=f"{R_LOG_PART_NOT_FOUND}:event")
    )
    if audit:
        out.append(_subset_batch(base, ign, EV_IGNORED))
    for bev in (EV_INIT, EV_SHUTDOWN):
        out.append(_subset_batch(base, ev == bev, bev))

    def sub_take(mask):
        idx = pa.array(np.flatnonzero(mask))
        return idx, pc.take(gline, idx)

    # ---- Kill: killer victim mod (parser.rs:104-121) --------------------
    km = ev == EV_KILL
    if km.any():
        _, kl = sub_take(km)
        kx = pc.extract_regex(kl, _KILL_RE)
        ktok, vtok, mtok = _field(kx, "k"), _field(kx, "v"), _field(kx, "m")
        k_val, k_ok = _u32(ktok)
        v_val, v_ok = _u32(vtok)
        m_present = _true(pc.greater(pc.utf8_length(mtok), 1))
        m_body = pc.if_else(m_present, pc.replace_substring_regex(mtok, r".$", ""), None)
        m_val, m_ok = _u32(pc.fill_null(m_body, ""))
        # precedence mirrors the pandas path: killer > victim > mean_id
        reason = _reason_chain(
            (pc.equal(ktok, ""), f"{R_LOG_PART_NOT_FOUND}:killer_id"),
            (pc.invert(k_ok), R_PARSE_INT),
            (pc.equal(vtok, ""), f"{R_LOG_PART_NOT_FOUND}:victim_id"),
            (pc.invert(v_ok), R_PARSE_INT),
            (pc.invert(m_present), f"{R_LOG_PART_NOT_FOUND}:mean_id"),
            (pc.invert(m_ok), R_PARSE_INT),
        )
        ok = pc.is_null(reason)
        out.append(
            _subset_batch(
                base,
                km,
                pc.if_else(ok, pa.scalar(EV_KILL), pa.scalar(EV_REJECT)),
                killer=pc.if_else(ok, k_val, None),
                victim=pc.if_else(ok, v_val, None),
                mod=pc.if_else(ok, m_val, None),
                reason=reason,
            )
        )

    # ---- ClientConnect / ClientUserinfoChanged (parser.rs:43-87) --------
    for cev, with_name in ((EV_CONNECT, False), (EV_USERINFO, True)):
        cm = ev == cev
        if not cm.any():
            continue
        _, cl = sub_take(cm)
        ctok = _field(pc.extract_regex(cl, r"^\s*\S+\s+\S+\s+(?P<c>\S+)"), "c")
        c_val, c_ok = _u32(ctok)
        reason = _reason_chain(
            (pc.equal(ctok, ""), f"{R_LOG_PART_NOT_FOUND}:client_id"),
            (pc.invert(c_ok), R_PARSE_INT),
        )
        ok = pc.is_null(reason)
        name = None
        if with_name:
            rest = _field(pc.extract_regex(cl, _REST_RE), "rest")
            rest_norm = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(rest, r"\s+", " ")
            )
            uname = pc.list_element(
                pc.split_pattern(pc.utf8_slice_codeunits(rest_norm, 2), "\\"), 0
            )
            name = pc.if_else(ok, uname, None)
        out.append(
            _subset_batch(
                base,
                cm,
                pc.if_else(ok, pa.scalar(cev), pa.scalar(EV_REJECT)),
                client=pc.if_else(ok, c_val, None),
                name=name,
                reason=reason,
            )
        )

    batches = [b for b in out if b is not None]
    if not batches:
        return []
    # emit every chunk: a >2 GiB string column chunks after combine_chunks,
    # and to_batches()[0] would silently drop the rest
    return pa.Table.from_batches(batches).combine_chunks().to_batches()


def extract_events_arrow(transcripts: DataFrame, audit: bool = False) -> DataFrame:
    """Arrow-kernel extraction via ``mapInArrow`` (default extract path).

    Identical output to :func:`wolf_quake_spark.operators.extract.extract_events`
    (asserted by tests/test_extract_arrow.py); ~4× the single-core
    throughput.
    """

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            yield from _extract_record_batches(rb, audit=audit)

    cols = transcripts.select("conv_id", "turn_idx", "text")
    return cols.mapInArrow(gen, schema=EVENTS_SCHEMA)
