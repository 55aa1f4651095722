"""Grok-style pattern extraction for the parse stage.

The reference's parser is a hand-written per-line splitter for one fixed
format (``reference/src/parser.rs:159`` — timestamp gate, event-tag
dispatch, per-tag field projections).  Production log pipelines express the
same thing as GROK patterns: named typed tokens (``%{INT:uid}``) over a
library of base regexes, compiled once into a single anchored regex whose
capture groups become typed columns.  This module is that compiler, Spark-
first: the compiled pattern drives ``regexp_extract`` projections that stay
entirely inside whole-stage codegen — no UDF of any kind — and the same
regex/group-index semantics run verbatim in the DuckDB oracle (RE2-safe
pattern subset: no backreferences, no lookaround; each base pattern is
wrapped non-capturing so group numbers always equal field order).

Unmatched lines follow the pipeline's reject discipline (operators/
extract.py): ``grok_parse`` carries a ``_grok_matched`` flag so callers
route failures to a quarantine sink instead of silently dropping them.

Scale: one regex evaluation per extracted field per row, all JVM-side —
the same narrow-projection shape as the SQL extractor variant
(``extract.py`` ``sql`` path), so the stage fuses into the scan with zero
shuffles and scales embarrassingly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Base patterns: the commonly-used core of the logstash grok library,
# restricted to the Java-regex ∩ RE2 portable subset (both engines must
# agree byte-for-byte).  Each is wrapped (?:...) at use sites so user
# field groups are the only capturing groups.
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "QUOTEDSTRING": r'"[^"]*"',
}

# grok type → Spark cast target (unannotated tokens stay string)
_TYPE_CASTS = {"INT": "long", "NUMBER": "double"}

_TOKEN_RE = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def compile_grok(pattern: str) -> tuple[str, list[tuple[str, str | None]]]:
    """Compile a grok pattern to ``(regex, fields)``.

    ``%{TYPE:name}`` becomes a capturing group over TYPE's base regex and
    contributes ``(name, cast_type)`` to ``fields`` (in group order);
    ``%{TYPE}`` without a name matches without capturing.  Literal text
    between tokens is regex-escaped.  Unknown TYPEs raise — a typo'd
    pattern must fail at compile time, not silently match nothing.
    """
    out: list[str] = []
    fields: list[tuple[str, str | None]] = []
    last = 0
    for m in _TOKEN_RE.finditer(pattern):
        out.append(re.escape(pattern[last : m.start()]))
        typ, name = m.group(1), m.group(2)
        if typ not in GROK_PATTERNS:
            raise ValueError(f"unknown grok type %{{{typ}}}")
        base = GROK_PATTERNS[typ]
        if name:
            out.append(f"({base})")
            fields.append((name, _TYPE_CASTS.get(typ)))
        else:
            out.append(f"(?:{base})")
        last = m.end()
    out.append(re.escape(pattern[last:]))
    return "".join(out), fields


def grok_columns(col: Column, pattern: str) -> list[Column]:
    """The compiled pattern as a list of typed extraction Columns plus a
    trailing ``_grok_matched`` flag — composable into any projection."""
    regex, fields = compile_grok(pattern)
    anchored = f"^{regex}$"
    cols = []
    for i, (name, cast) in enumerate(fields, start=1):
        c = F.regexp_extract(col, anchored, i)
        if cast:
            # try_cast, not cast: an unmatched row extracts '' and must
            # yield NULL, not an ANSI NumberFormatException mid-stage
            c = c.try_cast(cast)
        cols.append(c.alias(name))
    cols.append(col.rlike(anchored).alias("_grok_matched"))
    return cols


def grok_parse(
    df: DataFrame, col: str, pattern: str, keep: list[str] | None = None
) -> DataFrame:
    """Parse ``df[col]`` with a grok pattern into typed columns.

    Returns ``keep`` (default: all original columns) + one column per named
    token + ``_grok_matched``.  Unmatched rows keep NULL/empty extractions
    and ``_grok_matched = false`` — route them to a reject sink, mirroring
    the pipeline's corrupt-line quarantine (``operators/extract.py``).
    """
    keep_cols = keep if keep is not None else df.columns
    return df.select(*keep_cols, *grok_columns(F.col(col), pattern))


# The registry fixture pattern (queries.grok_parse_events): shared between
# the Spark query and its generated oracle so both compile the same regex.
GROK_EVENTS_PATTERN = (
    "%{TIMESTAMP_ISO8601:log_ts} %{WORD:level} user=%{INT:uid}"
    " value_cents=%{INT:cents} %{GREEDYDATA:payload}"
)


def assemble_multiline(
    lines: DataFrame,
    partition_col: str,
    order_cols: list[str],
    line_col: str = "line",
    continuation: str = r"^[ \t]",
) -> DataFrame:
    """Multiline log-event assembly (the Logstash/Filebeat ``multiline``
    codec): fold continuation lines (default: starting with whitespace —
    stack frames, wrapped payloads) into the preceding header line, so one
    crash with a 40-frame trace becomes ONE event, not 41.

    Same closed form as the pipeline's game sessionization
    (operators/sessionize.py): a header flag prefix-summed over the
    stable ``order_cols`` order within ``partition_col`` numbers the
    events; one ordered struct-sort reassembles each event's lines.  ONE
    partition-keyed exchange serves the window AND the aggregation — at
    10^12 lines the partition key (conv/host/file) is what bounds sort
    width, exactly like sessionization.  A continuation line with no
    preceding header in its partition groups under event_no 0 (emitted,
    never dropped — the reject-visibility rule).

    Returns (partition_col, event_no, n_lines, first_* order cols,
    content) with ``content`` the newline-rejoined event text.
    """
    from pyspark.sql import Window

    is_start = (~F.col(line_col).rlike(continuation)).cast("long")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = lines.select(
        partition_col,
        *order_cols,
        line_col,
        F.sum(is_start).over(w).alias("event_no"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, F.col(line_col).alias("_l")))
    )
    return (
        numbered.groupBy(partition_col, "event_no")
        .agg(
            F.count("*").alias("n_lines"),
            *[F.min(c).alias(f"first_{c}") for c in order_cols],
            F.concat_ws("\n", F.transform(ordered, lambda s: s["_l"])).alias("content"),
        )
    )


def kv_extract(
    col: Column, pair_sep: str = " ", kv_sep: str = "=", keys: list[str] | None = None
) -> Column | list[Column]:
    """The Logstash ``kv`` filter: schema-free ``k=v`` pair extraction via
    Spark's built-in ``str_to_map`` — no pattern to maintain, any new key a
    producer adds is immediately queryable.  Returns the raw map Column,
    or (with ``keys``) one typed-string Column per requested key — project
    named keys when results feed a stable schema (map column iteration
    order is engine-dependent, named projection is not).  Pure built-in
    expression: whole-stage codegen, zero shuffle, no UDF."""
    m = F.str_to_map(col, F.lit(pair_sep), F.lit(kv_sep))
    if keys is None:
        return m
    return [F.element_at(m, k).alias(k) for k in keys]
