"""Arrow extractor ⇔ pandas extractor parity (bit-identical rows).

The pyarrow-kernel path (operators/extract_arrow.py) is the default
extractor; the pandas path is the reference implementation.  They must agree
row-for-row on the reference fixtures and on adversarial token soup, in both
normal and audit mode.  (Row ORDER may differ — the arrow path groups output
by event type within a batch — so comparison sorts on the line key.)
"""

from __future__ import annotations

import random

import pandas as pd
import pyarrow as pa
import pytest

from wolf_quake_spark.datagen import read_reference_log
from wolf_quake_spark.operators.extract import _extract_batch
from wolf_quake_spark.operators.extract_arrow import (
    _OUT_PA_SCHEMA,
    _extract_record_batches,
)

KEY = ["conv_id", "turn_idx", "line_no", "event_type"]


def to_batch(pdf: pd.DataFrame) -> pa.RecordBatch:
    return pa.RecordBatch.from_pydict(
        {
            "conv_id": pa.array(pdf["conv_id"], pa.string()),
            "turn_idx": pa.array(pdf["turn_idx"], pa.int32()),
            "text": pa.array(pdf["text"], pa.string()),
        }
    )


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in ("killer_id", "victim_id", "mod_id", "client_id"):
        df[c] = pd.array(df[c], dtype="Int64")
    for c in ("name", "reason", "raw", "event_type", "conv_id"):
        df[c] = df[c].astype(object).where(pd.notna(df[c]), None)
    return df.sort_values(KEY).reset_index(drop=True)


def assert_parity(pdf: pd.DataFrame) -> None:
    for audit in (False, True):
        a = norm(_extract_batch(pdf, audit=audit))
        batches = _extract_record_batches(to_batch(pdf), audit=audit)
        b = norm(pa.Table.from_batches(batches, schema=_OUT_PA_SCHEMA).to_pandas())
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("logname", ["qgames.log", "simpletest.log"])
@pytest.mark.parametrize("lpt", [1, 3, 7])
def test_fixture_parity(logname, lpt):
    lines = read_reference_log(logname).split("\n")
    turns = ["\n".join(lines[i : i + lpt]) for i in range(0, len(lines), lpt)]
    assert_parity(
        pd.DataFrame(
            {"conv_id": ["c"] * len(turns), "turn_idx": range(len(turns)), "text": turns}
        )
    )


def test_soup_parity():
    rng = random.Random(7)
    toks = [
        "0:01", "Kill:", "ClientConnect:", "ClientUserinfoChanged:", "InitGame:",
        "ShutdownGame:", "12:", "+5", "4294967296", "99999999999", "abc",
        "n\\X\\t", "", " ", "---", "\\", "12a", ":::", "Item:", "say:", "5",
        "1022", "0", "-3", "+", "emoji😀", "0:0",
    ]
    soup = [" ".join(rng.choice(toks) for _ in range(rng.randrange(0, 7))) for _ in range(2000)]
    soup += [
        "", "\n", " 0:01 Kill: 5", " 0:01 Kill: 5 7", " 0:01 Kill: 5 7 1",
        " 0:01 Kill: 5 7 :", "0:01 ClientUserinfoChanged: 2",
        "0:01 ClientUserinfoChanged: 2 n", "0:01 ClientUserinfoChanged: 2 x\\Name\\t",
        " 0:01 Kill: +5 +7 +10:", " 0:01 Kill: 4294967295 0 1:",
        # non-ASCII whitespace: Python \s (pandas path) is Unicode-aware,
        # RE2 \s is ASCII-only — the arrow path pre-normalizes to match
        " 0:01 Kill: 5 7 1:", "0:01 ShutdownGame:",
        "0:01 ClientUserinfoChanged: 2 n\\A B\\t", "0:01　InitGame:",
        " ", "0:01\x1cKill: 1 2 3:",
        # \x0B: inside Python/Java \\s but OUTSIDE RE2 \\s (ASCII gap, r2 review)
        "0:01\x0bKill: 1 2 3: x killed y", "\x0b0:01 ShutdownGame:",
    ]
    turns = ["\n".join(soup[j : j + 3]) for j in range(0, len(soup), 3)]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i % 5}" for i in range(len(turns))],
            "turn_idx": range(len(turns)),
            "text": turns,
        }
    )
    pdf.loc[pdf.index % 41 == 0, "text"] = None
    assert_parity(pdf)


def test_empty_and_null_only():
    assert_parity(pd.DataFrame({"conv_id": pd.Series(dtype=object),
                                "turn_idx": pd.Series(dtype="int32"),
                                "text": pd.Series(dtype=object)}))
    assert_parity(pd.DataFrame({"conv_id": ["c"], "turn_idx": [0], "text": [None]}))
