"""The repo's canonical portable hash fold: md5 hex nibbles → BIGINT.

Every cross-engine-deterministic hash in this repo (partition-transform
buckets, per-partition Bloom bits, KMV/HLL sketch registers, sampling
buckets) reduces to folding a run of md5 hex digits into an integer the
SAME way in Spark and in the DuckDB oracle SQL.  The oracle guarantee
rests on every fold being bit-identical — one shared definition, imported
everywhere, is the point (a drifted private copy would silently break
value-hash parity).  Production ports swap md5 for murmur3/xxhash at the
call sites that note it; the fold contract (deterministic, uniform,
null-safe at the caller) is what matters.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HEX = "0123456789abcdef"


def nib(h: Column, i: int) -> Column:
    """Value of hex digit ``i`` (0-based) of hex string ``h``."""
    return F.instr(F.lit(HEX), F.substring(h, i + 1, 1)) - 1


def fold(h: Column, start: int, n: int) -> Column:
    """Fold ``n`` hex nibbles of ``h`` from ``start`` into a BIGINT."""
    acc = nib(h, start).cast("long")
    for i in range(start + 1, start + n):
        acc = acc * 16 + nib(h, i)
    return acc


def fold_sql(h_sql: str, start: int, n: int) -> str:
    """DuckDB mirror of :func:`fold` over a hex-string SQL expression."""
    nib_sql = lambda i: f"(strpos('{HEX}', substr({h_sql}, {i + 1}, 1)) - 1)"  # noqa: E731
    acc = nib_sql(start)
    for i in range(start + 1, start + n):
        acc = f"({acc} * 16 + {nib_sql(i)})"
    return acc
