"""Deterministic stratified sampling for corpus rebalancing.

Downsampling over-represented strata (languages, sources) is a standard
training-data step.  At cluster scale it must NOT use ``df.sample`` or
``rand()``: those are partition-order-dependent, so the kept set changes
with cluster size, task retries, and AQE re-planning — unacceptable for a
reproducible corpus.  A multiplicative hash of the stable document id gives
a sample that is identical on 1 core or 1000 executors, survives re-runs,
and needs no shuffle at all (pure filter, fully pushed into the scan stage).

The salt decorrelates this bucket from the train/val/test split hash
(analysis/contamination.py): a doc's sampling fate is independent of its
split assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.contamination import HASH_MOD, KNUTH


def hash_bucket(doc_id: Column, salt: int = 0) -> Column:
    """Deterministic 0..999 bucket from a stable id (Knuth multiplicative)."""
    return ((doc_id * F.lit(KNUTH) + F.lit(salt)) % F.lit(HASH_MOD)) % F.lit(1000)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.5,
    key: str = "lang",
    salt: int = 12345,
) -> DataFrame:
    """Keep each doc with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep rate in [0, 1]; strata not listed
    use ``default_rate``.  Pure narrow filter — zero shuffle, zero RNG.
    """
    thresh = F.lit(None)
    case = None
    for k in sorted(rates):
        cond = F.col(key) == k
        val = F.lit(int(round(rates[k] * 1000)))
        case = F.when(cond, val) if case is None else case.when(cond, val)
    thresh = (
        case.otherwise(F.lit(int(round(default_rate * 1000))))
        if case is not None
        else F.lit(int(round(default_rate * 1000)))
    )
    return docs.filter(hash_bucket(F.col("doc_id"), salt) < thresh)
