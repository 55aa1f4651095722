"""Generate tests/plan_fingerprints.json: per-query physical-plan operator
fingerprints (counts of the operators that determine scale behavior).

Usage: python scripts/plan_fingerprints.py          # regenerate the file

The paired test (tests/test_plan_invariants.py) recomputes fingerprints and
diffs them against this snapshot, so ANY plan drift — a join strategy flip,
a new exchange, a Python-eval operator sneaking in — fails review visibly
instead of silently changing the performance envelope.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"

OPERATORS = [
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "WindowGroupLimit",
    "Expand",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
]


def fingerprint(plan: str) -> dict[str, int]:
    return {op: plan.count(op) for op in OPERATORS if plan.count(op)}


def compute_all(spark) -> dict[str, dict[str, int]]:
    from wolf_quake_spark.queries import queries

    out = {}
    for name, fn in sorted(queries().items()):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        out[name] = fingerprint(plan)
    return out


def main() -> None:
    from wolf_quake_spark.session import build_session

    spark = build_session("wqs-plan-fp", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    fps = compute_all(spark)
    path = os.path.join(REPO, "tests", "plan_fingerprints.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(fps, fh, indent=1, sort_keys=True)
    print(f"wrote {len(fps)} fingerprints to {path}")


if __name__ == "__main__":
    main()
