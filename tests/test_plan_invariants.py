"""Global physical-plan invariants over the ENTIRE query registry.

Per-query plan audits (test_plans.py) pin specific shapes; this sweep
enforces the two engine-wide rules on every registry entry at once, so a
future query can't slip in a scale-killer:

* no CartesianProduct anywhere (a 1-row scalar broadcast plans as
  BroadcastNestedLoopJoin, which is allowed — bounded by the 1-row side);
* no row-at-a-time Python (BatchEvalPython) — every Python kernel must be
  Arrow-vectorized (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
  MapInArrow), the north-rule's no-per-row-Python mandate.
"""

from __future__ import annotations

from wolf_quake_spark.queries import queries

SF_DIR = "/root/testdata/sf0.001"


def test_no_cartesian_or_row_python_anywhere(spark):
    bad: dict[str, list[str]] = {}
    for name, fn in sorted(queries().items()):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            problems.append("BatchEvalPython (row-at-a-time Python)")
        if problems:
            bad[name] = problems
    assert not bad, bad


def test_plan_fingerprints_match_snapshot(spark):
    """Full plan-regression pinning: every registry query's operator
    fingerprint (scale-determining operator counts) must match the
    reviewed snapshot.  On intentional plan changes, regenerate with
    `python scripts/plan_fingerprints.py` and review the diff."""
    import json
    import os

    sys_path_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys

    sys.path.insert(0, os.path.join(sys_path_dir, "scripts"))
    from plan_fingerprints import compute_all

    with open(os.path.join(sys_path_dir, "tests", "plan_fingerprints.json")) as fh:
        want = json.load(fh)
    got = compute_all(spark)
    drift = {
        name: (want.get(name), got.get(name))
        for name in set(want) | set(got)
        if want.get(name) != got.get(name)
    }
    assert not drift, f"plan drift (regenerate snapshot if intentional): {drift}"
