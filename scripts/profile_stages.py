"""Steady-state per-stage wall-clock profile at one parallelism level.

Each stage is timed best-of-N after a full-shape warm-up, because the first
execution of a query shape in a fresh JVM pays one-off JIT/codegen/Python
worker costs that are amortized away in the 100 TB analog (a long-running
job).  Usage:

    python scripts/profile_stages.py <cores> <input_path> [extractor] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1])
    path = sys.argv[2]
    extractor = sys.argv[3] if len(sys.argv) > 3 else "udf"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from wolf_quake_spark.operators import assign_games
    from wolf_quake_spark.operators.aggregates import (
        game_totals,
        mod_histogram,
        player_ranking,
    )
    from wolf_quake_spark.operators.extract import EXTRACTORS
    from wolf_quake_spark.session import build_session

    ex = EXTRACTORS[extractor]

    spark = build_session(
        "wqs-profile", master=f"local[{cores}]", shuffle_partitions=max(cores, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(1 << 20, total_bytes // 96)))
    tr = spark.read.parquet(path)

    def best(fn):
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            times.append(round(time.monotonic() - t0, 2))
        return times

    out = {"cores": cores, "extractor": extractor, "n_turns": tr.count()}

    # full-shape warm-up: every stage once, including the aggregates, so JIT /
    # codegen / Python-worker pool / broadcast machinery are all primed
    warm = assign_games(ex(tr)).persist()
    warm.groupBy("event_type").count().collect()
    for agg in (game_totals, mod_histogram, player_ranking):
        agg(warm).write.mode("overwrite").format("noop").save()
    warm.unpersist()

    ev = ex(tr)
    out["extract_noop"] = best(lambda: ev.write.mode("overwrite").format("noop").save())
    sess = assign_games(ev)
    out["extract_sessionize_noop"] = best(
        lambda: sess.write.mode("overwrite").format("noop").save()
    )

    def cycle():
        sp = sess.persist()
        sp.groupBy("event_type").count().collect()
        for agg in (game_totals, mod_histogram, player_ranking):
            agg(sp).write.mode("overwrite").format("noop").save()
        sp.unpersist()

    out["full_cycle"] = best(cycle)

    sp = sess.persist()
    sp.groupBy("event_type").count().collect()
    out["agg_game_totals"] = best(
        lambda: game_totals(sp).write.mode("overwrite").format("noop").save()
    )
    out["agg_mod_histogram"] = best(
        lambda: mod_histogram(sp).write.mode("overwrite").format("noop").save()
    )
    out["agg_player_ranking"] = best(
        lambda: player_ranking(sp).write.mode("overwrite").format("noop").save()
    )
    sp.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
