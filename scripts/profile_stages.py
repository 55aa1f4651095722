"""Per-stage wall-clock profile of the pipeline at one parallelism level.

Usage: python scripts/profile_stages.py <cores> <input_path> [extractor]
Prints one JSON line with per-stage seconds; used to find the non-scaling
stage when scaling efficiency regresses.
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

    from wolf_quake_spark.operators import assign_games
    from wolf_quake_spark.operators.aggregates import (
        game_totals,
        mod_histogram,
        player_ranking,
    )
    from wolf_quake_spark.operators.extract import extract_events, extract_events_sql
    from wolf_quake_spark.session import build_session

    ex = extract_events if extractor == "udf" else extract_events_sql

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

    def t(fn):
        t0 = time.monotonic()
        fn()
        return round(time.monotonic() - t0, 2)

    out = {"cores": cores, "extractor": extractor}

    # warm-up
    assign_games(ex(tr.limit(20000))).write.mode("overwrite").format("noop").save()

    out["read_count"] = t(lambda: tr.count())
    ev = ex(tr)
    out["extract_noop"] = t(lambda: ev.write.mode("overwrite").format("noop").save())
    sess = assign_games(ev)
    out["extract_sessionize_noop"] = t(
        lambda: sess.write.mode("overwrite").format("noop").save()
    )
    sp = sess.persist()
    out["materialize_persist"] = t(lambda: sp.groupBy("event_type").count().collect())
    out["agg_game_totals"] = t(
        lambda: game_totals(sp).write.mode("overwrite").format("noop").save()
    )
    out["agg_mod_histogram"] = t(
        lambda: mod_histogram(sp).write.mode("overwrite").format("noop").save()
    )
    out["agg_player_ranking"] = t(
        lambda: player_ranking(sp).write.mode("overwrite").format("noop").save()
    )
    sp.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
