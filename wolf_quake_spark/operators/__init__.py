from wolf_quake_spark.operators.aggregates import (  # noqa: F401
    game_summaries,
    game_totals,
    mod_histogram,
    player_names,
    player_ranking,
    player_scores,
    roster,
)
from wolf_quake_spark.operators.enrich import enrich_mod, enrich_tool  # noqa: F401
from wolf_quake_spark.operators.extract import (  # noqa: F401
    extract_events,
    extract_events_sql,
)
from wolf_quake_spark.operators.sessionize import (  # noqa: F401
    assign_games,
    assign_games_salted,
    games_frame,
)
from wolf_quake_spark.operators.validate import orphan_references  # noqa: F401
