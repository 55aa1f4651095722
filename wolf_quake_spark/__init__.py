"""wolf_quake_spark — a from-scratch, PySpark-native log/telemetry pipeline.

Generalizes the query semantics of the reference CLI (nicolasauler/wolf_quake,
a Rust Quake 3 log parser — see /root/reference) to a distributed
parse → enrich → route → aggregate pipeline over tables of multi-turn agent
transcripts:

* transcripts(conv_id, turn_idx, role, text, tool, ts) — each ``text`` carries
  zero or more embedded Quake-style event lines.
* A vectorized Arrow/pandas-UDF grok stage extracts typed event records
  (reference parse loop: src/quake3_parser/parser.rs:159-217).
* A broadcast lookup enriches means-of-death codes to display labels
  (reference enum: src/quake3_data.rs:69-139).
* A single-window-pass sessionization reconstructs "games" including the
  reference's conditional InitGame flush semantics (parser.rs:180-197).
* groupBy/window aggregates reproduce per-game kill totals, means-of-death
  histograms, and signed player rankings (parser.rs:122-151).
* Fan-out sinks per event type, resumable batch with per-partition lineage.

Everything is the DataFrame API — no RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"

from wolf_quake_spark.data_model import MOD_LOOKUP_ROWS, WORLD_ID  # noqa: F401
