"""Streaming surface — batch-first by design, with an incremental adapter.

The reference is one batch pass over a complete file (src/main.rs:31-39): no
watermarks, time windows, or late data exist to replicate, and the north_rule
pins *resumable checkpointed batch*, not Structured Streaming (SURVEY.md
§2.9).  Sessionization here is data-driven (boundary markers), which needs
the whole conversation present — per-file batch is the correct unit.

Two ingest paths share the one pipeline body (plans/pipeline.run_batch):

* pull-based resumable batch — plans/pipeline.run_resumable (file-batch
  lineage + idempotent per-batch sink overwrite + atomic manifest);
* push-based incremental — streaming.run_streaming (file-source
  ``readStream`` → ``foreachBatch``), draining a landing zone with
  exactly-once file tracking via the streaming checkpoint.  Conversations
  are kept whole per micro-batch by the conv-partitioned landing layout.

A third path lifts the whole-conversation precondition: streaming.stateful
holds per-conv parser state in the state store (``applyInPandasWithState``)
so conversations MAY span micro-batches — the custom-stateful-operator
escape hatch for the incremental-latency regime.

Time-driven rollups over the routed event stream — which DO need event-time
watermarks and tumbling windows — live in streaming.windowed
(``windowed_event_rollup``, the streaming face of the batch
``events_hourly_rollup`` query).
"""

from wolf_quake_spark.streaming.adapter import run_streaming, transcripts_stream
from wolf_quake_spark.streaming.dedup import dedup_stream
from wolf_quake_spark.streaming.interval_join import purchase_click_pairs
from wolf_quake_spark.streaming.curate import curate_documents_stream
from wolf_quake_spark.streaming.lww import lww_view
from wolf_quake_spark.streaming.stateful import (
    run_streaming_stateful,
    sessionize_stream,
)
from wolf_quake_spark.streaming.windowed import windowed_event_rollup

__all__ = [
    "curate_documents_stream",
    "dedup_stream",
    "purchase_click_pairs",
    "lww_view",
    "run_streaming",
    "run_streaming_stateful",
    "sessionize_stream",
    "transcripts_stream",
    "windowed_event_rollup",
]
