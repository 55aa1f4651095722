"""Streaming disposition — deliberately batch-first.

The reference is one batch pass over a complete file (src/main.rs:31-39): no
watermarks, time windows, or late data exist to replicate, and the north_rule
pins *resumable checkpointed batch*, not Structured Streaming (SURVEY.md
§2.9).  Sessionization here is data-driven (boundary markers), which needs
the whole conversation present — per-file batch is the correct unit.

The incremental path is plans/pipeline.run_resumable: file-batch lineage +
idempotent per-batch sink overwrite + atomic manifest.  If a push-based
source appears, the same run_batch() body drops into
``readStream.foreachBatch`` unchanged, with conversations kept whole per
micro-batch — that adapter is the only missing piece, by design.
"""
