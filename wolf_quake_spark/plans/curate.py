"""Composed corpus-curation pipeline: quality filter → near-dup dedup →
benchmark decontamination → stratified sampling, with per-stage funnel
accounting — the end-to-end job a training-data team actually runs.

Composition model: every signal is computed in an independent pass over the
immutable corpus (quality verdicts, canonical-per-component flags,
contamination hits, deterministic sample buckets), then ONE combined
predicate applies them in a fixed cut order.  That is deliberately not a
sequential re-materialization per stage: at 100 TB the signal passes share
the same scan (or run as parallel jobs over it), nothing is rewritten
between stages, and the cut order is pure accounting — the funnel counts
below tell you what each stage *would have* removed cumulatively.

Cut order (the conventional one — cheap/narrow rules first in reporting):
``quality → dedup-canonical → decontaminated → sampled``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.contamination import contamination_report
from wolf_quake_spark.analysis.dedup import dedup_components
from wolf_quake_spark.analysis.filters import filter_chain
from wolf_quake_spark.analysis.sampling import hash_bucket

# same rates/salt as the stratified_sample_manifest query
SAMPLE_RATES = {"en": 250, "zh": 1000}
SAMPLE_DEFAULT = 500
SAMPLE_SALT = 12345


def _sample_flag() -> F.Column:
    thresh = None
    for k in sorted(SAMPLE_RATES):
        cond = F.col("lang") == k
        thresh = (
            F.when(cond, SAMPLE_RATES[k])
            if thresh is None
            else thresh.when(cond, SAMPLE_RATES[k])
        )
    thresh = thresh.otherwise(F.lit(SAMPLE_DEFAULT))
    return F.when(hash_bucket(F.col("doc_id"), SAMPLE_SALT) < thresh, 1).otherwise(0)


def curation_signals(
    docs: DataFrame, threshold: float = 0.5, lsh_observation=None
) -> DataFrame:
    """One row per doc with the four independent curation signals:
    ``q`` (quality-filter keep), ``canon`` (dedup survivor), ``clean``
    (no benchmark contamination), ``samp`` (stratified-sample keep).

    ``lsh_observation`` threads a ``pyspark.sql.Observation`` down to the
    dedup stage's LSH bucket aggregate so bucket-cap effects are visible in
    the run manifest (see analysis/dedup.candidate_pairs)."""
    fc = filter_chain(docs).select("doc_id", F.col("keep").alias("q"))
    comp = dedup_components(
        docs, threshold=threshold, observation=lsh_observation
    ).select(
        "doc_id",
        F.when(F.col("is_canonical"), 1).otherwise(0).cast("long").alias("canon"),
    )
    cont = contamination_report(docs).select("doc_id", F.lit(1).alias("_dirty"))
    return (
        docs.select("doc_id", "lang")
        .join(fc, "doc_id")
        .join(comp, "doc_id")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "q",
            "canon",
            F.when(F.col("_dirty").isNull(), 1).otherwise(0).cast("long").alias("clean"),
            _sample_flag().cast("long").alias("samp"),
        )
    )


def curation_funnel(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Per-language cumulative funnel: input → quality → dedup →
    decontaminated → final sampled corpus."""
    s = curation_signals(docs, threshold=threshold)
    q, canon, clean, samp = (F.col(c) for c in ("q", "canon", "clean", "samp"))
    return s.groupBy("lang").agg(
        F.count("*").alias("n_input"),
        F.sum(q).alias("n_quality"),
        F.sum(q * canon).alias("n_dedup"),
        F.sum(q * canon * clean).alias("n_decontam"),
        F.sum(q * canon * clean * samp).alias("n_final"),
    )


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    threshold: float = 0.5,
) -> dict:
    """Materialize the curated corpus and its audit artifacts.

    Writes ``signals/`` (per-doc signal table — the audit trail),
    ``survivors/`` (the curated corpus: all four cuts applied), and
    ``funnel.json`` (per-language stage counts, computed from the SAME
    signals frame via ``observe``-free aggregation of the written table, so
    the manifest can never disagree with the data).  Returns the manifest.
    """
    from pyspark.sql import Observation

    lsh_obs = Observation("lsh_buckets")
    signals = curation_signals(docs, threshold=threshold, lsh_observation=lsh_obs)
    signals.write.mode("overwrite").parquet(os.path.join(out_dir, "signals"))
    sig = spark.read.parquet(os.path.join(out_dir, "signals"))
    survivors = (
        docs.join(
            sig.filter((F.col("q") == 1) & (F.col("canon") == 1)
                       & (F.col("clean") == 1) & (F.col("samp") == 1))
            .select("doc_id"),
            "doc_id",
        )
    )
    # lang-partitioned layout: downstream per-language jobs (tokenizer
    # training, per-lang sampling) read with partition pruning instead of
    # scanning the whole corpus; maxRecordsPerFile bounds file sizes so the
    # layout stays balanced as the corpus grows
    (
        survivors.write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)
        .partitionBy("lang")
        .parquet(os.path.join(out_dir, "survivors"))
    )
    funnel_rows = (
        sig.groupBy("lang")
        .agg(
            F.count("*").alias("n_input"),
            F.sum("q").alias("n_quality"),
            F.sum(F.col("q") * F.col("canon")).alias("n_dedup"),
            F.sum(F.col("q") * F.col("canon") * F.col("clean")).alias("n_decontam"),
            F.sum(
                F.col("q") * F.col("canon") * F.col("clean") * F.col("samp")
            ).alias("n_final"),
        )
        .collect()
    )
    manifest = {
        "stages": ["input", "quality", "dedup", "decontam", "sampled"],
        # cap observability next to the stage counts: what the LSH bucket
        # cap silently excluded from pair generation this run (0 dropped
        # when uncapped — still recorded so coverage claims are auditable).
        # `or 0`: on an empty/no-shingle corpus the observed F.sum metrics
        # come back NULL, and int(None) would crash the funnel AFTER the
        # signals/survivors were already written
        "lsh_bucket_metrics": {k: int(v or 0) for k, v in lsh_obs.get.items()},
        "per_lang": {
            r["lang"]: [
                r["n_input"], r["n_quality"], r["n_dedup"],
                r["n_decontam"], r["n_final"],
            ]
            for r in funnel_rows
        },
    }
    with open(os.path.join(out_dir, "funnel.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
