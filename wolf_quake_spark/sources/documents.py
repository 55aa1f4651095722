"""Documents-table source adapter: Parquet, JSONL, or CSV with a fixed
schema and corrupt-record routing.

Raw corpora arrive as JSONL or CSV long before they are parquet; ingesting
them at scale needs (a) an explicit schema — never runtime inference, which
costs an extra full pass and can flip types between runs — and (b) a
PERMISSIVE corrupt-record channel so one mangled line quarantines itself
instead of failing a 100 TB job (the same lenient-vs-strict philosophy as
the event extractor's reject routing, reference ``errors.rs:5-19``).

``read_documents`` returns only valid rows; ``read_documents_with_rejects``
also returns the quarantined raw lines so the pipeline can sink them for
audit, mirroring the reject sinks of the main pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)])


def read_documents_with_rejects(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects): valid rows in DOCUMENTS_SCHEMA column order; rejects
    as one raw string column ``raw`` for quarantine sinks."""
    cols = [f.name for f in DOCUMENTS_SCHEMA.fields]
    if fmt == "parquet":
        df = spark.read.parquet(path)
        return df.select(*cols), spark.createDataFrame([], "raw string")
    if fmt == "jsonl":
        df = spark.read.schema(_with_corrupt(DOCUMENTS_SCHEMA)).option(
            "mode", "PERMISSIVE"
        ).option("columnNameOfCorruptRecord", _CORRUPT).json(path)
    elif fmt == "csv":
        df = (
            spark.read.schema(_with_corrupt(DOCUMENTS_SCHEMA))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .option("header", "true")
            .csv(path)
        )
    else:
        raise ValueError(f"unknown documents format: {fmt!r}")
    # Spark requires the corrupt column to be materialized (cached or
    # re-selected from a checkpointed frame) before it can be filtered on.
    # The cached handle is exposed on BOTH outputs as ``_wqs_persisted``
    # (repo-wide convention — see dedup.verified_pairs): callers unpersist
    # once the valid/reject splits are materialized, otherwise repeated
    # ingest calls accumulate cached relations for the session lifetime.
    df = df.cache()
    valid = df.filter(F.col(_CORRUPT).isNull()).select(*cols)
    rejects = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )
    valid._wqs_persisted = df
    rejects._wqs_persisted = df
    return valid, rejects


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    valid, _ = read_documents_with_rejects(spark, path, fmt)
    return valid


def release(*dfs: DataFrame) -> None:
    """Unpersist the ``_wqs_persisted`` handle(s) behind ingest outputs
    (idempotent; both splits share one cached frame)."""
    seen = set()
    for df in dfs:
        h = getattr(df, "_wqs_persisted", None)
        if h is not None and id(h) not in seen:
            seen.add(id(h))
            h.unpersist()
