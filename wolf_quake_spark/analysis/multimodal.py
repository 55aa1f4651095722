"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extraction run as Arrow-batched pandas UDFs
over ``mapInPandas``.  The decode kernels themselves are STUBBED (no
image/audio libraries in this environment — they raise ``NotImplementedError``
unless the deterministic fake is requested); the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("payload_sha", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def to_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap docs as binary media rows (utf-8 payload stands in for bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


def _decode_stub(payload: bytes, fake: bool) -> tuple[int, int, int, list[float]]:
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    # deterministic fake: dimensions/features derived from payload bytes
    n = len(payload)
    w = 16 + n % 64
    h = 16 + (n // 64) % 64
    feat = [float((payload[i % max(n, 1)] if n else 0) % 17) for i in range(8)]
    return w, h, 1, feat


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode/feature stage (mapInPandas; batch-shape real,
    kernel stubbed — see module docstring)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_stub(p or b"", fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_frames": [r[2] for r in rows],
                    "feature": [r[3] for r in rows],
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)
