"""Multimodal (image/audio/video) column handling (north-star extension).

Design: media payloads are opaque ``binary`` columns plus a typed metadata
struct. All Spark-side plumbing — schema, Arrow batch shape, partitioning,
mapInPandas signatures — is real and tested; the actual codec step is
STUBBED (no image/audio libraries in this environment) behind
``decode_stub``: a deterministic fake that derives "features" from raw
bytes, or ``NotImplementedError`` in strict mode.

At 100 TB: payloads dominate row size, so feature extraction uses
mapInPandas (Arrow batches, one Python worker per input partition, no
shuffle); downstream analytics select only the small feature/metadata
columns so parquet column pruning never rereads the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

FEATURE_DIM = 8


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary media column + metadata struct from text bytes
    (the test corpus has no real media; plumbing is identical)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.md5(F.col(text_col)).alias("checksum"),
        ),
    )


def decode_stub(payload: bytes, strict: bool = False) -> list[float]:
    """STUB for the real image/audio decode (libraries unavailable here).

    strict=True raises NotImplementedError — the contract a real codec
    implementation replaces. Otherwise returns deterministic fake features:
    byte-histogram moments over FEATURE_DIM buckets.
    """
    if strict:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "environment; decode_stub provides deterministic fake features"
        )
    buckets = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        buckets[b % FEATURE_DIM] += 1
    n = max(len(payload), 1)
    return [round(c / n, 9) for c in buckets]


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: per-partition iterator of pandas batches — the pattern a
    real decoder (PIL/ffmpeg) would drop into unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "features": pdf[payload_col].map(
                        lambda p: decode_stub(bytes(p))
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)
