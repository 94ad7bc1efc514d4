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
    StringType,
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


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 256,
    every: int = 2,
) -> DataFrame:
    """Frame sampling over a binary payload: split into fixed-size byte
    frames, keep every `every`-th (video keyframe-sampling plumbing; a
    real container format would use codec offsets, the Spark shape is
    identical).

    Pure JVM — octet arithmetic + explode + binary substring; map-only,
    no shuffle, emits frame hashes (not bytes) so output stays narrow.
    """
    p = F.col(payload_col)
    n = F.octet_length(p)
    nframes = F.ceil(n.cast("double") / frame_size).cast("int")
    frames = (
        # empty media has NO frames — and Spark's sequence(0, -1) would
        # otherwise DESCEND to [0, -1] and fabricate a frame for it
        df.filter(n > 0)
        .select(F.col(id_col), p, F.explode(
            F.sequence(F.lit(0), nframes - 1)
        ).alias("frame_idx"))
        .filter(F.col("frame_idx") % every == 0)
    )
    frame = F.substring(p, F.col("frame_idx") * frame_size + 1, frame_size)
    return frames.select(
        F.col(id_col),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length(frame).cast("long").alias("n_frame_bytes"),
        F.md5(frame).alias("frame_md5"),
    )


def resize_stub(payload: bytes, target_bytes: int, strict: bool = False) -> bytes:
    """STUB for the real image resize (codecs unavailable): deterministic
    fake that tiles the payload to exactly target_bytes. strict=True raises
    NotImplementedError — the contract a real resizer replaces."""
    if strict:
        raise NotImplementedError(
            "media resize requires image codecs not present in this "
            "environment; resize_stub tiles bytes deterministically"
        )
    if not payload:
        return b"\x00" * target_bytes
    reps = -(-target_bytes // len(payload))
    return (payload * reps)[:target_bytes]


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes_in", LongType()),
        StructField("n_bytes_out", LongType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    target_bytes: int = 512,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched resize over binary payloads (mapInPandas — the slot a
    real PIL/ffmpeg resize drops into unchanged). Emits sizes + hash of
    the resized payload, not the bytes."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf[payload_col].map(
                lambda p: resize_stub(bytes(p), target_bytes)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes_in": pdf[payload_col].map(len).astype("int64"),
                    "n_bytes_out": resized.map(len).astype("int64"),
                    "resized_md5": resized.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    # empty media cannot be tiled to a target size — excluded, like the
    # frame sampler (a real codec would reject a zero-byte file too)
    return (
        df.filter(F.octet_length(F.col(payload_col)) > 0)
        .select(id_col, payload_col)
        .mapInPandas(run, RESIZE_SCHEMA)
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
