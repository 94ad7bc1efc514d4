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
    BinaryType,
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


# ---------------------------------------------------------------------------
# REAL codec: 24-bit uncompressed BMP (the one raster format simple enough
# to implement honestly without image libraries). This replaces the stub
# CONTRACT for one format: decode_resize_bmp is a genuine parse -> pixel
# array -> box-filter resize kernel running inside the same mapInPandas
# slot the stubs occupy, proving the REAL-CODEC.md seam with a format the
# sandbox can handle. BMP specifics a fake would get wrong (and the
# fixtures + oracle catch): bottom-up row order for positive heights,
# BGR channel order, 4-byte row-stride padding, pixel-data offset from
# the file header rather than an assumed 54.
# ---------------------------------------------------------------------------


def bmp_encode(img) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR, stride padded to 4 bytes)."""
    import struct

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    file_size = 14 + 40 + stride * h
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (stride - w * 3)
    rows = [
        img[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)
    ]
    return header + info + b"".join(rows)


def bmp_decode(payload: bytes):
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.

    Honors the header's pixel-data offset, positive (bottom-up) and
    negative (top-down) heights, BGR storage, and row-stride padding.
    Raises ValueError on anything that is not a 24-bit uncompressed BMP —
    the strict-mode contract line (REAL-CODEC.md)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    topdown = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if offset + stride * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, np.uint8, stride * h, offset)
    px = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if not topdown:
        px = px[::-1]
    return np.ascontiguousarray(px)


def box_resize(img, out_h: int, out_w: int):
    """Box-filter downsample by integer factors: each output pixel is the
    exact mean of its (h/out_h x w/out_w) input block. Means of uint8
    blocks are dyadic rationals well inside float64 — bit-exact, so the
    SQL oracle can replay them."""
    h, w, c = img.shape
    fy, fx = h // out_h, w // out_w
    if fy * out_h != h or fx * out_w != w:
        raise ValueError("box_resize requires integer scale factors")
    import numpy as np

    return (
        img.reshape(out_h, fy, out_w, fx, c)
        .astype(np.float64)
        .mean(axis=(1, 3))
    )


def synth_bmp_payload(
    df: DataFrame, id_col: str = "doc_id", side: int = 8
) -> DataFrame:
    """Deterministic BMP fixtures: an (side x side) RGB image per row whose
    pixel values are closed-form in the id — r=(id*31+i)%256,
    g=(id*17+2i)%251, b=(id*7+3i)%253 at raster index i=y*side+x — so a
    SQL oracle can recompute any decoded statistic without decoding.
    Encoded with the real bmp_encode (bottom-up + BGR + padding), so a
    decoder that shortcuts any of those reads the wrong pixels."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(side * side, dtype=np.int64).reshape(side, side)
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                img = np.stack(
                    [
                        (d * 31 + idx) % 256,
                        (d * 17 + 2 * idx) % 251,
                        (d * 7 + 3 * idx) % 253,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(bmp_encode(img))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(run, schema)


DECODE_REAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
        StructField("wsum_r", DoubleType()),
        StructField("wsum_g", DoubleType()),
        StructField("wsum_b", DoubleType()),
    ]
)


def decode_resize_bmp(
    df: DataFrame,
    out_side: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL decode + resize kernel in the mapInPandas slot: parse the BMP,
    box-resize to out_side x out_side, emit position-weighted per-channel
    sums sum(mean_block_b * (b+1)) — weighted so a decoder that flips row
    order, swaps channels, or mis-strides produces a different number
    (a plain global mean would hide all three). Every term is a quarter-
    integer: float64-exact, DuckDB-replayable."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_bytes": [],
                "wsum_r": [], "wsum_g": [], "wsum_b": [],
            }
            for d, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                img = bmp_decode(p)
                h, w, _ = img.shape
                small = box_resize(img, out_side, out_side)
                weights = np.arange(
                    1, out_side * out_side + 1, dtype=np.float64
                ).reshape(out_side, out_side)
                out["doc_id"].append(int(d))
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(p))
                for ci, col in enumerate(("wsum_r", "wsum_g", "wsum_b")):
                    out[col].append(float((small[:, :, ci] * weights).sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, DECODE_REAL_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL codec #2: RIFF/WAVE PCM16 mono audio (r7 verdict task #3 — the BMP
# recipe transplanted to a second modality). wav_decode is a genuine RIFF
# chunk walker: it locates fmt/data by iterating chunks (not by assuming
# byte offset 44 — fixtures embed a JUNK chunk before data on odd ids to
# catch exactly that shortcut), validates PCM16 mono, and reads the sample
# rate from the fmt chunk (fixtures vary it by id so an echoed constant
# fails). Features are windowed RMS + zero crossings: every RMS radicand
# is an exact int64 ratio, so sqrt is correctly rounded and identical on
# both engines and the DuckDB oracle replays the whole computation from
# the closed-form sample formula.
# ---------------------------------------------------------------------------


def wav_encode(samples, sample_rate: int, junk: bool = False) -> bytes:
    """Encode an int16 numpy array as RIFF/WAVE PCM16 mono. ``junk=True``
    inserts a 12-byte JUNK chunk between fmt and data — legal RIFF that
    breaks any parser assuming sample data starts at byte offset 44."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if junk:
        chunks.append(b"JUNK" + struct.pack("<I", 12) + b"\x00" * 12)
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes):
    """Decode RIFF/WAVE PCM16 mono to (sample_rate, int16 array) by
    honestly walking the chunk list (fmt may sit anywhere before data;
    unknown chunks are skipped with RIFF even-byte padding). Raises
    ValueError on anything that is not PCM16 mono — the strict-mode
    contract line (REAL-CODEC.md)."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_fields, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from(
            "<I", payload, pos + 4
        )[0]
        body = payload[pos + 8: pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            break  # fmt is required to precede data in canonical WAV
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even length
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt_fields
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
        )
    return rate, np.frombuffer(data, dtype="<i2")


def synth_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV fixtures: per doc, n = 64 + (id%3)*32 PCM16
    samples with the closed form s_i = ((id*37 + i*13) % 4001) - 2000 at
    sample rate 8000 + (id%2)*3050, JUNK chunk present on odd ids — so a
    SQL oracle recomputes every decoded statistic symbolically while the
    Spark side must genuinely parse the bytes (chunk walk + fmt read)."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n = 64 + (d % 3) * 32
                i = np.arange(n, dtype=np.int64)
                s = ((d * 37 + i * 13) % 4001) - 2000
                payloads.append(
                    wav_encode(
                        s.astype(np.int16),
                        8000 + (d % 2) * 3050,
                        junk=bool(d % 2),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(run, schema)


def synth_wav_square(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Square-wave WAV fixtures for the pitch detector: amplitude 1500,
    half-period h = 3 + (id % 5) samples (so the fundamental period
    2h ranges 6..14), n = 96 samples, rate 8000, JUNK chunk on odd ids.
    s_i = +-1500 by (i // h) % 2 — closed form a SQL oracle replays."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(96, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                h = 3 + d % 5
                s = np.where((i // h) % 2 == 0, 1500, -1500)
                payloads.append(
                    wav_encode(s.astype(np.int16), 8000, junk=bool(d % 2))
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(run, schema)


AUDIO_PITCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("best_lag", LongType()),
        StructField("r_best", LongType()),
        StructField("r0", LongType()),
    ]
)


def audio_pitch_wav(
    df: DataFrame,
    min_lag: int = 2,
    max_lag: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Pitch (fundamental period) detection on REAL decoded WAV bytes:
    integer autocorrelation R(L) = sum s_i * s_{i+L} over lags
    [min_lag, max_lag], argmax with ties to the LOWEST lag. Every R(L)
    is an exact int64 (|s| <= 32767, n bounded), so the oracle replays
    the whole computation from the fixture's closed form. Feature #2 on
    the round-8 codec seam — the kernel consumes wav_decode's output,
    not the synth formula."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_PITCH_SCHEMA.fields}
            for d, p in zip(pdf[id_col], pdf[payload_col]):
                _, s = wav_decode(bytes(p))
                s64 = s.astype(np.int64)
                n = len(s64)
                best_lag, best_r = None, None
                for lag in range(min_lag, max_lag + 1):
                    if lag >= n:
                        break
                    r = int(np.dot(s64[:-lag], s64[lag:]))
                    if best_r is None or r > best_r:
                        best_lag, best_r = lag, r
                out["doc_id"].append(int(d))
                out["n_samples"].append(n)
                out["best_lag"].append(best_lag)
                out["r_best"].append(best_r)
                out["r0"].append(int(np.dot(s64, s64)))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, AUDIO_PITCH_SCHEMA
    )


AUDIO_REAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
        StructField("peak_abs", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("rms_q1", DoubleType()),
        StructField("rms_q2", DoubleType()),
        StructField("rms_q3", DoubleType()),
        StructField("rms_q4", DoubleType()),
    ]
)


def audio_features_wav(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode + feature kernel in the mapInPandas slot: parse the
    WAV (chunk walk), emit peak amplitude, strict sign-change zero
    crossings, and quarter-window RMS. Each RMS is sqrt(sumsq/cnt) with
    an exact-int64 sumsq and cnt — one IEEE division + correctly-rounded
    sqrt, bit-identical cross-engine (determinism note: integer radicand
    discipline, same as quantized_vectors' unit norm)."""
    import math

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_REAL_SCHEMA.fields}
            for d, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                rate, s = wav_decode(p)
                s64 = s.astype(np.int64)
                n = len(s64)
                out["doc_id"].append(int(d))
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(n)
                out["n_bytes"].append(len(p))
                out["peak_abs"].append(
                    int(np.abs(s64).max()) if n else 0
                )
                out["zero_crossings"].append(
                    int(np.count_nonzero(s64[1:] * s64[:-1] < 0))
                )
                # window w = samples with (i*4)//n == w — the oracle's
                # partition rule, exact for ANY n (the n//4 slicing it
                # replaces silently dropped the last n%4 samples and
                # agreed only because the synth formula keeps n % 4 == 0)
                for w in range(4):
                    lo = -(-w * n // 4)  # ceil(w*n/4)
                    hi = -(-(w + 1) * n // 4)
                    win = s64[lo:hi]
                    sumsq = int((win * win).sum())
                    out[f"rms_q{w + 1}"].append(
                        math.sqrt(sumsq / len(win)) if len(win) else 0.0
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, AUDIO_REAL_SCHEMA
    )


HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("hist_csv", StringType()),
    ]
)


def byte_histogram_csv(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Scalar twin of extract_features for the hash gate (the r5
    ARRAY-fix pattern): the SAME byte-bucket kernel in the same Arrow
    mapInPandas slot, emitting the exact integer bucket counts as a CSV
    string instead of decode_stub's rounded fractions (counts/n_bytes
    reproduce them). Counts are exact, so a DuckDB oracle replays the
    bucketing per byte; zero-length payloads are excluded (a histogram
    over nothing is the one case decode_stub fudges with max(n, 1))."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, csv = [], [], []
            for d, p in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                counts = np.bincount(b % FEATURE_DIM, minlength=FEATURE_DIM)
                ids.append(int(d))
                nb.append(len(b))
                csv.append(",".join(str(int(c)) for c in counts))
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes": nb, "hist_csv": csv}
            )

    return (
        df.filter(F.octet_length(F.col(payload_col)) > 0)
        .select(id_col, payload_col)
        .mapInPandas(run, HIST_SCHEMA)
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


# ---------------------------------------------------------------------------
# REAL codec #3: PNG, 8-bit RGB non-interlaced (r8 verdict task #5 — the
# BMP/WAV recipe's third modality kernel, feasible here because stdlib
# zlib covers DEFLATE). png_decode is a genuine chunk walker + defilterer:
# it validates every chunk's CRC32, concatenates ALL IDAT chunks (fixtures
# split IDAT in two on odd ids to catch single-IDAT shortcuts), skips
# ancillary chunks (fixtures insert tEXt on ids % 3 == 0), inflates, and
# reverses the per-row filter — fixtures cycle through ALL FIVE filter
# types (None/Sub/Up/Average/Paeth) keyed on (id + y) % 5, so a decoder
# that ignores filtering or botches any one predictor reconstructs wrong
# pixels and the closed-form oracle hash-mismatches. Interlacing, palettes
# and non-8-bit depths are rejected honestly (ValueError), the strict-mode
# contract line (REAL-CODEC.md).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Paeth predictor (PNG spec §6.6) — numpy-vectorized over a row."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_filter_row(cur, prev, ftype: int):
    """Apply filter `ftype` to raw scanline `cur` (int64 ndarray) given
    the RAW previous scanline `prev` — encoding side (filters read
    original bytes; decoding reverses against reconstructed ones)."""
    import numpy as np

    bpp = 3
    a = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
    if ftype == 0:
        return cur & 0xFF
    if ftype == 1:
        return (cur - a) & 0xFF
    if ftype == 2:
        return (cur - prev) & 0xFF
    if ftype == 3:
        return (cur - (a + prev) // 2) & 0xFF
    if ftype == 4:
        c = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        return (cur - _paeth(a, prev, c)) & 0xFF
    raise ValueError(f"unknown PNG filter type {ftype}")


def png_encode(img, row_filter=None, idat_split: int = 1,
               text_chunk: bytes | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG.

    ``row_filter(y)`` picks the per-scanline filter type (default 0);
    ``idat_split`` > 1 splits the compressed stream across that many IDAT
    chunks; ``text_chunk`` inserts an ancillary tEXt chunk before IDAT —
    both decoder traps the fixtures arm."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = img.shape
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int64)
    prev = np.zeros(stride, np.int64)
    lines = []
    for y in range(h):
        f = row_filter(y) if row_filter else 0
        enc = _png_filter_row(flat[y], prev, f)
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = flat[y]
    comp = zlib.compress(b"".join(lines))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    parts = [_PNG_SIG, _png_chunk(b"IHDR", ihdr)]
    if text_chunk is not None:
        parts.append(_png_chunk(b"tEXt", text_chunk))
    n = max(1, int(idat_split))
    step = -(-len(comp) // n)
    for j in range(0, len(comp), step):
        parts.append(_png_chunk(b"IDAT", comp[j:j + step]))
    parts.append(_png_chunk(b"IEND", b""))
    return b"".join(parts)


def png_decode(payload: bytes):
    """Decode an 8-bit truecolor non-interlaced PNG to ((h, w, 3) uint8
    RGB array, n_chunks).

    Walks chunks with CRC32 validation, concatenates all IDATs, inflates,
    and reverses the per-row filter (None/Sub/Up/Average/Paeth) against
    RECONSTRUCTED neighbor bytes. Raises ValueError on anything that is
    not an 8-bit RGB (color type 2) non-interlaced PNG, on CRC damage,
    and on truncation — the strict-mode contract (REAL-CODEC.md)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, n_chunks, iend = 8, None, [], 0, False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk data")
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in PNG chunk {typ!r}")
        n_chunks += 1
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            iend = True
            break
    if ihdr is None or not iend or not idat:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={ctype}, "
            f"interlace={interlace}) — only 8-bit RGB non-interlaced"
        )
    bpp, stride = 3, w * 3
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up: depends only on prev row — vectorized
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # left-neighbor recurrence: per-pixel
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (cur[x] + (a + prev[x]) // 2) & 0xFF
                else:
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, 3), n_chunks


def synth_png_payload(
    df: DataFrame, id_col: str = "doc_id", side: int = 8
) -> DataFrame:
    """Deterministic PNG fixtures: (side x side) RGB, pixels closed-form
    in the id — r=(id*13+5i)%256, g=(id*29+3i)%254, b=(id*11+7i)%249 at
    raster index i=y*side+x (a DIFFERENT formula family from the BMP
    fixtures, so a kernel echoing those fails). Encoded with the real
    png_encode, filter type (id + y) % 5 per row (all five filters in
    every image set), IDAT split in two on odd ids, tEXt inserted on
    ids % 3 == 0 — each a decoder shortcut the oracle then catches."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(side * side, dtype=np.int64).reshape(side, side)
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                img = np.stack(
                    [
                        (d * 13 + 5 * idx) % 256,
                        (d * 29 + 3 * idx) % 254,
                        (d * 11 + 7 * idx) % 249,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(
                    png_encode(
                        img,
                        row_filter=lambda y, d=d: (d + y) % 5,
                        idat_split=1 + d % 2,
                        text_chunk=(
                            b"Source\x00synthetic" if d % 3 == 0 else None
                        ),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(run, schema)


PNG_REAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_chunks", LongType()),
        StructField("wsum_r", DoubleType()),
        StructField("wsum_g", DoubleType()),
        StructField("wsum_b", DoubleType()),
    ]
)


def decode_resize_png(
    df: DataFrame,
    out_side: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL PNG decode + resize in the mapInPandas slot: parse + defilter,
    box-resize to out_side x out_side, emit position-weighted per-channel
    sums (the BMP kernel's statistic — weighted so row-order, channel, or
    filter-reconstruction errors change the number) plus the chunk count
    (closed-form in the id: 3 + id%2 + [id%3==0], so a decoder that does
    not actually walk chunks cannot echo it). Quarter-integer arithmetic,
    float64-exact, DuckDB-replayable."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_chunks": [],
                "wsum_r": [], "wsum_g": [], "wsum_b": [],
            }
            for d, p in zip(pdf[id_col], pdf[payload_col]):
                img, n_chunks = png_decode(bytes(p))
                h, w, _ = img.shape
                small = box_resize(img, out_side, out_side)
                weights = np.arange(
                    1, out_side * out_side + 1, dtype=np.float64
                ).reshape(out_side, out_side)
                out["doc_id"].append(int(d))
                out["width"].append(w)
                out["height"].append(h)
                out["n_chunks"].append(n_chunks)
                for ci, col in enumerate(("wsum_r", "wsum_g", "wsum_b")):
                    out[col].append(float((small[:, :, ci] * weights).sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, PNG_REAL_SCHEMA
    )
