"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

Decode coverage: the two uncompressed container formats that need no
codec library are decoded FOR REAL — 24-bit BMP rasters (``decode_bmp``)
and 16-bit PCM RIFF/WAV audio (``decode_wav``), both dependency-free
struct parses with integer-exact statistics. Compressed formats
(JPEG/PNG/MP3/video) remain STUBBED — no codec libs in this container:
with ``fake=True`` a deterministic hash-derived feature vector stands in,
with ``fake=False`` undecodable payloads raise NotImplementedError.
Everything Spark-side — schemas, batch iteration, partitioning, UDF
signatures, output shapes — is real and tested; swapping in Pillow /
torchaudio later only widens ``_decode_one``'s format dispatch.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),  # opaque bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 8


def is_bmp(payload: bytes | None) -> bool:
    """True if the payload is an uncompressed 24-bit bottom-up-or-top-down
    BMP we can decode without any codec library."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return False
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    return bpp == 24 and compression == 0


def decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL decode of an uncompressed 24-bit BMP — pure-Python struct
    parse, no codec libs (BMP is the one raster format that needs none).

    Returns (width, height, FEATURE_DIM channel statistics): mean B/G/R,
    mean/min/max luma (BT.601 weights), all /255, plus width and height
    /65536 — deterministic exact arithmetic, recomputable by any oracle
    from the same bytes. Handles 4-byte row padding and negative
    (top-down) heights; row order doesn't affect the statistics.
    """
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    height = abs(height_raw)
    if width <= 0 or height == 0:
        raise ValueError("BMP with non-positive dimensions")
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # rows padded to 4-byte boundaries
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes < {need}")
    sum_b = sum_g = sum_r = 0
    min_luma = float("inf")
    max_luma = float("-inf")
    for r in range(height):
        row = payload[data_offset + r * stride : data_offset + r * stride + row_bytes]
        for c in range(0, row_bytes, 3):
            b, g, rr = row[c], row[c + 1], row[c + 2]
            sum_b += b
            sum_g += g
            sum_r += rr
            luma = 0.299 * rr + 0.587 * g + 0.114 * b
            min_luma = min(min_luma, luma)
            max_luma = max(max_luma, luma)
    n = width * height
    mean_luma = (0.299 * sum_r + 0.587 * sum_g + 0.114 * sum_b) / n
    return (
        width,
        height,
        [
            sum_b / n / 255.0,
            sum_g / n / 255.0,
            sum_r / n / 255.0,
            mean_luma / 255.0,
            min_luma / 255.0,
            max_luma / 255.0,
            width / 65536.0,
            height / 65536.0,
        ],
    )


def _wav_fmt_data(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """Walk the RIFF chunk list; return (n_channels, sample_rate,
    bits_per_sample, data_bytes) for a PCM WAVE, else None. Chunks are
    2-byte aligned per the RIFF spec (odd sizes carry a pad byte)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or fmt[0] != 1:  # 1 = uncompressed PCM
        return None
    return fmt[1], fmt[2], fmt[5], data


def is_wav(payload: bytes | None) -> bool:
    """True if the payload is an uncompressed 16-bit PCM RIFF/WAV we can
    decode without any codec library."""
    if payload is None:
        return False
    parsed = _wav_fmt_data(payload)
    return parsed is not None and parsed[2] == 16 and parsed[0] > 0


def decode_wav(payload: bytes) -> tuple[int, int, int, list[float]]:
    """REAL decode of 16-bit PCM RIFF/WAV — pure-Python struct parse, no
    codec libs (the one audio container that needs none).

    Returns (n_channels, sample_rate, n_frames, FEATURE_DIM signal
    statistics): mean, RMS, min, max of all samples (each /32768), the
    zero-crossing rate of channel 0, then n_frames/2^24, n_channels/16,
    sample_rate/2^17. All sums/extrema/crossings accumulate in exact
    integer arithmetic before one final float division, so the features
    are bit-reproducible and recomputable by any oracle from the bytes.
    """
    parsed = _wav_fmt_data(payload)
    if parsed is None or parsed[2] != 16:
        raise ValueError("not an uncompressed 16-bit PCM WAV")
    n_ch, rate, _bits, data = parsed
    if n_ch <= 0 or rate <= 0:
        raise ValueError("WAV with non-positive channels or sample rate")
    frame_bytes = 2 * n_ch
    n_frames = len(data) // frame_bytes
    if n_frames == 0:
        raise ValueError("WAV with no complete sample frames")
    n = n_frames * n_ch
    samples = struct.unpack_from(f"<{n}h", data, 0)
    total = sum(samples)
    sq_total = sum(s * s for s in samples)
    ch0 = samples[::n_ch]
    crossings = sum(
        1 for a, b in zip(ch0, ch0[1:]) if (a >= 0) != (b >= 0)
    )
    return (
        n_ch,
        rate,
        n_frames,
        [
            total / n / 32768.0,
            (sq_total / n) ** 0.5 / 32768.0,
            min(samples) / 32768.0,
            max(samples) / 32768.0,
            crossings / max(1, len(ch0) - 1),
            n_frames / 16777216.0,
            n_ch / 16.0,
            rate / 131072.0,
        ],
    )


def _decode_one(payload: bytes | None, fake: bool) -> list[float] | None:
    if payload is None:
        return None
    if not fake:
        if is_bmp(payload):
            return decode_bmp(payload)[2]
        if is_wav(payload):
            return decode_wav(payload)[3]
        raise NotImplementedError(
            "real decode beyond uncompressed BMP/PCM-WAV requires "
            "Pillow/torchaudio — not in this container"
        )
    # deterministic fake: 8 floats derived from the content hash. 16-bit
    # slices / 2^16 are exactly representable in float32 AND exactly
    # recomputable as doubles in a SQL oracle (hex-substr cast), so the
    # values survive the float32 column type without precision drift.
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 2 : i * 2 + 2], "big") / 65536.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Binary → fixed-dim feature vectors via mapInPandas (Arrow batches).

    The 100 TB shape: repartition by media_id so decode work spreads evenly,
    keep batches bounded by arrow.maxRecordsPerBatch, never collect payloads
    to the driver.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": pdf["payload"].map(lambda b: _decode_one(b, fake)),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def _resize_dims(w: int | None, h: int | None, max_side: int) -> tuple[int, int] | None:
    if not w or not h:
        return None
    if max(w, h) <= max_side:
        return w, h
    scale = max_side / max(w, h)
    return max(1, round(w * scale)), max(1, round(h * scale))


def resize_images(media: DataFrame, max_side: int = 256, fake: bool = True) -> DataFrame:
    """Image resize plumbing over Arrow batches: aspect-preserving target
    dimensions are computed for real (pure arithmetic); the pixel resample
    itself is the stubbed step — ``fake=True`` emits a deterministic
    content-hash placeholder payload sized to the target, ``fake=False``
    raises until Pillow is swapped in. Rows without dimensions pass through
    with null payload (the errors-side convention)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                dims = _resize_dims(
                    None if pd.isna(w) else int(w), None if pd.isna(h) else int(h), max_side
                )
                out["media_id"].append(mid)
                if dims is None or payload is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["payload"].append(None)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real image resample requires Pillow — not in this container"
                    )
                nw, nh = dims
                seed = hashlib.sha256(payload).digest()
                fake_px = (seed * ((nw * nh * 3) // len(seed) + 1))[: nw * nh * 3]
                out["width"].append(nw)
                out["height"].append(nh)
                out["payload"].append(fake_px)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "width", "height", "payload")
        .mapInPandas(batches, RESIZED_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plumbing*: one output row per sampled timestamp
    (the frame decode itself is the stubbed step). Pure expressions."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation over the opaque payloads."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
