"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic hash-derived feature vector stands in for real decode
output. Everything Spark-side — schemas, batch iteration, partitioning,
UDF signatures, output shapes — is real and tested; swapping in Pillow /
torchaudio later only changes the body of ``_decode_one``.
"""

from __future__ import annotations

import hashlib
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


def _decode_one(payload: bytes | None, fake: bool) -> list[float] | None:
    if payload is None:
        return None
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires Pillow/torchaudio — not in this container"
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
