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
    # deterministic fake: 8 floats derived from the content hash
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(FEATURE_DIM)]


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
