"""Streaming exact dedup on ingest: first-arrival-wins content dedup over
a document landing stream.

The batch path dedups a corpus after the fact (``operators/dedup.py``);
this is the ingest-time complement for a continuously-landing crawl — a
document whose content hash was already seen (within the watermark
horizon) never reaches the store, so downstream batches start from an
already-thinned corpus. ``dropDuplicatesWithinWatermark`` is the exact
Structured Streaming operator for this: state holds one entry per key
seen inside the watermark window and is EVICTED once the watermark passes
(unlike plain streaming ``dropDuplicates``, whose state grows without
bound — unusable on an unbounded crawl).

Semantics at scale: within the watermark horizon the dedup is exact and
first-arrival-wins; a duplicate arriving later than the horizon can be
re-admitted — that long tail belongs to the periodic batch dedup /
compaction job, exactly as the per-bucket build dedup composes with the
global ``compact`` pass. State size is bounded by (distinct keys per
horizon), keyed on the 32-byte hash — never the text.

The same helper applied to a batch frame degrades to ``dropDuplicates``
(watermarks are streaming-only), so the streaming path and the batch
oracle share one code path and cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yckg_spark.operators.dedup import normalize_text


def with_content_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """sha2-256 of the normalized text — the dedup key (same key the batch
    ``exact_dedup`` groups on, so ingest-time and batch dedup agree)."""
    return docs.withColumn("content_hash", F.sha2(normalize_text(F.col(text_col)), 256))


def dedup_on_ingest(
    docs: DataFrame,
    *,
    watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
    key_cols: tuple[str, ...] = ("content_hash",),
) -> DataFrame:
    """First-arrival-wins dedup. Streaming input: exact within the
    watermark horizon, state evicted behind it. Batch input: plain
    ``dropDuplicates`` on the same keys (one code path, two modes)."""
    keys = list(key_cols)
    if docs.isStreaming:
        return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return docs.dropDuplicates(keys)


def start_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    *,
    watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    available_now: bool = True,
):
    """Landing-dir parquet files → hash → watermarked dedup → append sink.

    Append mode: a surviving document is emitted exactly once (the dedup
    state decides on arrival; nothing is retracted), so the parquet sink
    plus the streaming checkpoint give exactly-once per input file — the
    same contract as the incremental KG build. Returns the StreamingQuery.
    """
    docs = spark.readStream.schema(schema).parquet(source_dir)
    kept = dedup_on_ingest(
        with_content_hash(docs, text_col), watermark=watermark, ts_col=ts_col
    )
    writer = (
        kept.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
