"""Event-time windowed aggregation with watermark-based late-data handling.

The reference is strictly batch; this is the engine's streaming-analytics
surface for event tables (SURVEY §2.12 extension): tumbling event-time
windows over an event stream, with a watermark bounding how late an event
may arrive before it is dropped and its window finalized. In append mode a
window emits exactly once — when the watermark passes its end — so a
downstream parquet sink receives each (window, key) row once, never a
retraction.

The same plan runs in batch (watermark is streaming-only, so it is applied
only when the input is a stream): one code path, two execution modes, which
is what keeps the streaming rollup and the batch oracle from drifting.

Scale: the windowed aggregation is a hash aggregation keyed on
(window, event_type) — partial aggregation map-side, one shuffle on the
composite key; state size is bounded by (windows within watermark) × keys,
and the watermark lets Spark evict every window older than it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count + value sum per key.

    Output: (window_start string, event_type, n_events, sum_value) — the
    window bound is formatted to a string so batch results compare exactly
    across engines (the driver's DuckDB oracle uses ``time_bucket``).
    """
    e = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window(ts_col, window_duration), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def start_windowed_rollup(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    *,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
):
    """File-landing stream → watermarked windowed rollup → parquet (append).

    Append mode + watermark: each window row lands in the sink exactly once,
    after the watermark passes the window end; events arriving later than
    the watermark are dropped (the test pins this semantics across a
    checkpointed restart).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(
        stream, window_duration=window_duration, watermark=watermark
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
