"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-key totals across micro-batches — the streaming mirror of the
reference's checkin Counter aggregation (A2, SURVEY §2.5): each batch's
events fold into per-key state (count, sum) that survives micro-batch
boundaries AND query restarts (state lives in the streaming checkpoint),
and every batch emits the updated cumulative row for the keys it touched.

This is the shape Spark's built-in windowed aggregation can't express:
an unbounded running total with custom per-group state transition logic,
emitted incrementally. State is partitioned by key across executors —
each group's state lives with its shuffle partition, so the operator
scales horizontally like any keyed aggregation.
"""

from __future__ import annotations

import pandas as pd

OUTPUT_SCHEMA = "event_type string, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update_totals(key, pdf_iter, state):
    """Fold this batch's rows for one key into (n, s) state; emit the
    cumulative row. Arrow hands the batch as an iterator of pandas frames —
    sums are vectorized, never per-row Python."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += int(len(pdf))
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def running_event_totals(stream_events):
    """(event_type, cumulative n_events, cumulative sum_value) per batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream_events.groupBy("event_type").applyInPandasWithState(
        _update_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def start_running_totals(
    spark, source_dir: str, out_dir: str, checkpoint_dir: str, schema
):
    """File-landing stream → stateful running totals → parquet (append).

    Each micro-batch appends one row per touched key carrying the
    cumulative totals; the state store in the checkpoint carries (n, s)
    across restarts, so totals keep accumulating when the query resumes.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        running_event_totals(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
