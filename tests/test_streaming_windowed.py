"""Watermarked windowed aggregation + custom stateful operator.

Both tests sequence micro-batches via checkpointed AvailableNow restarts
(the deterministic pattern from test_streaming.py): run 1 drains file A,
run 2 drains file B with the watermark / state restored from the
checkpoint — exactly the semantics a long-running stream would see.
"""

import os

import pyspark.sql.types as T
from pyspark.sql import functions as F

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_events(spark, rows, path):
    """One parquet FILE (not a directory) — the file-stream source lists
    plain files in the landing dir, like a crawler drop."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [dt.datetime.fromisoformat(ts) for ts, _, _ in rows],
                pa.timestamp("us"),
            ),
            "event_type": pa.array([et for _, et, _ in rows]),
            "value": pa.array([v for _, _, v in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def test_windowed_rollup_append_and_late_drop(spark, tmp_path):
    """A window emits exactly once when the watermark passes its end; an
    event arriving behind the watermark after restart is dropped, and the
    already-final window is NOT re-emitted."""
    from yckg_spark.streaming.windowed import start_windowed_rollup

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    # file A: two 10:00-hour purchases, one 11:00-hour signup, and a 13:40
    # event that advances the watermark to 13:10 -> windows 10:00 and 11:00
    # close and emit; 13:00 stays open
    _write_events(
        spark,
        [
            ("2024-01-01 10:05:00", "purchase", 10.0),
            ("2024-01-01 10:20:00", "purchase", 5.0),
            ("2024-01-01 11:10:00", "signup", 1.0),
            ("2024-01-01 13:40:00", "purchase", 2.0),
        ],
        os.path.join(landing, "a.parquet"),
    )
    q = start_windowed_rollup(spark, landing, out, ckpt, EVENT_SCHEMA)
    q.awaitTermination(120)
    got1 = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {
        ("2024-01-01 10:00:00", "purchase"): (2, 15.0),
        ("2024-01-01 11:00:00", "signup"): (1, 1.0),
    }

    # file B after restart: a 10:30 purchase arrives behind the restored
    # 13:10 watermark -> dropped (its window is final); a 15:40 event pushes
    # the watermark to 15:10 -> the 13:00 window closes with file A's row only
    _write_events(
        spark,
        [
            ("2024-01-01 10:30:00", "purchase", 99.0),  # late: must be dropped
            ("2024-01-01 15:40:00", "signup", 3.0),
        ],
        os.path.join(landing, "b.parquet"),
    )
    q = start_windowed_rollup(spark, landing, out, ckpt, EVENT_SCHEMA)
    q.awaitTermination(120)
    got2 = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == {
        ("2024-01-01 10:00:00", "purchase"): (2, 15.0),  # unchanged: no re-emit
        ("2024-01-01 11:00:00", "signup"): (1, 1.0),
        ("2024-01-01 13:00:00", "purchase"): (1, 2.0),  # late 99.0 excluded
    }


def test_windowed_batch_parity(spark, tmp_path):
    """The same function runs as a plain batch aggregation (watermark is
    applied only on streams) and matches a hand-computed result."""
    from yckg_spark.streaming.windowed import windowed_event_counts

    p = str(tmp_path / "batch.parquet")
    _write_events(
        spark,
        [
            ("2024-01-01 10:05:00", "purchase", 10.0),
            ("2024-01-01 10:59:59", "purchase", 5.5),
            ("2024-01-01 11:00:00", "purchase", 1.0),
        ],
        p,
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(spark.read.parquet(p)).collect()
    }
    assert got == {
        ("2024-01-01 10:00:00", "purchase"): (2, 15.5),
        ("2024-01-01 11:00:00", "purchase"): (1, 1.0),
    }


def test_stateful_running_totals_across_restart(spark, tmp_path):
    """applyInPandasWithState: per-key (count, sum) state survives the
    micro-batch boundary AND the query restart via the checkpoint's state
    store — batch 2's emitted row carries batch 1's totals forward."""
    from yckg_spark.streaming.stateful import start_running_totals

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    _write_events(
        spark,
        [
            ("2024-01-01 10:00:00", "purchase", 10.0),
            ("2024-01-01 10:01:00", "purchase", 5.0),
            ("2024-01-01 10:02:00", "signup", 1.0),
        ],
        os.path.join(landing, "a.parquet"),
    )
    q = start_running_totals(spark, landing, out, ckpt, EVENT_SCHEMA)
    q.awaitTermination(120)
    rows1 = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows1 == {"purchase": (2, 15.0), "signup": (1, 1.0)}

    _write_events(
        spark,
        [("2024-01-01 12:00:00", "purchase", 7.0)],
        os.path.join(landing, "b.parquet"),
    )
    q = start_running_totals(spark, landing, out, ckpt, EVENT_SCHEMA)
    q.awaitTermination(120)
    latest = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("m"))
        .select("event_type", "m.n_events", "m.sum_value")
        .collect()
    }
    # purchase accumulated across the restart; signup untouched by batch 2
    assert latest == {"purchase": (3, 22.0), "signup": (1, 1.0)}


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ingest_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_docs(spark, rows, path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _, _ in rows], pa.int64()),
            "ingest_ts": pa.array(
                [dt.datetime.fromisoformat(ts) for _, ts, _ in rows],
                pa.timestamp("us"),
            ),
            "text": pa.array([t for _, _, t in rows]),
        }
    )
    pq.write_table(tbl, path)


def test_dedup_on_ingest_across_restarts_matches_batch(spark, tmp_path):
    """First-arrival-wins content dedup across two checkpointed AvailableNow
    drains: a duplicate landing in a LATER micro-batch (within the
    watermark) is dropped via the restored state; normalization-equal
    variants collapse; the surviving key set equals the batch path's."""
    from yckg_spark.streaming.dedup_stream import (
        dedup_on_ingest,
        start_dedup_ingest,
        with_content_hash,
    )

    land = tmp_path / "land"
    land.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    batch_a = [
        (1, "2024-01-01T10:00:00", "alpha beta gamma"),
        (2, "2024-01-01T10:01:00", "alpha  BETA gamma"),  # normalizes equal to 1
        (3, "2024-01-01T10:02:00", "delta epsilon"),
    ]
    batch_b = [
        (4, "2024-01-01T10:10:00", "delta epsilon"),  # dup of 3, later batch
        (5, "2024-01-01T10:11:00", "zeta eta"),
    ]

    _write_docs(spark, batch_a, str(land / "a.parquet"))
    start_dedup_ingest(spark, str(land), out, ckpt, DOC_SCHEMA).awaitTermination()
    _write_docs(spark, batch_b, str(land / "b.parquet"))
    start_dedup_ingest(spark, str(land), out, ckpt, DOC_SCHEMA).awaitTermination()

    got = spark.read.parquet(out)
    kept_ids = {r.doc_id for r in got.collect()}
    assert kept_ids == {1, 3, 5}  # first arrival per content, cross-batch dup dropped
    assert got.count() == got.select("content_hash").distinct().count()

    # batch parity on the same union: same surviving key set
    all_docs = spark.createDataFrame(
        [(i, ts, t) for i, ts, t in batch_a + batch_b], "doc_id long, ingest_ts string, text string"
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))
    batch_kept = dedup_on_ingest(with_content_hash(all_docs))
    assert {r.content_hash for r in batch_kept.select("content_hash").collect()} == {
        r.content_hash for r in got.select("content_hash").collect()
    }
