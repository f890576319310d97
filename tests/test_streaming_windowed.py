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
