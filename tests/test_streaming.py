"""Incremental ingestion: AvailableNow streaming over a landing directory,
exactly-once per file across restarts (streaming checkpoint)."""

import os
import shutil

import pyarrow.parquet as pq

from yckg_spark.streaming.incremental import start_incremental_build


def _copy_pages(src_parquet: str, landing: str, name: str) -> None:
    os.makedirs(landing, exist_ok=True)
    shutil.copy(src_parquet, os.path.join(landing, name))


def test_available_now_drains_and_is_exactly_once(spark, smoke_fixture_dir, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = f"{smoke_fixture_dir}/web_pages.parquet"
    _copy_pages(src, landing, "batch-0.parquet")

    q = start_incremental_build(spark, landing, out, ckpt, use_extraction=False)
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{out}/triples").count()
    assert n1 > 0

    # restart with NO new files: checkpoint must prevent reprocessing
    q = start_incremental_build(spark, landing, out, ckpt, use_extraction=False)
    q.awaitTermination(120)
    assert spark.read.parquet(f"{out}/triples").count() == n1

    # a new file arrives -> only its rows are added
    _copy_pages(src, landing, "batch-1.parquet")
    q = start_incremental_build(spark, landing, out, ckpt, use_extraction=False)
    q.awaitTermination(120)
    n3 = spark.read.parquet(f"{out}/triples").count()
    assert n3 == 2 * n1

    # the streamed triples match the batch pipeline on the same input
    from yckg_spark.operators.canonicalize import dedup_triples
    from yckg_spark.operators.emit import emit_all
    from yckg_spark.sources.web_pages import parse_records, read_web_pages

    pages = read_web_pages(spark, src)
    t, _ = emit_all(parse_records(pages, use_extraction=False, cache=False))
    batch_set = {
        tuple(r)
        for r in dedup_triples(t).select("subject", "predicate", "object").collect()
    }
    stream_set = {
        tuple(r)
        for r in dedup_triples(spark.read.parquet(f"{out}/triples"))
        .select("subject", "predicate", "object")
        .collect()
    }
    assert stream_set == batch_set

    # compaction: batch dirs -> one globally-deduped canonical store
    # (bucket x predicate layout), same triple set, no cross-batch dupes
    from yckg_spark.materialize import compact_store, read_triples

    cdir = str(tmp_path / "compacted")
    result = compact_store(spark, out, cdir, n_buckets=4)
    assert result["n_triples"] == n1  # one batch's worth: cross-batch dupes gone
    compacted = read_triples(spark, cdir)
    assert {"bucket", "predicate"} <= set(compacted.columns)
    got = {
        tuple(r) for r in compacted.select("subject", "predicate", "object").collect()
    }
    assert got == batch_set
