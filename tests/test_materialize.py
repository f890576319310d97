"""Materialization: checkpoint-resume with lineage manifest, NT export."""

import gzip
import os

import pytest

from yckg_spark.materialize import (
    completed_buckets,
    export_nt_gz,
    nt_line,
    read_manifest,
    read_triples,
    run_resumable,
)
from yckg_spark.operators.canonicalize import dedup_triples
from yckg_spark.operators.emit import emit_all
from yckg_spark.sources.web_pages import parse_records, read_web_pages


@pytest.fixture()
def pages(spark, smoke_fixture_dir):
    return read_web_pages(spark, f"{smoke_fixture_dir}/web_pages.parquet")


CMP_COLS = ["subject", "predicate", "object", "is_literal", "datatype"]


def _full_set(spark, pages):
    t, _ = emit_all(parse_records(pages, use_extraction=False))
    return {tuple(r) for r in dedup_triples(t).select(*CMP_COLS).collect()}


def test_resume_after_kill_no_dupes_no_missing(spark, pages, tmp_path):
    out = str(tmp_path / "kg")
    # run 1: crash after 3 bucket commits
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, pages, out, n_buckets=8, use_extraction=False, fail_after=3)
    assert len(completed_buckets(spark, out)) == 3
    # run 2: resume — only the remaining 5 buckets are processed
    result = run_resumable(spark, pages, out, n_buckets=8, use_extraction=False)
    assert result["buckets_committed"] == 5
    got = {
        tuple(r)
        for r in dedup_triples(read_triples(spark, out)).select(*CMP_COLS).collect()
    }
    assert got == _full_set(spark, pages)


def test_manifest_metrics(spark, pages, tmp_path):
    out = str(tmp_path / "kg2")
    run_resumable(spark, pages, out, n_buckets=4, use_extraction=False)
    m = read_manifest(spark, out)
    rows = m.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_triples"] > 0
        assert r["triples_per_sec"] > 0
        assert r["commit_id"].startswith(f"b{r['bucket']}-")


def test_nt_export_roundtrip(spark, pages, tmp_path):
    t, _ = emit_all(parse_records(pages, use_extraction=False))
    t = dedup_triples(t)
    lines = [r["value"] for r in nt_line(t).collect()]
    for ln in lines:
        assert ln.startswith("<") and ln.endswith(" .")
    # literal with datatype renders as "..."^^<...>
    assert any('"^^<http://www.w3.org/2001/XMLSchema#dateTime>' in ln for ln in lines)
    # export writes gzip text files
    out = str(tmp_path / "nt")
    export_nt_gz(t.limit(100), out)
    gz = [f for f in os.listdir(out) if f.endswith(".txt.gz")]
    assert gz
    with gzip.open(os.path.join(out, gz[0]), "rt") as fh:
        first = fh.readline().strip()
    assert first.endswith(" .")


def test_bucketed_build_matches_flat_and_prunes(spark, pages, tmp_path):
    """Bucket-partitioned corpus (Iceberg bucket(url) emulation): identical
    store content to the flat-corpus build, AND the per-bucket subset scan
    is partition-pruned (the 0.8-efficiency scaling fix)."""
    from pyspark.sql import functions as F

    from yckg_spark.sources.web_pages import (
        read_bucket_spec,
        read_web_pages,
        write_bucketed_pages,
    )

    bdir = str(tmp_path / "bucketed")
    write_bucketed_pages(pages, bdir, n_buckets=4)
    assert read_bucket_spec(bdir)["n_buckets"] == 4

    bpages = read_web_pages(spark, bdir)
    assert "bucket" in bpages.columns
    # bucket filter must reach PartitionFilters, not a post-scan Filter
    plan = bpages.filter(F.col("bucket") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "(bucket" in plan.split("PartitionFilters")[1][:80]

    out = str(tmp_path / "kg_bucketed")
    run_resumable(spark, bpages, out, n_buckets=4, use_extraction=False)
    got = {
        tuple(r)
        for r in dedup_triples(read_triples(spark, out)).select(*CMP_COLS).collect()
    }
    assert got == _full_set(spark, pages)


def test_trusted_bucket_column_guard(spark, pages, tmp_path):
    """A discovered bucket column is kept only when the sidecar spec exists
    AND matches the requested count; a missing or mismatched spec drops it
    so the build recomputes buckets (no silently-skipped buckets)."""
    import os

    from yckg_spark.sources.web_pages import (
        bucket_spec_path,
        read_bucket_spec,
        read_web_pages,
        with_trusted_bucket,
        write_bucketed_pages,
    )

    bdir = str(tmp_path / "bucketed_guard")
    write_bucketed_pages(pages, bdir, n_buckets=4)
    bpages = read_web_pages(spark, bdir)

    spec = read_bucket_spec(bdir)
    assert "bucket" in with_trusted_bucket(bpages, spec, 4).columns
    # requested count disagrees with the layout -> recompute
    assert "bucket" not in with_trusted_bucket(bpages, spec, 8).columns
    # sidecar lost (parquet-only copy) but bucket= dirs discovered -> recompute
    os.remove(bucket_spec_path(bdir))
    assert read_bucket_spec(bdir) is None
    assert "bucket" not in with_trusted_bucket(bpages, None, 4).columns
    # flat corpus is untouched
    assert "bucket" not in with_trusted_bucket(pages, None, 4).columns


def test_store_predicate_partition_prunes_cq_scans(spark, pages, tmp_path):
    """The triple store is partitioned by predicate under each bucket; a CQ
    predicate filter must land in PartitionFilters (pruned scan), not a
    post-scan Filter over the whole store."""
    from yckg_spark.plans import queries as Q

    out = str(tmp_path / "kg_pred")
    run_resumable(spark, pages, out, n_buckets=2, use_extraction=False)
    store = read_triples(spark, out)
    assert "predicate" in store.columns
    Q.register(spark, store)
    plan = Q.cq2_restaurants_count(spark)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "predicate" in seg
    # and the store content is unchanged by the layout
    got = {
        tuple(r)
        for r in dedup_triples(store).select(*CMP_COLS).collect()
    }
    assert got == _full_set(spark, pages)


def test_store_content_deterministic_across_parallelism(spark, pages, tmp_path):
    """Two builds of the same corpus at different shuffle parallelism must
    produce identical full-row store content INCLUDING the carried
    source_domain column (dedup resolves non-key columns with min(), so no
    arbitrary-survivor nondeterminism remains)."""
    outs = []
    for name, parts in (("kg_p4", 4), ("kg_p13", 13)):
        out = str(tmp_path / name)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            run_resumable(spark, pages, out, n_buckets=3, use_extraction=False)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        rows = {
            tuple(r)
            for r in dedup_triples(read_triples(spark, out))
            .select("subject", "predicate", "object", "is_literal", "datatype", "source_domain")
            .collect()
        }
        outs.append(rows)
    assert outs[0] == outs[1]


def test_salted_agg_matches_plain(spark, pages):
    from pyspark.sql import functions as F

    from yckg_spark.operators.canonicalize import salted_agg, salted_distinct_values

    t, _ = emit_all(parse_records(pages, use_extraction=False))
    plain = {
        (r["predicate"], r["n"])
        for r in t.groupBy("predicate").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["predicate"], r["n"])
        for r in salted_agg(t, ["predicate"], {"n": "count"}).collect()
    }
    assert plain == salted
    dv = {r["predicate"] for r in salted_distinct_values(t, "predicate").collect()}
    assert dv == {p for p, _ in plain}


def test_time_travel_reads(spark, pages, tmp_path):
    """Snapshot time-travel over the append-only bucket layout: a read as
    of commit N sees exactly the buckets committed by then, a resumed
    run extends the sequence, and the latest read equals the full build.
    Mirrors Iceberg VERSION AS OF / TIMESTAMP AS OF / snapshots table."""
    from yckg_spark.materialize import snapshots

    out = str(tmp_path / "kg_tt")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, pages, out, n_buckets=4, use_extraction=False, fail_after=2)
    snaps = snapshots(spark, out).collect()
    assert [r["sequence_number"] for r in snaps] == [1, 2]

    # as-of the first commit: only that bucket's partition is read
    first_bucket = snaps[0]["bucket"]
    v1 = read_triples(spark, out, as_of_sequence=1)
    assert set(v1.select("bucket").distinct().toPandas()["bucket"]) == {first_bucket}
    direct = spark.read.parquet(os.path.join(out, "triples", f"bucket={first_bucket}"))
    assert v1.count() == direct.count()

    # resume: the sequence keeps counting past the crash
    run_resumable(spark, pages, out, n_buckets=4, use_extraction=False)
    snaps2 = snapshots(spark, out).collect()
    assert [r["sequence_number"] for r in snaps2] == [1, 2, 3, 4]

    # as-of the pre-crash state is unchanged by the resume
    v2 = read_triples(spark, out, as_of_sequence=2)
    assert set(v2.select("bucket").distinct().toPandas()["bucket"]) == {
        r["bucket"] for r in snaps
    }
    # timestamp travel to commit 2's own timestamp includes commits 1-2
    ts2 = snaps2[1]["committed_at_ms"]
    vt = read_triples(spark, out, as_of_timestamp_ms=ts2)
    assert {r["bucket"] for r in vt.select("bucket").distinct().collect()} <= {
        r["bucket"] for r in snaps2 if r["committed_at_ms"] <= ts2
    }
    # latest read == full store
    latest = read_triples(spark, out)
    assert read_triples(spark, out, as_of_sequence=4).count() == latest.count()

    # a bound before the first snapshot is an error, as in Iceberg
    with pytest.raises(ValueError, match="no snapshot"):
        read_triples(spark, out, as_of_sequence=0)


def test_vacuum_removes_orphans_keeps_committed(spark, pages, tmp_path):
    from yckg_spark.materialize import read_triples, remove_orphans

    out = str(tmp_path / "kg")
    run_resumable(spark, pages, out, n_buckets=2, use_extraction=False)
    before = read_triples(spark, out).count()
    # fabricate a killed run's residue: data dirs with no manifest row
    orphan_t = tmp_path / "kg" / "triples" / "bucket=9"
    orphan_e = tmp_path / "kg" / "errors" / "bucket=9"
    spark.range(3).write.parquet(str(orphan_t))
    spark.range(2).write.parquet(str(orphan_e))
    res = remove_orphans(spark, out)
    assert res["n_removed"] == 2
    assert res["removed"] == ["errors/bucket=9", "triples/bucket=9"]
    assert res["committed_buckets"] == 2
    assert not orphan_t.exists() and not orphan_e.exists()
    # committed data untouched and still readable
    assert read_triples(spark, out).count() == before
    # idempotent: a second pass finds nothing
    assert remove_orphans(spark, out)["n_removed"] == 0


def test_vacuum_on_empty_store(spark, tmp_path):
    from yckg_spark.materialize import remove_orphans

    res = remove_orphans(spark, str(tmp_path / "nothing"))
    assert res == {"n_removed": 0, "removed": [], "committed_buckets": 0}


def test_nt_roundtrip_with_hostile_literals(spark, tmp_path):
    """export_nt_gz -> read_nt must be the identity on the triples shape,
    including every escaped character class and typed/plain/IRI objects."""
    from yckg_spark.materialize import export_nt_gz, read_nt

    rows = [
        ("http://ex/s1", "http://ex/p", "http://ex/o", False, None, None),
        ("http://ex/s2", "http://ex/p", 'quote " and \\ backslash', True, None, None),
        ("http://ex/s3", "http://ex/p", "line\nbreak\ttab\rret", True,
         "http://www.w3.org/2001/XMLSchema#string", None),
        ("http://ex/s4", "http://ex/p", "42", True,
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://ex/s5", "http://ex/p", "\\n not a newline", True, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, is_literal boolean,"
        " datatype string, source_domain string",
    )
    path = str(tmp_path / "nt")
    export_nt_gz(df, path)
    back = read_nt(spark, path)
    want = {tuple(r)[:5] for r in rows}
    got = {
        (r["subject"], r["predicate"], r["object"], r["is_literal"], r["datatype"])
        for r in back.collect()
    }
    assert got == want
    assert back.columns == df.columns  # full triples shape restored
