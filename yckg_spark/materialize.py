"""Materialization: partitioned triple store, lineage manifest,
checkpoint-resume, metrics, and N-Triples export.

Production sink is a partitioned Iceberg table (atomic snapshot commits);
this sandbox has no Iceberg runtime jar, so the store is directory-partitioned
parquet with the same commit discipline: one *bucket* of input pages is
processed per commit, the triples land under ``triples/bucket=K/`` in a
single atomic job, and the lineage manifest row (with per-commit metrics) is
written only after the data job succeeds — so a crash between the two at
worst re-processes one bucket into an overwritten partition dir (idempotent),
never duplicates it. Restart anti-joins the manifest (north_rule:
"resumable from checkpoint with per-partition lineage + metrics"; the
reference just re-appends and risks duplicates — create_yelp_nt_files.py:31
'at' mode).

Snapshot time-travel is emulated too: every commit carries a monotone
``sequence_number`` and ``committed_at_ms``, and because committed buckets
are immutable the table state as of any commit is reconstructible as the
union of the bucket partitions at or below the bound — ``read_triples(...,
as_of_sequence= / as_of_timestamp_ms=)`` is the Iceberg ``VERSION AS OF`` /
``TIMESTAMP AS OF`` read, and ``snapshots()`` the snapshots metadata table.
What this emulation still lacks vs real Iceberg: travel across overwrites
of the same bucket (snapshot expiry semantics) and hidden partition
transforms beyond the explicit bucket/predicate layout.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yckg_spark.operators.canonicalize import DEDUP_KEY, dedup_triples
from yckg_spark.operators.emit import emit_all
from yckg_spark.sources.web_pages import parse_records

N_BUCKETS_DEFAULT = 8


def bucket_of(url_col):
    return F.pmod(F.hash(url_col), F.lit(N_BUCKETS_DEFAULT))


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    # manifest IO goes through the Hadoop FS API so the store (and its
    # lineage) can live on hdfs://, s3a://, or a local dir alike
    from yckg_spark.fsutil import list_names, read_text

    p = _manifest_path(out_dir)
    rows = [
        json.loads(read_text(spark, os.path.join(p, f)))
        for f in list_names(spark, p)
        if f.endswith(".json")
    ]
    return spark.createDataFrame(rows) if rows else None


def completed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    m = read_manifest(spark, out_dir)
    if m is None:
        return set()
    return {r["bucket"] for r in m.select("bucket").collect()}


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    use_extraction: bool = True,
    fail_after: int | None = None,
    only_buckets: list[int] | None = None,
) -> dict:
    """Build the KG bucket-by-bucket with commit-level lineage.

    ``fail_after`` aborts after that many bucket commits (test hook for the
    kill-and-resume scenario). ``only_buckets`` restricts this process to a
    shard of the bucket space — how separate workers (executors/jobs on a
    real cluster) split one build between them; each writes disjoint
    partitions and manifest rows, so shards compose. Returns run metrics.
    """
    from yckg_spark.fsutil import mkdirs, write_text

    mkdirs(spark, _manifest_path(out_dir))
    prior = read_manifest(spark, out_dir)
    done = set()
    seq_base = 0
    if prior is not None:
        done = {r["bucket"] for r in prior.select("bucket").collect()}
        if "sequence_number" in prior.columns:
            seq_base = prior.agg(F.max("sequence_number")).collect()[0][0] or 0
    if "bucket" in pages.columns:
        # pre-bucketed corpus (Iceberg bucket(url) emulation): the bucket
        # filter is a PartitionFilter, so each commit scans ONLY its own
        # partition directory — no full-corpus decode per bucket, and W
        # concurrent workers move 1/W of the bytes each instead of W full
        # copies through the shared storage path.
        bucketed, bcol = pages, "bucket"
    else:
        bucketed = pages.withColumn("__bucket", F.pmod(F.hash("url"), F.lit(n_buckets)))
        bcol = "__bucket"
    from pyspark.sql import Observation

    commits = 0
    metrics_all: list[dict] = []
    for b in range(n_buckets):
        if b in done or (only_buckets is not None and b not in only_buckets):
            continue
        subset = bucketed.filter(F.col(bcol) == b).drop(bcol)
        # Commit metrics ride the write jobs as Observations (CollectMetrics
        # nodes) instead of re-reading the written partitions afterwards —
        # three saved actions per commit; at 100 TB the old way re-read
        # every written partition once. obs_pages sits on the raw bucket
        # subset (pre lang-filter, the page count the manifest records);
        # filters don't push through CollectMetrics, but this scan read the
        # whole bucket for the separate count() before, so net I/O shrinks.
        obs_pages, obs_triples, obs_errors = Observation(), Observation(), Observation()
        subset = subset.observe(obs_pages, F.count(F.lit(1)).alias("n"))
        persisted: list[DataFrame] = []
        records = parse_records(subset, use_extraction=use_extraction, persisted_out=persisted)
        triples, errors = emit_all(records)
        triples = dedup_triples(triples).observe(obs_triples, F.count(F.lit(1)).alias("n"))
        errors = errors.observe(obs_errors, F.count(F.lit(1)).alias("n"))

        t0 = time.time()
        tdir = os.path.join(out_dir, "triples", f"bucket={b}")
        edir = os.path.join(out_dir, "errors", f"bucket={b}")
        # predicate-partitioned store: every CQ filters `predicate = <iri>`
        # (one pattern per self-join side), so the query side prunes to the
        # matching partition dirs instead of re-scanning the full store per
        # pattern — the Iceberg identity-partition(predicate) layout, nested
        # under the write side's bucket partitioning. Predicate cardinality
        # is small (~50 vocabulary IRIs), so this adds no small-file blowup.
        triples.write.mode("overwrite").partitionBy("predicate").parquet(tdir)
        errors.write.mode("overwrite").parquet(edir)
        t_write = time.time() - t0
        n_triples = obs_triples.get["n"]
        n_errors = obs_errors.get["n"]
        n_pages = obs_pages.get["n"]
        elapsed = time.time() - t0
        t_counts = elapsed - t_write

        commit = {
            "bucket": b,
            "n_pages": n_pages,
            "n_triples": n_triples,
            "n_errors": n_errors,
            "seconds": round(elapsed, 3),
            "write_s": round(t_write, 3),
            "counts_s": round(t_counts, 3),
            "triples_per_sec": round(n_triples / elapsed, 1) if elapsed else None,
            "commit_id": f"b{b}-{n_pages}-{n_triples}",
            # snapshot lineage for time-travel reads (Iceberg snapshot id /
            # commit timestamp equivalents). Buckets are immutable once
            # committed, so the table state as of sequence N is exactly the
            # union of buckets with sequence <= N. Within one writer the
            # sequence is a total order; concurrent shard writers can tie
            # (they'd race Iceberg's optimistic commit too) — as-of reads
            # then include all tied commits, which is still deterministic.
            "sequence_number": seq_base + commits + 1,
            "committed_at_ms": int(time.time() * 1000),
        }
        # manifest row written only after the data commit succeeded
        write_text(
            spark, os.path.join(_manifest_path(out_dir), f"bucket-{b}.json"),
            json.dumps(commit),
        )
        metrics_all.append(commit)
        commits += 1
        # drop exactly this bucket's stage-cut blocks (classified + parsed
        # domains) before the next bucket materializes its own — a blanket
        # clearCache() would also evict unrelated frames a shared session
        # (tests, bench harness, callers) has persisted
        for df in persisted:
            df.unpersist()
        if fail_after is not None and commits >= fail_after:
            raise RuntimeError(f"injected failure after {commits} commits")
    return {
        "buckets_committed": commits,
        "total_triples": sum(m["n_triples"] for m in metrics_all),
        "commits": metrics_all,
    }


def snapshots(spark: SparkSession, out_dir: str) -> DataFrame:
    """The store's commit lineage ordered by sequence — the emulation of
    Iceberg's ``<table>.snapshots`` metadata table. One row per bucket
    commit with its metrics, sequence number, and commit timestamp."""
    m = read_manifest(spark, out_dir)
    if m is None:
        raise ValueError(f"no manifest under {out_dir}")
    if "sequence_number" not in m.columns:
        raise ValueError("store predates snapshot lineage (no sequence_number)")
    return m.orderBy("sequence_number")


def read_triples(
    spark: SparkSession,
    out_dir: str,
    as_of_sequence: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    """Read the triple store, optionally time-travelled to an earlier
    snapshot — the Iceberg ``VERSION AS OF`` / ``TIMESTAMP AS OF`` read,
    emulated over the append-only bucket layout: committed buckets are
    immutable, so the state as of a commit is the union of the bucket
    partitions whose manifest row has ``sequence_number`` (or
    ``committed_at_ms``) at or below the bound. The historical read is
    partition-pruned at the path level — later buckets are never opened.
    """
    tdir = os.path.join(out_dir, "triples")
    if as_of_sequence is None and as_of_timestamp_ms is None:
        return spark.read.parquet(tdir)
    snaps = snapshots(spark, out_dir)
    if as_of_sequence is not None:
        snaps = snaps.filter(F.col("sequence_number") <= as_of_sequence)
    if as_of_timestamp_ms is not None:
        snaps = snaps.filter(F.col("committed_at_ms") <= as_of_timestamp_ms)
    buckets = [r["bucket"] for r in snaps.select("bucket").collect()]
    if not buckets:
        raise ValueError("no snapshot at or before the requested point")
    paths = [os.path.join(tdir, f"bucket={b}") for b in sorted(buckets)]
    return spark.read.option("basePath", tdir).parquet(*paths)


def compact_store(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> dict:
    """Rewrite any triples output (a streaming run's ``batch=N`` dirs, a
    resumable build, or a union of shards) as one globally-deduplicated
    store in the canonical layout: ``bucket(subject)`` dirs × ``predicate``
    partitions. The streaming path appends at-least-once-shaped batch dirs
    (idempotent per batch but never cross-batch deduped); this is the
    downstream compaction job that makes the store equivalent to a batch
    build — the Iceberg rewrite-data-files maintenance action.

    One shuffle (the dedup groupBy); the write is partitioned by the same
    dedup output, so no second shuffle.
    """
    triples = spark.read.parquet(os.path.join(in_dir, "triples"))
    extra = [c for c in triples.columns if c not in DEDUP_KEY + ["source_domain"]]
    deduped = dedup_triples(triples.drop(*extra))
    out = deduped.withColumn("bucket", F.pmod(F.hash("subject"), F.lit(n_buckets)))
    tdir = os.path.join(out_dir, "triples")
    out.write.mode("overwrite").partitionBy("bucket", "predicate").parquet(tdir)
    n = spark.read.parquet(tdir).count()
    return {"n_triples": n, "out": tdir, "n_buckets": n_buckets}


def remove_orphans(spark: SparkSession, out_dir: str) -> dict:
    """Delete bucket partition dirs with no committed manifest row — the
    Iceberg ``remove_orphan_files`` maintenance action, emulated over the
    bucket layout. Orphans arise when a run is killed mid-write (the data
    lands before the manifest row commits; resume normally overwrites the
    dir, but a reconfigured or abandoned run leaves it forever) — they are
    invisible to readers (``read_triples`` time-travel unions only
    manifest-listed buckets) but they hold storage and show up in naive
    directory scans. Committed buckets are never touched, so the action is
    safe to run concurrently with readers.

    Driver state is O(#partition dirs) names; the listing and deletes go
    through the Hadoop FS layer (``fsutil``), so the same call works on
    hdfs:// and s3a:// stores.
    """
    from yckg_spark.fsutil import delete, exists, list_names

    m = read_manifest(spark, out_dir)
    committed: set[int] = set()
    if m is not None:
        committed = {r["bucket"] for r in m.select("bucket").collect()}
    removed: list[str] = []
    for sub in ("triples", "errors"):
        base = os.path.join(out_dir, sub)
        if not exists(spark, base):
            continue
        for name in list_names(spark, base):
            if not name.startswith("bucket="):
                continue  # _SUCCESS markers etc.
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if b not in committed:
                delete(spark, os.path.join(base, name), recursive=True)
                removed.append(f"{sub}/{name}")
    return {
        "n_removed": len(removed),
        "removed": sorted(removed),
        "committed_buckets": len(committed),
    }


# ---------------------------------------------------------------------------
# N-Triples export (K1) — the reference's one output format
# ---------------------------------------------------------------------------


def nt_line(triples: DataFrame) -> DataFrame:
    """Format each triple as canonical N-Triples, entirely JVM-side."""
    esc = F.col("object")
    for raw, rep in [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]:
        esc = F.replace(esc, F.lit(raw), F.lit(rep))
    literal = F.when(
        F.col("datatype").isNotNull(),
        F.concat(F.lit('"'), esc, F.lit('"^^<'), F.col("datatype"), F.lit(">")),
    ).otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    obj = F.when(F.col("is_literal"), literal).otherwise(
        F.concat(F.lit("<"), F.col("object"), F.lit(">"))
    )
    return triples.select(
        F.concat(
            F.lit("<"), F.col("subject"), F.lit("> <"), F.col("predicate"), F.lit("> "),
            obj, F.lit(" ."),
        ).alias("value")
    )


def export_nt_gz(triples: DataFrame, path: str) -> None:
    nt_line(triples).write.mode("overwrite").option("compression", "gzip").text(path)


def read_nt(spark, path: str) -> DataFrame:
    """Parse N-Triples text (plain or .gz — Spark's text source handles the
    codec) back into the columnar triples shape: the inverse of
    ``nt_line``, so a user can load the reference's published .nt dumps
    (reference: create_yelp_nt_files.py writes one .nt.gz per domain) and
    query them with the CQ plans or the SPARQL compiler directly.

    Entirely narrow JVM-side column work — a regexp split of each line
    plus an unescape chain — so ingest parallelism is just the text
    source's splits (gzip is non-splittable per FILE; a multi-file dump
    parallelizes per file, which is exactly how the reference shards its
    corpus). Unescaping uses a NUL placeholder to invert the
    backslash-first escape order safely; N-Triples forbids raw NUL in
    the wire format, so the placeholder cannot collide. Comment (#) and
    blank lines are dropped; ``source_domain`` is null (not on the wire).
    """
    lines = spark.read.text(path).filter(
        (F.length(F.trim(F.col("value"))) > 0)
        & ~F.trim(F.col("value")).startswith("#")
    )
    s = F.regexp_extract("value", r"^<([^>]*)> ", 1)
    p = F.regexp_extract("value", r"^<[^>]*> <([^>]*)> ", 1)
    rest = F.regexp_extract("value", r"^<[^>]*> <[^>]*> (.*) \.\s*$", 1)
    parsed = lines.select(
        s.alias("subject"), p.alias("predicate"), rest.alias("rest")
    )
    is_lit = F.col("rest").startswith('"')
    iri_obj = F.regexp_extract("rest", r"^<([^>]*)>$", 1)
    lit_raw = F.regexp_extract("rest", r'^"(.*)"(?:\^\^<[^>]*>)?$', 1)
    datatype = F.nullif(
        F.regexp_extract("rest", r'\^\^<([^>]*)>$', 1), F.lit("")
    )
    esc = lit_raw
    # invert nt_line's escape order: protect \\ behind a placeholder first
    esc = F.replace(esc, F.lit("\\\\"), F.lit("\x00"))
    for raw, rep in [("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"), ('\\"', '"')]:
        esc = F.replace(esc, F.lit(raw), F.lit(rep))
    esc = F.replace(esc, F.lit("\x00"), F.lit("\\"))
    return parsed.select(
        "subject",
        "predicate",
        F.when(is_lit, esc).otherwise(iri_obj).alias("object"),
        is_lit.alias("is_literal"),
        F.when(is_lit, datatype).alias("datatype"),
        F.lit(None).cast("string").alias("source_domain"),
    )
