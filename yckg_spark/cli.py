"""spark-submit entry point for the KG-construction pipeline.

North-rule launch mode: the job is packaged as a zip and launched as

    spark-submit --master <cluster> --py-files dist/yckg_spark.zip \
        yckg_spark/cli.py build --input <web_pages> --output <kg_dir>

(in the sandbox ``--master local[N]``; on a real cluster the same command
with YARN/K8s master and executor counts N vs 4N). The driver loop is the
checkpoint-resumable bucket materializer in ``yckg_spark.materialize`` —
re-running the identical command after a crash resumes from the lineage
manifest and never duplicates triples.

Subcommands
-----------
build       scan web pages → extraction UDF → parse → emit → dedup →
            partitioned triple store with per-commit lineage + metrics
export-nt   gzip N-Triples export of a built triple store (reference's
            output format, Code/create_yelp_nt_files.py:180-181)
synth       deterministic synthetic web_pages corpus (fixtures) for
            benchmarking — no external data
query       run one of the CQ1-16 competency questions over a built store
dedup       document dedup: exact / minhash-LSH / simhash pair generation →
            connected components → keep one representative per component
link        Wikidata entity-linking pass → location triple cascade, with
            link-score metrics in the commit manifest
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# When shipped via --py-files the package root is already importable; when
# run from a checkout, add the repo root.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _spark(args):
    from yckg_spark.session import get_spark

    return get_spark(
        app_name=f"yckg-{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def cmd_build(args) -> int:
    from yckg_spark.materialize import run_resumable
    from yckg_spark.sources.web_pages import (
        read_bucket_spec,
        read_web_pages,
        with_trusted_bucket,
    )

    spark = _spark(args)
    pages = with_trusted_bucket(
        read_web_pages(spark, args.input), read_bucket_spec(args.input), args.n_buckets
    )
    t0 = time.time()
    result = run_resumable(
        spark,
        pages,
        args.output,
        n_buckets=args.n_buckets,
        use_extraction=not args.skip_extraction,
        only_buckets=[int(x) for x in args.buckets.split(",")] if args.buckets else None,
    )
    elapsed = time.time() - t0
    out = {
        "buckets_committed": result["buckets_committed"],
        "total_triples": result["total_triples"],
        "seconds": round(elapsed, 3),
        "triples_per_sec": round(result["total_triples"] / elapsed, 1) if elapsed else None,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "commits": result["commits"],
    }
    print(json.dumps(out))
    return 0


def cmd_bucketize(args) -> int:
    """Rewrite a corpus bucket-partitioned (Iceberg bucket(url) emulation)."""
    from yckg_spark.sources.web_pages import read_web_pages, write_bucketed_pages

    spark = _spark(args)
    pages = read_web_pages(spark, args.input).drop("bucket")
    write_bucketed_pages(pages, args.output, args.n_buckets)
    print(json.dumps({"bucketized": args.output, "n_buckets": args.n_buckets}))
    return 0


def cmd_export_nt(args) -> int:
    from yckg_spark.materialize import export_nt_gz, read_triples
    from yckg_spark.operators.canonicalize import dedup_triples

    spark = _spark(args)
    export_nt_gz(dedup_triples(read_triples(spark, args.input)), args.output)
    print(json.dumps({"exported": args.output}))
    return 0


def cmd_compact(args) -> int:
    """Global dedup + canonical re-layout of any triples output (e.g. a
    streaming run's batch dirs) — the Iceberg rewrite-data-files job."""
    from yckg_spark.materialize import compact_store

    spark = _spark(args)
    result = compact_store(spark, args.input, args.output, n_buckets=args.n_buckets)
    print(json.dumps(result))
    return 0


def cmd_synth(args) -> int:
    from fixtures.generate import write_fixture

    path = write_fixture(args.output, seed=args.seed, n_business=args.n_business)
    print(json.dumps({"fixture": str(path)}))
    return 0


def cmd_query(args) -> int:
    from yckg_spark.materialize import read_triples
    from yckg_spark.operators.canonicalize import dedup_triples
    from yckg_spark.plans.queries import ALL_CQS, register

    sparql = args.sparql
    if args.sparql_file:
        with open(args.sparql_file) as fh:
            sparql = fh.read()
    if sparql is None and args.cq is None:
        print("error: pass --cq NAME, --sparql TEXT, or --sparql-file PATH",
              file=sys.stderr)
        return 2
    if sparql is None and args.cq not in ALL_CQS:
        print(f"error: unknown CQ {args.cq!r}; valid: {', '.join(sorted(ALL_CQS))}",
              file=sys.stderr)
        return 2
    spark = _spark(args)
    if args.input_format == "nt":
        from yckg_spark.materialize import read_nt

        triples = dedup_triples(read_nt(spark, args.input))
    else:
        triples = dedup_triples(
            read_triples(
                spark,
                args.input,
                as_of_sequence=args.as_of_sequence,
                as_of_timestamp_ms=args.as_of_timestamp_ms,
            )
        )
    register(spark, triples)
    if sparql is not None:
        from yckg_spark.plans.sparql import run_sparql

        df = run_sparql(spark, sparql)
    else:
        df = ALL_CQS[args.cq](spark)
    rows = [r.asDict() for r in df.limit(args.limit).collect()]
    out = {"cq": args.cq or "sparql", "rows": rows}
    if args.as_of_sequence is not None:
        out["as_of_sequence"] = args.as_of_sequence
    if args.as_of_timestamp_ms is not None:
        out["as_of_timestamp_ms"] = args.as_of_timestamp_ms
    print(json.dumps(out, default=str))
    return 0


def cmd_snapshots(args) -> int:
    """Print the store's commit lineage (the Iceberg snapshots metadata
    table equivalent): one row per bucket commit, ordered by sequence."""
    from yckg_spark.materialize import snapshots

    spark = _spark(args)
    rows = [r.asDict() for r in snapshots(spark, args.input).collect()]
    print(json.dumps({"snapshots": rows}, default=str))
    return 0


def cmd_vacuum(args) -> int:
    """Remove orphan bucket partition dirs (data written but never
    manifest-committed — a killed run's residue): the Iceberg
    remove_orphan_files maintenance action."""
    from yckg_spark.materialize import remove_orphans

    spark = _spark(args)
    print(json.dumps(remove_orphans(spark, args.input)))
    return 0


def cmd_stream(args) -> int:
    from yckg_spark.streaming.incremental import start_incremental_build

    spark = _spark(args)
    q = start_incremental_build(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        use_extraction=not args.skip_extraction,
        available_now=not args.follow,
    )
    q.awaitTermination()
    print(json.dumps({"stream": "drained" if not args.follow else "stopped",
                      "output": args.output}))
    return 0


def cmd_dedup(args) -> int:
    """End-to-end document dedup: pair generation (exact hash / minhash-LSH
    / simhash banding) → connected components → keep one representative per
    component → deduped parquet. The large table is only ever anti-joined
    on ids; pair generation is bucketed (never all-pairs)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from yckg_spark.operators.dedup import (
        dedup_keep_best,
        dedup_keep_representatives,
        exact_dedup,
        incremental_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    if args.keep_best is not None and (args.against is not None or args.method == "exact"):
        # the keep policy only applies to the near-dup component paths;
        # silently keeping min-id when the user asked for max-quality
        # would corrupt a pipeline without any signal
        print(json.dumps({"error": "--keep-best requires --method minhash "
                                   "or simhash (not exact/--against)"}))
        return 2

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    persisted: list = []
    if args.against is not None:
        # incremental mode (continuous crawl): exact-dedup the batch
        # against the existing corpus — the corpus reduces to distinct
        # content hashes, the batch anti-joins, min-id within the batch
        corpus = spark.read.parquet(args.against)
        kept = incremental_dedup(
            docs, corpus, text_col=args.text_col, id_col=args.id_col
        )
        n_pairs = None
    elif args.method == "exact":
        # same output contract as minhash/simhash: document rows, one
        # representative per identical-text group (semi-join on keep ids —
        # the big table is never shuffled on text)
        keep = exact_dedup(docs, text_col=args.text_col, id_col=args.id_col).select(
            F.col("keep_id").alias(args.id_col)
        )
        kept = docs.join(keep, args.id_col, "left_semi")
        n_pairs = None
    else:
        if args.method == "minhash":
            pairs = minhash_lsh_pairs(
                docs, text_col=args.text_col, id_col=args.id_col,
                threshold=args.threshold, persisted_out=persisted,
            )
        else:  # simhash
            pairs = simhash_pairs(
                docs, text_col=args.text_col, id_col=args.id_col,
                max_hamming=args.max_hamming, persisted_out=persisted,
            )
        pairs = pairs.select("id_a", "id_b").persist()
        n_pairs = pairs.count()
        if args.keep_best is not None:
            kept = dedup_keep_best(
                docs, pairs, args.keep_best, id_col=args.id_col,
                checkpoint_dir=args.checkpoint_dir,
            )
        else:
            kept = dedup_keep_representatives(
                docs, pairs, id_col=args.id_col, checkpoint_dir=args.checkpoint_dir
            )
    # output count rides the write job as an Observation (materialize.py
    # discipline) — the written store is never re-read; input count is a
    # parquet metadata-only count(*)
    obs = Observation()
    kept.observe(obs, F.count(F.lit(1)).alias("n_out")).write.mode(
        "overwrite"
    ).parquet(args.output)
    n_out = obs.get["n_out"]
    for df in persisted + ([pairs] if n_pairs is not None else []):
        df.unpersist()
    if args.checkpoint_dir is not None:
        # the reliable checkpoints only exist to survive executor loss
        # DURING the components loop; once the output write has committed
        # they are dead weight (Spark never reaps them —
        # cleaner.referenceTracking.cleanCheckpoints defaults to false),
        # so the CLI, as the checkpoint_dir owner, deletes them here
        from yckg_spark.fsutil import delete as fs_delete

        fs_delete(spark, args.checkpoint_dir, recursive=True)
    n_in = docs.count()
    print(json.dumps({
        "method": "incremental" if args.against is not None else args.method,
        "docs_in": n_in, "docs_kept": n_out,
        "removed": n_in - n_out, "neardup_pairs": n_pairs,
        "against": args.against,
        "keep": (f"best:{args.keep_best}" if args.keep_best is not None
                 else "min_id"),
        "seconds": round(time.time() - t0, 3), "output": args.output,
    }))
    return 0


def cmd_curate(args) -> int:
    """Training-data curation pass: quality score + repetition signals per
    document, threshold filters, optional benchmark decontamination and PII
    scrubbing, curated parquet out. Document text never shuffles: signals
    join back on id, contamination is a broadcast-gram probe + id anti-join,
    and the scrub is a narrow map on the write path."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from yckg_spark.operators.curation import (
        decontaminate,
        dup_span_stats,
        line_dedup,
        pii_scrub,
        repetition_signals,
        span_dedup,
    )
    from yckg_spark.operators.text_analysis import quality_score
    from yckg_spark.operators.urls import url_dedup

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    id_col, text_col = args.id_col, args.text_col

    n_urls_unique = None
    if args.dedup_urls:
        # URL-keyed dedup runs first: it is the cheapest pass (no text
        # ever moves) and shrinks everything downstream
        keep = url_dedup(
            docs, url_col=args.url_col, id_col=id_col, order_col=args.url_order_col
        ).persist()
        n_urls_unique = keep.count()
        docs = docs.join(
            keep.select(F.col("keep_id").alias(id_col)), on=id_col, how="left_semi"
        )

    lines_in = lines_kept = None
    if args.dedup_lines is not None:
        # boilerplate removal BEFORE scoring (the CCNet order): repeated
        # navigation/footer lines would otherwise drag quality and
        # repetition signals of otherwise-good documents
        dd = line_dedup(
            docs, min_docs=args.dedup_lines, text_col=text_col, id_col=id_col
        ).persist()
        lines_in, lines_kept = dd.agg(
            F.coalesce(F.sum("n_lines"), F.lit(0)),
            F.coalesce(F.sum("n_kept"), F.lit(0)),
        ).first()
        docs = docs.drop(text_col).join(
            dd.select(id_col, F.col("text_deduped").alias(text_col)),
            on=id_col,
            how="inner",
        )

    # the span-fraction FILTER must see the corpus BEFORE span removal
    # rewrites the text (post-removal every doc's dup_span_frac is ~0 and
    # the threshold could never fire), so stats are taken here either way
    span_stats = None
    if args.max_dup_span_frac is not None:
        span_stats = dup_span_stats(
            docs, k=args.span_k, text_col=text_col, id_col=id_col
        ).select(id_col, "dup_span_frac")

    span_tokens_in = span_tokens_kept = None
    if args.dedup_spans is not None:
        # substring-level removal AFTER line dedup (coarse boilerplate
        # first, then the finer copied-paragraph pass) and BEFORE scoring
        sd = span_dedup(
            docs, k=args.span_k, min_docs=args.dedup_spans,
            text_col=text_col, id_col=id_col,
        ).persist()
        span_tokens_in, span_tokens_kept = sd.agg(
            F.coalesce(F.sum("n_tokens"), F.lit(0)),
            F.coalesce(F.sum("n_kept"), F.lit(0)),
        ).first()
        docs = docs.drop(text_col).join(
            sd.select(id_col, F.col("text_deduped").alias(text_col)),
            on=id_col,
            how="inner",
        )

    scored = quality_score(docs, text_col=text_col).select(
        *docs.columns, "quality"
    )
    signals = repetition_signals(docs, text_col=text_col, id_col=id_col)
    cur = scored.join(signals, on=id_col, how="left")
    cur = cur.filter(
        (F.col("quality") >= args.min_quality)
        & (F.col("dup_word_frac") <= args.max_dup_word_frac)
        & (F.col("top2gram_frac") <= args.max_top2gram_frac)
    )

    if span_stats is not None:
        # span-level duplication was computed against the FULL (url/line-
        # deduped, pre-span-removal) corpus, not the quality-filtered
        # survivors — a copied paragraph in a dropped doc still marks its
        # twin in a kept one
        cur = cur.join(span_stats, on=id_col, how="left").filter(
            F.coalesce(F.col("dup_span_frac"), F.lit(0.0))
            <= args.max_dup_span_frac
        )

    n_contaminated = None
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        flagged = decontaminate(
            docs, bench, n=args.ngram, text_col=text_col, id_col=id_col,
            bench_text_col=args.bench_text_col,
        ).persist()
        n_contaminated = flagged.count()
        cur = cur.join(flagged.select(id_col), on=id_col, how="left_anti")

    if args.scrub_pii:
        scrubbed = pii_scrub(cur, text_col=text_col, id_col=id_col)
        cur = scrubbed.drop(text_col).withColumnRenamed("text_scrubbed", text_col)

    obs = Observation()
    cur.observe(obs, F.count(F.lit(1)).alias("n_out")).write.mode(
        "overwrite"
    ).parquet(args.output)
    n_out = obs.get["n_out"]
    if n_contaminated is not None:
        flagged.unpersist()
    if lines_in is not None:
        dd.unpersist()
    if span_tokens_in is not None:
        sd.unpersist()
    if n_urls_unique is not None:
        keep.unpersist()
    n_in = spark.read.parquet(args.input).count()
    out = {
        "docs_in": n_in, "docs_kept": n_out, "removed": n_in - n_out,
        "n_contaminated": n_contaminated, "scrubbed_pii": bool(args.scrub_pii),
        "seconds": round(time.time() - t0, 3), "output": args.output,
    }
    if n_urls_unique is not None:
        out["n_urls_unique"] = n_urls_unique
    if args.max_dup_span_frac is not None:
        out["max_dup_span_frac"] = args.max_dup_span_frac
    if lines_in is not None:
        out["lines_in"] = lines_in
        out["lines_kept"] = lines_kept
    if span_tokens_in is not None:
        out["span_tokens_in"] = span_tokens_in
        out["span_tokens_kept"] = span_tokens_kept
    print(json.dumps(out))
    return 0


def cmd_select(args) -> int:
    """Data selection/mixing/packing pass, downstream of `curate`:
    optional C4-style line cleaning (narrow, column-preserving — no join
    back), deterministic stratified sampling for corpus mixing (zero
    shuffle), per-source anti-domination caps (ids-only window +
    broadcast keep-set), and token-budget shard packing (two-phase
    distributed prefix sum). When packing is on, the output is laid out
    partitionBy(shard) — the directory layout a training loader reads
    shard-by-shard — and the kept count + shard count ride the write as
    Observations, so the written store is never re-read."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from yckg_spark.operators.selection import (
        line_filter,
        pack_shards,
        source_cap,
        stratified_sample,
    )

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    id_col, text_col = args.id_col, args.text_col
    cur = docs

    if args.line_min_words is not None:
        banned = tuple(b for b in args.banned.split(",") if b)
        cur = (
            line_filter(cur, min_words=args.line_min_words, banned=banned, text_col=text_col)
            .filter(F.col("n_kept") > 0)
            .drop(text_col, "n_lines", "n_kept")
            .withColumnRenamed("text_clean", text_col)
        )

    if args.sample_rates:
        rates = {}
        for part in args.sample_rates.split(","):
            k, _, v = part.partition("=")
            rates[k.strip()] = float(v)
        cur = stratified_sample(
            cur, rates, strata_col=args.strata_col, id_col=id_col, salt=args.salt
        )

    if args.cap is not None:
        cur = source_cap(
            cur, cap=args.cap, partition_col=args.cap_by, order_col=args.cap_order,
            id_col=id_col, broadcast_keep=True,
        ).drop("rank")

    packed = args.pack_budget is not None
    if packed:
        shards = pack_shards(
            cur, budget=args.pack_budget, id_col=id_col, text_col=text_col,
            n_buckets=args.n_buckets,
        )
        cur = cur.join(shards.select(id_col, "n_tokens", "shard"), on=id_col)

    obs = Observation()
    writer = cur.observe(
        obs,
        F.count(F.lit(1)).alias("n_out"),
        F.max(F.col("shard") if packed else F.lit(0)).alias("max_shard"),
    ).write.mode("overwrite")
    if packed:
        writer = writer.partitionBy("shard")
    writer.parquet(args.output)
    n_out = obs.get["n_out"]
    n_in = docs.count()
    print(json.dumps({
        "docs_in": n_in, "docs_kept": n_out, "removed": n_in - n_out,
        "n_shards": (obs.get["max_shard"] + 1) if packed and n_out else None,
        "line_filtered": args.line_min_words is not None,
        "sampled": bool(args.sample_rates), "capped": args.cap is not None,
        "seconds": round(time.time() - t0, 3), "output": args.output,
    }))
    return 0


def cmd_link(args) -> int:
    """Wikidata entity-linking pass (north_rule: candidate entity-link
    scoring with link-score metrics written alongside the commit): parse
    businesses out of the corpus, resolve city/county/state/country QIDs
    against the wbsearchentities/SPARQL snapshot tables
    (location_from_wikidata.py re-realized as broadcast joins + windows),
    emit the location triple cascade, and commit it with a manifest row
    carrying per-level link rates. The per-business link table (with a
    link_mask/link_score confidence column) is persisted once, shared by
    the metrics aggregate and the triple emission, and written alongside
    the triples so consumers can filter by link quality; the triple count
    rides the write job as an Observation — the written store is never
    re-read."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from yckg_spark.operators.enrich_wikidata import (
        link_locations,
        location_triples,
        with_link_score,
    )
    from yckg_spark.sources.snapshots import load_snapshots
    from yckg_spark.sources.web_pages import parse_records, read_web_pages

    spark = _spark(args)
    t0 = time.time()
    pages = read_web_pages(spark, args.input)
    persisted: list = []
    biz = parse_records(
        pages, use_extraction=not args.skip_extraction, persisted_out=persisted
    )["business"]
    snaps = load_snapshots(spark, args.snapshots)

    linked = with_link_score(link_locations(biz, snaps)).persist()
    m = linked.agg(
        F.count(F.lit(1)).alias("n_business"),
        F.count("city_qid").alias("n_city"),
        F.count("county_qid").alias("n_county"),
        F.count("state_qid").alias("n_state"),
        F.count("country_qid").alias("n_country"),
        F.count("population").alias("n_population"),
        F.avg("link_score").alias("avg_link_score"),
    ).collect()[0]
    # per-entity link confidence table, written alongside the triples
    linked.select(
        "business_id", "city_qid", "county_qid", "state_qid", "country_qid",
        "link_mask", "link_score",
    ).write.mode("overwrite").parquet(f"{args.output}/links")

    obs = Observation()
    triples = location_triples(biz, snaps, linked=linked).observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    triples.write.mode("overwrite").partitionBy("predicate").parquet(
        f"{args.output}/triples"
    )
    n_triples = obs.get["n"]
    for df in persisted + [linked]:
        df.unpersist()

    nb = m["n_business"] or 0
    rate = lambda k: round(m[k] / nb, 4) if nb else None  # noqa: E731
    manifest = {
        "n_business": nb,
        "n_triples": n_triples,
        "link_scores": {
            "city_link_rate": rate("n_city"),
            "county_link_rate": rate("n_county"),
            "state_link_rate": rate("n_state"),
            "country_link_rate": rate("n_country"),
            "population_rate": rate("n_population"),
            "avg_link_score": round(m["avg_link_score"], 4)
            if m["avg_link_score"] is not None else None,
        },
        "seconds": round(time.time() - t0, 3),
        "commit_id": f"link-{nb}-{n_triples}",
    }
    # manifest row written only after the data commit succeeded — through
    # the same filesystem as the data (hdfs://, s3a://, file: all work)
    from yckg_spark.fsutil import write_text

    write_text(spark, f"{args.output}/link_manifest.json", json.dumps(manifest))
    print(json.dumps(manifest))
    return 0


def cmd_stats(args) -> int:
    """Corpus report card: one JSON line summarizing a documents parquet —
    counts, token/char volume, quality quartiles, exact-duplicate rate,
    and the language / top-source mix. The input a curation run is sized
    and budgeted from.

    Scale shape: one enriched narrow projection (quality + token count +
    md5 fingerprint — no shuffle), then ONE global aggregate job using
    approx_count_distinct and percentile_approx (both bounded-memory
    sketches — a 100-TB corpus must never buffer exact distributions on
    one reducer), plus two tiny group-count jobs for the lang/source
    mixes. Document text never shuffles anywhere."""
    from pyspark.sql import functions as F

    from yckg_spark.operators.dedup import normalize_text
    from yckg_spark.operators.text_analysis import quality_score

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    id_col, text_col = args.id_col, args.text_col

    enriched = quality_score(docs, text_col).select(
        id_col,
        "n_tokens",
        "quality",
        F.length(F.col(text_col)).alias("n_chars_stat"),
        F.md5(normalize_text(F.col(text_col))).alias("fp"),
        *([args.lang_col] if args.lang_col in docs.columns else []),
        *([args.source_col] if args.source_col in docs.columns else []),
    )
    g = enriched.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars_stat").alias("total_chars"),
        F.approx_count_distinct("fp").alias("approx_unique"),
        F.percentile_approx("quality", [0.25, 0.5, 0.75], 10_000).alias("q_quartiles"),
        F.percentile_approx("n_tokens", [0.5, 0.9, 0.99], 10_000).alias("tok_pcts"),
    ).collect()[0]
    out = {
        "n_docs": g["n_docs"],
        "total_tokens": g["total_tokens"],
        "total_chars": g["total_chars"],
        "approx_unique_texts": g["approx_unique"],
        "approx_dup_rate": round(1 - g["approx_unique"] / max(g["n_docs"], 1), 4),
        "quality_quartiles": [round(x, 6) for x in g["q_quartiles"]],
        "token_p50_p90_p99": [int(x) for x in g["tok_pcts"]],
        "seconds": round(time.time() - t0, 3),
    }
    if args.lang_col in docs.columns:
        out["langs"] = {
            r[args.lang_col]: r["n"]
            for r in enriched.groupBy(args.lang_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col(args.lang_col))
            .limit(50)
            .collect()
        }
    if args.source_col in docs.columns:
        out["top_sources"] = {
            r[args.source_col]: r["n"]
            for r in enriched.groupBy(args.source_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col(args.source_col))
            .limit(args.top_sources)
            .collect()
        }
    print(json.dumps(out))
    return 0


def cmd_discover_mappings(args) -> int:
    from pyspark.sql import functions as F

    from yckg_spark.operators.mapping_discovery import (
        discover_category_mappings,
        evaluate_mappings,
        grouped_mappings,
    )

    spark = _spark(args)
    cats = spark.read.parquet(args.categories).select(
        F.col(args.category_col).alias("category")
    )
    types = spark.read.parquet(args.types).select(F.col(args.label_col).alias("label"))
    m = discover_category_mappings(cats, types, threshold=args.threshold)
    grouped_mappings(m).write.mode("overwrite").parquet(args.output)
    out = {"mappings": m.count(), "output": args.output}
    if args.ground_truth:
        gt = spark.read.parquet(args.ground_truth)
        row = evaluate_mappings(m, gt).collect()[0]
        out["evaluation"] = {
            "n_gt": row["n_gt"], "n_pred": row["n_pred"], "tp": row["tp"],
            "precision": row["precision"], "recall": row["recall"],
        }
    print(json.dumps(out))
    return 0


def cmd_chunk(args) -> int:
    """Fixed-window training chunking pass, downstream of `select`: split
    each document into --chunk-tokens-wide windows sliding by
    chunk_tokens - overlap (one row per chunk), mint a globally unique,
    (doc, chunk)-order-preserving chunk key cid = doc_id * stride +
    chunk_id (stride = max chunks per doc + 1, from one narrow agg), and
    optionally shard-pack the chunks under a token budget with the same
    two-phase prefix sum `select` uses — the partitionBy(shard) layout a
    tokenizer/loader consumes. Chunking itself adds no exchange; counts
    ride the write as Observations so the store is never re-read."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from yckg_spark.operators.dedup import normalize_text
    from yckg_spark.operators.selection import chunk_docs, pack_shards

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    chunks = chunk_docs(
        docs, args.chunk_tokens, overlap=args.overlap,
        text_col=args.text_col, id_col=args.id_col,
    )
    # stride from the docs' max token count — the same max(chunk_id)+1 the
    # chunk frame would yield, without materializing every slice twice
    step = args.chunk_tokens - args.overlap
    max_n, max_id = docs.agg(
        F.max(F.size(F.split(normalize_text(F.col(args.text_col)), " "))),
        F.max(F.col(args.id_col)),
    ).first()
    stride = (max(max_n - 1, 0) // step + 1) if max_n is not None else 1
    if max_id is not None and int(max_id) > (2**63 - 1) // stride:
        # cid = id*stride + chunk_id must not wrap 64-bit arithmetic
        # (Spark does not error on long overflow outside ANSI mode, it
        # wraps — two docs could then silently collide on cid)
        print(json.dumps({"error": "doc ids too large for cid minting "
                                   f"(max id {max_id} x stride {stride} "
                                   "overflows long); pre-map ids to a "
                                   "dense range first"}))
        return 2
    chunks = chunks.withColumn(
        "cid", F.col(args.id_col) * F.lit(stride) + F.col("chunk_id")
    )
    packed = args.pack_budget is not None
    if packed:
        shards = pack_shards(
            chunks, budget=args.pack_budget, id_col="cid",
            tokens_col="n_tokens", n_buckets=args.n_buckets,
        )
        chunks = chunks.join(shards.select("cid", "shard"), on="cid")
    obs = Observation()
    writer = chunks.observe(
        obs,
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.max(F.col("shard") if packed else F.lit(0)).alias("max_shard"),
    ).write.mode("overwrite")
    if packed:
        writer = writer.partitionBy("shard")
    writer.parquet(args.output)
    n_chunks = obs.get["n_chunks"]
    print(json.dumps({
        "docs_in": docs.count(), "n_chunks": n_chunks,
        "n_tokens": obs.get["n_tokens"],
        "chunk_tokens": args.chunk_tokens, "overlap": args.overlap,
        "n_shards": (obs.get["max_shard"] + 1) if packed and n_chunks else None,
        "seconds": round(time.time() - t0, 3), "output": args.output,
    }))
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="yckg", description=__doc__)
    p.add_argument("--master", default=None, help="override spark master (default: env/local)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the KG (resumable)")
    b.add_argument("--input", required=True, help="web_pages parquet path or table")
    b.add_argument("--output", required=True, help="triple-store output dir")
    b.add_argument("--n-buckets", type=int, default=8)
    b.add_argument("--skip-extraction", action="store_true", help="trust the text column")
    b.add_argument("--buckets", default=None,
                   help="comma-separated bucket ids this process handles (worker sharding)")
    b.set_defaults(fn=cmd_build)

    bz = sub.add_parser("bucketize", help="rewrite corpus bucket-partitioned by hash(url)")
    bz.add_argument("--input", required=True, help="web_pages parquet path or table")
    bz.add_argument("--output", required=True, help="bucket-partitioned output dir")
    bz.add_argument("--n-buckets", type=int, default=8)
    bz.set_defaults(fn=cmd_bucketize)

    e = sub.add_parser("export-nt", help="gzip N-Triples export")
    e.add_argument("--input", required=True, help="built triple-store dir")
    e.add_argument("--output", required=True)
    e.set_defaults(fn=cmd_export_nt)

    sn = sub.add_parser("snapshots", help="commit lineage (snapshot metadata table)")
    sn.add_argument("--input", required=True, help="built triple-store dir")
    sn.set_defaults(fn=cmd_snapshots)

    vc = sub.add_parser("vacuum", help="delete orphan (uncommitted) bucket dirs")
    vc.add_argument("--input", required=True, help="built triple-store dir")
    vc.set_defaults(fn=cmd_vacuum)

    cp = sub.add_parser("compact", help="global dedup + canonical store re-layout")
    cp.add_argument("--input", required=True, help="dir containing a triples/ output")
    cp.add_argument("--output", required=True)
    cp.add_argument("--n-buckets", type=int, default=8)
    cp.set_defaults(fn=cmd_compact)

    s = sub.add_parser("synth", help="deterministic synthetic web_pages corpus")
    s.add_argument("--output", required=True)
    s.add_argument("--n-business", type=int, default=200)
    s.add_argument("--seed", type=int, default=7)
    s.set_defaults(fn=cmd_synth)

    q = sub.add_parser("query", help="run a competency question or SPARQL text")
    q.add_argument("--input", required=True, help="built triple-store dir or N-Triples dump")
    q.add_argument("--input-format", choices=["store", "nt"], default="store",
                   help="'nt' reads an N-Triples text/.gz dump (e.g. the reference's)")
    q.add_argument("--cq", default=None, help="cq1..cq16")
    q.add_argument("--sparql", default=None,
                   help="SPARQL BGP-subset query text (compiled to Spark SQL)")
    q.add_argument("--sparql-file", default=None, help="file holding SPARQL text")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--as-of-sequence", type=int, default=None,
                   help="time-travel: read the store as of this commit sequence")
    q.add_argument("--as-of-timestamp-ms", type=int, default=None,
                   help="time-travel: read the store as of this epoch-ms commit time")
    q.set_defaults(fn=cmd_query)

    st = sub.add_parser("stream", help="incremental build from a landing dir")
    st.add_argument("--input", required=True, help="landing dir of web_pages parquet files")
    st.add_argument("--output", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--skip-extraction", action="store_true")
    st.add_argument("--follow", action="store_true",
                    help="keep tailing instead of drain-and-stop")
    st.set_defaults(fn=cmd_stream)

    dd = sub.add_parser("dedup", help="document dedup: pairs -> components -> keep-one")
    dd.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    dd.add_argument("--output", required=True, help="deduped parquet output dir")
    dd.add_argument("--method", choices=["exact", "minhash", "simhash"], default="minhash")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--threshold", type=float, default=0.8,
                    help="minhash: estimated-Jaccard keep threshold")
    dd.add_argument("--max-hamming", type=int, default=3,
                    help="simhash: max fingerprint hamming distance")
    dd.add_argument("--checkpoint-dir", default=None,
                    help="reliable checkpoint dir for the components loop "
                         "(survives executor loss; default: localCheckpoint)")
    dd.add_argument("--against", default=None, metavar="CORPUS",
                    help="incremental mode: exact-dedup the input batch "
                         "against this existing corpus parquet (overrides "
                         "--method; batch rows whose normalized text exists "
                         "in the corpus are dropped, min-id within batch)")
    dd.add_argument("--keep-best", default=None, metavar="SCORE_COL",
                    help="minhash/simhash: keep the max-SCORE_COL member "
                         "per near-dup component (ties -> min id) instead "
                         "of the min-id representative")
    dd.set_defaults(fn=cmd_dedup)

    cu = sub.add_parser("curate", help="quality/repetition filter + decontaminate + PII scrub")
    cu.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    cu.add_argument("--output", required=True, help="curated parquet output dir")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--min-quality", type=float, default=0.0)
    cu.add_argument("--max-dup-word-frac", type=float, default=1.0)
    cu.add_argument("--max-top2gram-frac", type=float, default=1.0)
    cu.add_argument("--benchmark", default=None,
                    help="benchmark parquet; drop docs sharing any word n-gram with it")
    cu.add_argument("--bench-text-col", default=None,
                    help="benchmark text column (default: --text-col)")
    cu.add_argument("--ngram", type=int, default=8,
                    help="decontamination n-gram width")
    cu.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/IPs/phones in the output text")
    cu.add_argument("--dedup-spans", type=int, default=None, metavar="MIN_DOCS",
                    help="REMOVE every token inside a word --span-k-gram "
                         "appearing verbatim in >= MIN_DOCS documents "
                         "(substring-level dedup), after --dedup-lines and "
                         "before scoring")
    cu.add_argument("--max-dup-span-frac", type=float, default=None,
                    help="drop docs whose fraction of word --span-k-grams "
                         "shared verbatim with other documents exceeds this")
    cu.add_argument("--span-k", type=int, default=8,
                    help="gram width for --dedup-spans and "
                         "--max-dup-span-frac")
    cu.add_argument("--dedup-lines", type=int, default=None, metavar="MIN_DOCS",
                    help="drop lines appearing verbatim in >= MIN_DOCS "
                         "documents (CCNet-style boilerplate removal), "
                         "before scoring")
    cu.add_argument("--dedup-urls", action="store_true",
                    help="canonicalize --url-col and keep one doc per "
                         "canonical URL (largest --url-order-col wins)")
    cu.add_argument("--url-col", default="url")
    cu.add_argument("--url-order-col", default="n_chars")
    cu.set_defaults(fn=cmd_curate)

    se = sub.add_parser(
        "select", help="line-clean + stratified-sample + source-cap + shard-pack"
    )
    se.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    se.add_argument("--output", required=True, help="selected parquet output dir")
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--text-col", default="text")
    se.add_argument("--line-min-words", type=int, default=None,
                    help="enable C4-style line filter: min words per kept line")
    se.add_argument("--banned", default="javascript,lorem ipsum,{",
                    help="comma-separated substrings that drop a line")
    se.add_argument("--sample-rates", default=None,
                    help="per-stratum keep rates, e.g. 'en=0.6,de=0.3' "
                         "(unlisted strata are dropped)")
    se.add_argument("--strata-col", default="lang")
    se.add_argument("--salt", default="", help="independent re-draw key")
    se.add_argument("--cap", type=int, default=None,
                    help="keep at most this many docs per --cap-by group")
    se.add_argument("--cap-by", default="source")
    se.add_argument("--cap-order", default="n_chars",
                    help="prefer the highest values of this column under the cap")
    se.add_argument("--pack-budget", type=int, default=None,
                    help="pack docs into shards of at most this many tokens; "
                         "output is partitioned by shard")
    se.add_argument("--n-buckets", type=int, default=64,
                    help="prefix-sum range buckets for packing")
    se.set_defaults(fn=cmd_select)

    ch = sub.add_parser(
        "chunk", help="fixed-window training chunking + optional shard packing"
    )
    ch.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ch.add_argument("--output", required=True, help="chunk parquet output dir")
    ch.add_argument("--id-col", default="doc_id")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--chunk-tokens", type=int, required=True,
                    help="window width in whitespace tokens")
    ch.add_argument("--overlap", type=int, default=0,
                    help="tokens shared between consecutive chunks")
    ch.add_argument("--pack-budget", type=int, default=None,
                    help="also shard-pack the chunks under this token "
                         "budget (output laid out partitionBy(shard))")
    ch.add_argument("--n-buckets", type=int, default=64,
                    help="prefix-sum range buckets for packing")
    ch.set_defaults(fn=cmd_chunk)

    lk = sub.add_parser("link", help="Wikidata entity linking + location triples")
    lk.add_argument("--input", required=True, help="web_pages parquet path or table")
    lk.add_argument("--snapshots", required=True,
                    help="dir of Wikidata snapshot parquet tables")
    lk.add_argument("--output", required=True,
                    help="output dir (triples/ + link_manifest.json)")
    lk.add_argument("--skip-extraction", action="store_true", help="trust the text column")
    lk.set_defaults(fn=cmd_link)

    sc = sub.add_parser("stats", help="corpus report card (one JSON line)")
    sc.add_argument("--input", required=True, help="documents parquet")
    sc.add_argument("--id-col", default="doc_id")
    sc.add_argument("--text-col", default="text")
    sc.add_argument("--lang-col", default="lang")
    sc.add_argument("--source-col", default="source")
    sc.add_argument("--top-sources", type=int, default=20)
    sc.set_defaults(fn=cmd_stats)

    dm = sub.add_parser("discover-mappings", help="offline category->schema discovery")
    dm.add_argument("--categories", required=True, help="parquet with a category column")
    dm.add_argument("--category-col", default="category")
    dm.add_argument("--types", required=True, help="parquet of schema.org types")
    dm.add_argument("--label-col", default="label")
    dm.add_argument("--threshold", type=float, default=0.4)
    dm.add_argument("--ground-truth", default=None,
                    help="parquet of verified (category, schema_type) pairs; "
                         "adds precision/recall to the output JSON")
    dm.add_argument("--output", required=True)
    dm.set_defaults(fn=cmd_discover_mappings)
    return p


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
