"""Curation-operator stretch: repetition signals, decontamination, and
PII scrubbing at 100x the sf0.1 document count, with known-answer checks.

Same methodology as run_sf1_stretch.py: synthesize a deterministic 100x
corpus FROM the sf0.1 documents table (no external data) — 100 identical
replicas per document with distinct doc_ids — so every answer is known
from the base corpus:

  * repetition_signals: replicas have identical text, so the set of
    distinct (dup_word_frac, top2gram_frac, top3gram_frac) tuples must
    equal the base corpus's;
  * decontaminate (train = replicas of doc_id%5!=0 docs, benchmark = the
    base doc_id%5==0 slice): every replica of a contaminated base doc is
    flagged, so flagged == replicas x base_flagged;
  * pii_scrub over text with one injected email/IP/phone per row:
    sum(n_email) == n_rows (and the same for ipv4/phone);
  * line_dedup over synthesized multi-line text (base word-soup lines +
    one globally unique line per row): every base-derived line recurs in
    all replicas (>= min_docs) and must drop, the unique line must
    survive — so n_kept == 1 for EVERY row and text_deduped ==
    'unique line <id>' exactly;
  * url_canonicalize / url_dedup over the driver entry's messy-URL
    synthesis: doc_id mod (4, 7, 25) are coprime, so at 100x scale every
    (branch, host, page) combination occurs and the canonical-URL space
    is exactly 3*7*25 = 525 groups; url_dedup's (groupBy + max_by)
    winners must equal an independent window-ranked derivation, and
    n_dups must sum to n_rows.

Each operator is timed (min of --reps interleaved) and the check is
recorded. Writes BENCH/curation_stretch.json.

Usage: python BENCH/run_curation_stretch.py [--replicas 100] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(REPO))

os.environ.setdefault("YCKG_LOCAL_DIR", "/dev/shm/spark-local")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WORK = "/dev/shm/yckg-curation-stretch"


def timed(samples: dict, name: str, fn, reps: int):
    result = None
    for _ in range(reps):
        t0 = time.time()
        result = fn()
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from yckg_spark.operators.curation import decontaminate, pii_scrub, repetition_signals
    from yckg_spark.session import get_spark

    spark = get_spark(
        "yckg-curation-stretch", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()

    # ---- materialize the 100x corpus (input prep, timed separately)
    t0 = time.time()
    rep = F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("rep")
    big = base.select("*", rep).withColumn(
        "doc_id", F.col("doc_id") * args.replicas + F.col("rep")
    ).drop("rep")
    # injected PII mirrors the driver entry's pii_scrub oracle shape
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1 tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    did = F.col("doc_id").cast("string")
    text_lines = F.concat(
        F.replace(F.col("text"), F.lit(" value "), F.lit("\n")),
        F.lit("\nunique line "), did,
        F.lit("\nboilerplate footer "), (F.col("doc_id") % 3).cast("string"),
    )
    host_n = (F.col("doc_id") % 7).cast("string")
    page_n = (F.col("doc_id") % 25).cast("string")
    messy_url = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(
            F.lit("HTTP://WWW.Example"), host_n, F.lit(".COM:80/page/"),
            page_n, F.lit("/?utm_source=feed&b=2&a=1")))
        .when(F.col("doc_id") % 4 == 1, F.concat(
            F.lit("https://www.example"), host_n, F.lit(".com:443/page/"),
            page_n, F.lit("?a=1&b=2&fbclid=IwAR"), did))
        .when(F.col("doc_id") % 4 == 2, F.concat(
            F.lit("http://www.example"), host_n, F.lit(".com/page/"),
            page_n, F.lit("?b=2&a=1#section-"), did))
        .otherwise(F.concat(
            F.lit("https://www.EXAMPLE"), host_n, F.lit(".com/page/"),
            page_n, F.lit("/")))
    )
    # a real 100-TB corpus arrives as many splits; a single synthetic file
    # would serialize the scan (one task) and measure nothing
    big.withColumns(
        {"text_pii": injected, "text_lines": text_lines, "url": messy_url}
    ).repartition(int(CPUS)).write.parquet(f"{WORK}/docs")
    synth_s = round(time.time() - t0, 3)
    docs = spark.read.parquet(f"{WORK}/docs")
    n_rows = docs.count()

    # ---- base-corpus known answers (cheap, small data)
    base_signature_count = (
        repetition_signals(base).select("dup_word_frac", "top2gram_frac", "top3gram_frac")
        .distinct().count()
    )
    bench = base.filter(F.col("doc_id") % 5 == 0)
    base_flagged = decontaminate(
        base.filter(F.col("doc_id") % 5 != 0), bench, n=8
    ).count()

    samples: dict[str, list[float]] = {}
    checks: dict[str, bool] = {}

    # replica doc_id = base_id*R + k, so base doc_id%5!=0 <=> floor(id/R)%5!=0
    train = docs.filter((F.col("doc_id") / args.replicas).cast("long") % 5 != 0)

    sig_distinct = timed(
        samples, "repetition_signals",
        lambda: repetition_signals(docs)
        .select("dup_word_frac", "top2gram_frac", "top3gram_frac").distinct().count(),
        args.reps,
    )
    checks["repetition_signature_set_invariant"] = sig_distinct == base_signature_count

    flagged = timed(
        samples, "decontaminate",
        lambda: decontaminate(train, bench, n=8).count(), args.reps,
    )
    checks["decontaminate_flags_every_replica"] = flagged == args.replicas * base_flagged

    agg = timed(
        samples, "pii_scrub",
        lambda: pii_scrub(docs, text_col="text_pii")
        .agg(
            F.sum("n_email").alias("e"),
            F.sum("n_ipv4").alias("i"),
            F.sum("n_phone").alias("p"),
        ).collect()[0],
        args.reps,
    )
    checks["pii_one_of_each_per_row"] = (agg["e"], agg["i"], agg["p"]) == (n_rows,) * 3

    from yckg_spark.operators.curation import line_dedup
    from yckg_spark.operators.urls import canonicalize_url, url_dedup

    ld = timed(
        samples, "line_dedup",
        lambda: line_dedup(docs, text_col="text_lines")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_kept").alias("kept"),
            F.sum(
                F.when(
                    F.col("text_deduped")
                    == F.concat(F.lit("unique line "), F.col("doc_id").cast("string")),
                    1,
                ).otherwise(0)
            ).alias("exact"),
        ).collect()[0],
        args.reps,
    )
    checks["line_dedup_exactly_the_unique_line_survives"] = (
        ld["n"], ld["kept"], ld["exact"]
    ) == (n_rows,) * 3

    canon_groups = timed(
        samples, "url_canonicalize",
        lambda: docs.agg(
            F.count_distinct(canonicalize_url(F.col("url"))).alias("g")
        ).collect()[0]["g"],
        args.reps,
    )
    checks["url_canonical_space_is_525"] = canon_groups == 3 * 7 * 25

    winners = timed(
        samples, "url_dedup",
        lambda: {
            r["url_canon"]: (r["keep_id"], r["n_dups"])
            for r in url_dedup(docs).collect()
        },
        args.reps,
    )
    # independent derivation of the same winners via a window rank
    from pyspark.sql import Window

    w = Window.partitionBy("url_canon").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    expected = {
        r["url_canon"]: (r["doc_id"], r["n_dups"])
        for r in docs.select(
            canonicalize_url(F.col("url")).alias("url_canon"), "doc_id", "n_chars"
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(Window.partitionBy("url_canon")))
        .filter(F.col("rn") == 1)
        .collect()
    }
    checks["url_dedup_matches_window_derivation"] = winners == expected
    checks["url_dedup_n_dups_sum_to_rows"] = (
        sum(v[1] for v in winners.values()) == n_rows
    )

    # ---- span-dup stats: with >= 2 identical replicas of every doc,
    # EVERY 8-gram is cross-document-duplicated, so n_dup_grams must equal
    # n_grams on every row and the gram total must scale exactly xR
    from yckg_spark.operators.curation import dup_span_stats

    base_grams = (
        dup_span_stats(base, k=8).agg(F.sum("n_grams")).collect()[0][0]
    )
    sp = timed(
        samples, "dup_span_stats",
        lambda: dup_span_stats(docs, k=8)
        .agg(
            F.sum("n_grams").alias("g"),
            F.sum(F.when(F.col("n_dup_grams") != F.col("n_grams"), 1)
                  .otherwise(0)).alias("bad"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0],
        args.reps,
    )
    checks["span_stats_every_gram_duplicated"] = (
        sp["bad"] == 0 and sp["n"] == n_rows
        and sp["g"] == args.replicas * base_grams
    )

    # ---- span REMOVAL: with >= 2 identical replicas every >=8-token doc
    # is wall-to-wall duplicated spans (n_kept = 0); only docs shorter
    # than one gram keep their tokens — total kept is known exactly
    from yckg_spark.operators.curation import span_dedup

    base_short_tokens = (
        dup_span_stats(base, k=8)
        .filter(F.col("n_grams") == 0)
        .join(base, "doc_id")
        .agg(F.sum(F.size(F.split(F.trim(
            F.regexp_replace(F.lower("text"), r"\s+", " ")), " "))))
        .collect()[0][0]
    ) or 0
    sr = timed(
        samples, "span_dedup",
        lambda: span_dedup(docs, k=8)
        .agg(F.sum("n_kept").alias("kept"), F.count(F.lit(1)).alias("n"))
        .collect()[0],
        args.reps,
    )
    checks["span_removal_leaves_only_subgram_docs"] = (
        sr["n"] == n_rows
        and sr["kept"] == args.replicas * base_short_tokens
    )

    # ---- chunking: chunk count and token total scale exactly xR
    from yckg_spark.operators.selection import chunk_docs

    base_ck = chunk_docs(base, 20, overlap=4).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    ck = timed(
        samples, "chunk_docs",
        lambda: chunk_docs(docs, 20, overlap=4)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))
        .collect()[0],
        args.reps,
    )
    checks["chunk_counts_scale_exactly"] = (
        ck["n"] == args.replicas * base_ck["n"]
        and ck["t"] == args.replicas * base_ck["t"]
    )

    # ---- corpus heavy hitters: the ordered top-20 bigram list is
    # invariant under replication with every count exactly xR (count-desc,
    # gram-asc ordering is preserved by a uniform scale)
    from yckg_spark.operators.text_analysis import top_ngrams

    base_top = [
        (r["gram"], r["n_occurrences"])
        for r in top_ngrams(base, n=2, k=20).collect()
    ]
    big_top = timed(
        samples, "top_ngrams",
        lambda: [
            (r["gram"], r["n_occurrences"])
            for r in top_ngrams(docs, n=2, k=20).collect()
        ],
        args.reps,
    )
    checks["top_ngrams_invariant_counts_scaled"] = big_top == [
        (g, c * args.replicas) for g, c in base_top
    ]

    timings = {name: min(s) for name, s in samples.items()}
    out = {
        "metric": "curation_stretch",
        "sf_base": SF_DIR,
        "replicas": args.replicas,
        "rows": {"base": n_base, "docs": n_rows},
        "synth_s": synth_s,
        "reps": args.reps,
        "seconds": timings,
        "rep_samples": samples,
        "docs_per_sec": {
            name: round(n_rows / t, 1) for name, t in timings.items()
        },
        "known_answers": {
            "base_signature_count": base_signature_count,
            "signature_count_100x": sig_distinct,
            "base_flagged": base_flagged,
            "flagged_100x": flagged,
            "url_canonical_groups": canon_groups,
        },
        "checks": checks,
        "all_checks_pass": all(checks.values()),
        "cpus": int(CPUS),
    }
    with open(REPO / "BENCH" / "curation_stretch.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
