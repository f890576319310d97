"""Round-5 operator stretch: PMI collocations, quality bucketing, the
binned interval join, distributed k-means, and the source-overlap matrix
at ~20-100x the correctness-test scale, with known answers. Same
methodology as the other stretch harnesses: synthesize the large input
deterministically (no external data) so every check is exact.

  * interval_join, users x 120 minute-spaced events: two 10-minute
    windows per user (at minute 0 and minute 60) -> EVERY interval
    contains exactly 10 events, total matches == users * 20;
  * pmi_pairs, sf0.1 documents replicated R times with distinct ids:
    document frequencies, N, and co-occurrence counts all scale by
    exactly R, so every (t_a, t_b) pair survives with n_ab * R and a
    BIT-IDENTICAL pmi (the ratio is unchanged in exact integer->double
    arithmetic) — the replicated result must equal the base result
    modulo the n_ab factor;
  * quality_buckets, the same replicated corpus: per-source ntile tier
    sizes stay exactly-equal (max-min <= 1) at every scale; the
    threshold path (percentile_approx cuts, no per-group sort) lands
    within 10% of n/3 per tier;
  * kmeans_assign, 200k vectors in 8 well-separated blobs (ids 0..7 are
    one vector per blob, so the deterministic smallest-id init seeds
    every blob): after 2 Lloyd's passes EVERY vector must sit in its
    blob's cluster — zero mismatches;
  * source_overlap, 100 sources x 100 fingerprints each, consecutive
    sources sharing exactly 50, x 50 replicas: the matrix must be all
    4950 pairs, exactly 99 of them with n_common == 50 and
    jaccard == round(1/3, 6), everything else zero.

Writes BENCH/r5_ops_stretch.json.

Usage: python BENCH/run_r5_ops_stretch.py [--users 50000] [--replicas 100]
       [--vectors 200000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("YCKG_LOCAL_DIR", "/dev/shm/spark-local")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WORK = "/dev/shm/yckg-r5-stretch"


def timed(samples: dict, name: str, fn, reps: int):
    result = None
    for _ in range(reps):
        t0 = time.time()
        result = fn()
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=50_000)
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from yckg_spark.operators.dedup import source_overlap
    from yckg_spark.operators.selection import quality_buckets
    from yckg_spark.operators.similarity import kmeans_assign
    from yckg_spark.operators.temporal import interval_join
    from yckg_spark.operators.text_analysis import pmi_pairs
    from yckg_spark.session import get_spark

    spark = get_spark(
        "yckg-r5-stretch", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    checks: dict[str, bool] = {}
    samples: dict[str, list[float]] = {}
    out: dict = {
        "users": args.users,
        "events": args.users * 120,
        "replicas": args.replicas,
        "vectors": args.vectors,
        "cpus": int(CPUS),
        "sf_dir": SF_DIR,
    }

    # ---- interval_join: 120 minute-spaced events/user, two 10-min
    # windows (minute 0, minute 60) -> exactly 10 events per interval
    t0 = time.time()
    j = F.col("j")
    ev = (
        spark.range(args.users)
        .withColumnRenamed("id", "user_id")
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(119))).alias("j"),
        )
        .select(
            (F.col("user_id") * 120 + j).alias("event_id"),
            "user_id",
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(secs=(j * 60).cast("double"))
            ).alias("ts"),
        )
    )
    ev.repartition(int(CPUS)).write.parquet(f"{WORK}/events")
    events = spark.read.parquet(f"{WORK}/events")
    n_events = events.count()
    out["synth_events_s"] = round(time.time() - t0, 3)

    iv = events.filter((F.col("event_id") % 120 == 0) | (F.col("event_id") % 120 == 60)).select(
        "user_id",
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end"),
    )
    ij = timed(
        samples,
        "interval_join",
        lambda: interval_join(events, iv, keys=["user_id"], bin_width=600)
        .groupBy("interval_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.min("n").alias("min_n"),
            F.max("n").alias("max_n"),
            F.sum("n").alias("total"),
        )
        .collect()[0],
        args.reps,
    )
    checks["interval_join_exactly_10_per_window"] = (
        ij["n_intervals"] == args.users * 2
        and ij["min_n"] == 10
        and ij["max_n"] == 10
        and ij["total"] == args.users * 20
    )

    # ---- replicated documents corpus (distinct ids, same text/source)
    t0 = time.time()
    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base_docs.count()
    reps_docs = (
        base_docs.select(
            "doc_id",
            "text",
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("r"),
        )
        .select(
            (F.col("doc_id") + F.col("r") * n_base * 10).alias("doc_id"),
            "text",
            "source",
        )
    )
    reps_docs.repartition(int(CPUS)).write.parquet(f"{WORK}/docs")
    big_docs = spark.read.parquet(f"{WORK}/docs")
    n_docs = big_docs.count()
    out["n_docs"] = n_docs
    out["synth_docs_s"] = round(time.time() - t0, 3)

    # ---- pmi_pairs: pmi bit-invariant under replication, n_ab scales R
    base_pmi = {
        (r["t_a"], r["t_b"]): (r["n_ab"], r["pmi"])
        for r in pmi_pairs(base_docs).collect()
    }
    big_pmi_rows = timed(
        samples, "pmi_pairs", lambda: pmi_pairs(big_docs).collect(), args.reps
    )
    big_pmi = {(r["t_a"], r["t_b"]): (r["n_ab"], r["pmi"]) for r in big_pmi_rows}
    checks["pmi_invariant_under_replication"] = set(big_pmi) == set(base_pmi) and all(
        big_pmi[k] == (base_pmi[k][0] * args.replicas, base_pmi[k][1])
        for k in base_pmi
    )
    out["pmi_pairs_rows"] = len(big_pmi)

    # ---- inverted_index: per-term document frequency scales by exactly
    # R under replication; truncation keeps every posting list <= cap
    from yckg_spark.operators.text_analysis import inverted_index

    base_ii = {
        r["term"]: r["df_t"] for r in inverted_index(base_docs, max_postings=20).collect()
    }
    big_ii = timed(
        samples,
        "inverted_index",
        lambda: inverted_index(big_docs, max_postings=20).collect(),
        args.reps,
    )
    checks["inverted_index_df_scales_exactly"] = {
        r["term"]: r["df_t"] for r in big_ii
    } == {t: n * args.replicas for t, n in base_ii.items()} and all(
        r["postings"].count(",") <= 19 for r in big_ii
    )
    out["inverted_index_terms"] = len(big_ii)

    # ---- quality_buckets: rank tiers exactly equal; threshold near n/3
    qb = timed(
        samples,
        "quality_buckets_rank",
        lambda: quality_buckets(big_docs)
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("source")
        .agg(
            F.max("n").alias("mx"),
            F.min("n").alias("mn"),
            F.sum("n").alias("total"),
        )
        .agg(
            F.max(F.col("mx") - F.col("mn")).alias("max_spread"),
            F.min("total").alias("min_total"),
            F.count(F.lit(1)).alias("n_sources"),
        )
        .collect()[0],
        args.reps,
    )
    checks["quality_rank_tiers_exactly_equal"] = qb["max_spread"] <= 1
    qt = timed(
        samples,
        "quality_buckets_threshold",
        lambda: quality_buckets(big_docs, by="threshold")
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect(),
        args.reps,
    )
    per_src: dict[str, int] = {}
    for r in qt:
        per_src[r["source"]] = per_src.get(r["source"], 0) + r["n"]
    third = {s: per_src[s] / 3 for s in per_src}
    checks["quality_threshold_within_10pct_of_thirds"] = all(
        abs(r["n"] - third[r["source"]]) <= 0.1 * per_src[r["source"]] for r in qt
    ) and sum(per_src.values()) == n_docs

    # ---- kmeans: 8 well-separated blobs, ids 0..7 seed one blob each
    t0 = time.time()
    vid = F.col("vec_id")
    blob = vid % 8
    vecs = (
        spark.range(args.vectors)
        .withColumnRenamed("id", "vec_id")
        .select(
            "vec_id",
            F.array(
                *(
                    [(blob * 100.0 + ((vid % 97) - 48) * 0.01).cast("float")]
                    + [
                        (((vid * (d + 3)) % 89) * 0.01).cast("float")
                        for d in range(args.dim - 1)
                    ]
                )
            ).alias("embedding"),
        )
    )
    vecs.repartition(int(CPUS)).write.parquet(f"{WORK}/vecs")
    big_vecs = spark.read.parquet(f"{WORK}/vecs")
    out["synth_vecs_s"] = round(time.time() - t0, 3)
    km = timed(
        samples,
        "kmeans_assign",
        lambda: kmeans_assign(big_vecs, k=8, iters=2)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("cluster") != F.col("vec_id") % 8, 1).otherwise(0)
            ).alias("mismatch"),
        )
        .collect()[0],
        args.reps,
    )
    checks["kmeans_blobs_perfectly_recovered"] = (
        km["n"] == args.vectors and km["mismatch"] == 0
    )

    # ---- source_overlap: 100 sources, consecutive pairs share 50 of 100
    t0 = time.time()
    sid = F.col("i") % 100
    tid = (F.col("i") % 100) * 50 + F.floor(F.col("i") / 100) % 100
    so_docs = (
        spark.range(100 * 100 * 50)
        .withColumnRenamed("id", "i")
        .select(
            F.col("i").alias("doc_id"),
            F.format_string("s%03d", sid.cast("int")).alias("source"),
            F.format_string("fingerprint text %d", tid.cast("int")).alias("text"),
        )
    )
    so_docs.repartition(int(CPUS)).write.parquet(f"{WORK}/so_docs")
    big_so = spark.read.parquet(f"{WORK}/so_docs")
    out["synth_overlap_docs_s"] = round(time.time() - t0, 3)
    so = timed(
        samples,
        "source_overlap",
        lambda: source_overlap(big_so).collect(),
        args.reps,
    )
    n_50 = sum(1 for r in so if r["n_common"] == 50)
    n_0 = sum(1 for r in so if r["n_common"] == 0)
    checks["overlap_matrix_exact"] = (
        len(so) == 4950
        and n_50 == 99
        and n_0 == 4851
        and all(
            r["jaccard"] == round(1 / 3, 6)
            for r in so
            if r["n_common"] == 50
        )
        and all(r["n_a"] == 100 and r["n_b"] == 100 for r in so)
    )

    mins = {k: min(v) for k, v in samples.items()}
    out.update(
        {
            "seconds_min": mins,
            "seconds_all": samples,
            "rows_per_s": {
                "interval_join_events": round(n_events / mins["interval_join"]),
                "pmi_docs": round(n_docs / mins["pmi_pairs"]),
                "inverted_index_docs": round(n_docs / mins["inverted_index"]),
                "quality_rank_docs": round(n_docs / mins["quality_buckets_rank"]),
                "quality_threshold_docs": round(
                    n_docs / mins["quality_buckets_threshold"]
                ),
                "kmeans_vectors": round(args.vectors / mins["kmeans_assign"]),
                "overlap_docs": round(100 * 100 * 50 / mins["source_overlap"]),
            },
            "checks": checks,
            "all_checks_pass": all(checks.values()),
        }
    )
    (REPO / "BENCH" / "r5_ops_stretch.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
