"""Temporal/graph/text-stats stretch: as-of join, sessionization, PageRank,
TF-IDF, and LM scoring at ~100x the correctness-test scale, with known
answers. Same methodology as run_curation_stretch.py: synthesize the large
input deterministically (no external data) so every check is exact.

  * sessionize, 5M events (50k users x 100): per user, events arrive in
    bursts of 5 ten minutes apart, bursts a day apart -> EVERY user has
    exactly 20 sessions of exactly 5 events;
  * asof_join, 5M events: per user, minute-spaced alternating click /
    purchase; the as-of click for every purchase is exactly the previous
    event id (and the first purchase of each user matches nothing) ->
    n_null == n_users and every matched id-delta == 1;
  * pagerank: (a) 2M-node ring (i -> i+1 mod N) — the rank vector is
    EXACTLY uniform, max-min must be < 1e-12; (b) 2M-node double modular
    graph (7i+3, 13i+1) for the skewed timing run — no dangling nodes, so
    total mass must stay 1 within 1e-6 even without redistribution;
  * tfidf_top_terms, 500k docs (100 identical replicas per sf0.1 doc with
    distinct ids): n_docs and every doc_freq scale by exactly 100, so idf —
    and therefore every (term, tfidf, rank) row — is invariant: the
    distinct per-base-doc result set must equal the base result exactly;
  * lm_score, 500k docs: replicas of the same base doc must all get the
    same (n_tokens, avg_logprob, ppl) — one distinct stat triple per base
    doc;
  * link_prediction, 2M-node ring+2: every pair at ring distance 3 shares
    exactly the 2 middles between them (aa = 2/ln 4), distance 4 exactly 1
    (aa = 1/ln 4) -> exactly N rows of each kind, nothing else;
  * bm25_topk, 500k docs: replicas share (tf, dl) so each base doc's
    replicas carry ONE exact score; the top-1000 is complete 100-replica
    groups with at most one partial group at the cut;
  * mixture_sample, 500k docs x 8 strata: binding stratum keeps all,
    every stratum within 5 sigma of its computed rate;
  * host_stats, 500k synthesized URLs: exactly 1000 hosts x 500 docs x
    250 distinct paths each.

Writes BENCH/temporal_graph_stretch.json.

Usage: python BENCH/run_temporal_graph_stretch.py [--users 50000] [--reps 2]
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
WORK = "/dev/shm/yckg-temporal-stretch"
EVENTS_PER_USER = 100  # bursts of 5, 10 min apart in-burst, 1 day between


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
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from yckg_spark.operators.graph import pagerank
    from yckg_spark.operators.temporal import asof_join, sessionize
    from yckg_spark.operators.text_analysis import (
        lm_score,
        lm_train_unigram,
        tfidf_top_terms,
    )
    from yckg_spark.session import get_spark

    spark = get_spark(
        "yckg-temporal-stretch", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    checks: dict[str, bool] = {}
    samples: dict[str, list[float]] = {}
    out: dict = {
        "users": args.users, "events": args.users * EVENTS_PER_USER,
        "nodes": args.nodes, "replicas": args.replicas, "cpus": int(CPUS),
    }

    # ---- synthesize the event stream (many splits, like a real ingest)
    t0 = time.time()
    j = F.col("j")
    ev = (
        spark.range(args.users).withColumnRenamed("id", "user_id")
        .select("user_id", F.explode(F.sequence(F.lit(0), F.lit(EVENTS_PER_USER - 1))).alias("j"))
        .select(
            (F.col("user_id") * EVENTS_PER_USER + j).alias("event_id"),
            "user_id", "j",
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(
                    days=(j / 5).cast("int"),
                    secs=((j % 5) * 600).cast("double"),
                )
            ).alias("ts"),
            F.when(j % 2 == 0, F.lit("purchase")).otherwise(F.lit("click")).alias("event_type"),
        )
    )
    ev.repartition(int(CPUS)).write.parquet(f"{WORK}/events")
    events = spark.read.parquet(f"{WORK}/events")
    n_events = events.count()
    out["synth_events_s"] = round(time.time() - t0, 3)

    # ---- sessionize: exactly 20 sessions of 5 per user
    sess = timed(
        samples, "sessionize",
        lambda: sessionize(events, key="user_id", ts="ts", gap_seconds=1800)
        .groupBy("session_id").agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.min("n").alias("min_n"), F.max("n").alias("max_n"),
        ).collect()[0],
        args.reps,
    )
    checks["sessionize_20x5_per_user"] = (
        sess["n_sessions"] == args.users * (EVENTS_PER_USER // 5)
        and sess["min_n"] == 5 and sess["max_n"] == 5
    )

    # ---- as-of join: previous-event identity
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    asof = timed(
        samples, "asof_join",
        lambda: asof_join(
            purchases, clicks, key="user_id", ts="ts",
            right_cols=["event_id"], tiebreak="event_id",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("asof_event_id").isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(
                F.when(
                    F.col("asof_event_id").isNotNull(),
                    F.col("event_id") - F.col("asof_event_id"),
                )
            ).alias("delta_sum"),
        ).collect()[0],
        args.reps,
    )
    n_purch = args.users * (EVENTS_PER_USER // 2)
    checks["asof_prev_event_identity"] = (
        asof["n"] == n_purch
        and asof["n_null"] == args.users
        and asof["delta_sum"] == (n_purch - args.users)
    )

    # ---- funnel: first click is j=1 (t=600 s), first purchase strictly
    # after it is j=2 (t=1200 s) for EVERY user — both stages complete
    # and the hop is exactly 600 s across all 50k users
    from yckg_spark.operators.temporal import funnel

    fun = timed(
        samples, "funnel",
        lambda: funnel(events, ["click", "purchase"]).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_completed").alias("min_done"),
            F.max("n_completed").alias("max_done"),
            F.min(F.col("ts_purchase").cast("long") - F.col("ts_click").cast("long")).alias("d_min"),
            F.max(F.col("ts_purchase").cast("long") - F.col("ts_click").cast("long")).alias("d_max"),
        ).collect()[0],
        args.reps,
    )
    checks["funnel_all_users_complete_600s_hop"] = (
        fun["n"] == args.users
        and fun["min_done"] == fun["max_done"] == 2
        and fun["d_min"] == fun["d_max"] == 600
    )

    # ---- cohort retention: every user is active on days 0..19 from
    # Monday 2024-01-01, so there is ONE cohort with exactly three weekly
    # cells (days 0-6, 7-13, 14-19), each counting every user
    from yckg_spark.operators.temporal import cohort_retention

    coh = timed(
        samples, "cohort_retention",
        lambda: cohort_retention(events).agg(
            F.count(F.lit(1)).alias("cells"),
            F.min("n_users").alias("lo"),
            F.max("n_users").alias("hi"),
            F.max("week_n").alias("max_w"),
        ).collect()[0],
        args.reps,
    )
    checks["cohort_one_cohort_three_full_weeks"] = (
        coh["cells"] == 3
        and coh["lo"] == coh["hi"] == args.users
        and coh["max_w"] == 2
    )

    # ---- pagerank (a): ring -> exactly uniform ranks
    ring = spark.range(args.nodes).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % args.nodes).alias("dst")
    )
    pr_ring = timed(
        samples, "pagerank_ring_3iter",
        lambda: pagerank(ring, n_iter=3, redistribute_dangling=False)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("rank").alias("mn"), F.max("rank").alias("mx"),
        ).collect()[0],
        args.reps,
    )
    checks["pagerank_ring_uniform"] = (
        pr_ring["n"] == args.nodes and (pr_ring["mx"] - pr_ring["mn"]) < 1e-12
    )

    # ---- pagerank (b): skewed modular graph, mass conservation
    base_ids = spark.range(args.nodes)
    mod_edges = base_ids.select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % args.nodes).alias("dst")
    ).union(
        base_ids.select(
            F.col("id").alias("src"), ((F.col("id") * 13 + 1) % args.nodes).alias("dst")
        )
    ).distinct()
    pr_mod = timed(
        samples, "pagerank_modular_3iter",
        lambda: pagerank(mod_edges, n_iter=3, redistribute_dangling=False)
        .agg(F.sum("rank").alias("mass"), F.count(F.lit(1)).alias("n")).collect()[0],
        args.reps,
    )
    checks["pagerank_modular_mass_conserved"] = (
        pr_mod["n"] == args.nodes and abs(pr_mod["mass"] - 1.0) < 1e-6
    )

    # ---- triangle counting on the 2M-node ring+chord graph (i -> i+1,
    # i -> i+2 mod N): every consecutive triple closes a triangle, so
    # every node is a member of EXACTLY 3 triangles
    from yckg_spark.operators.graph import triangle_count

    ring_chord = (
        spark.range(args.nodes).select(
            F.col("id").alias("src"), ((F.col("id") + 1) % args.nodes).alias("dst")
        )
        .union(
            spark.range(args.nodes).select(
                F.col("id").alias("src"),
                ((F.col("id") + 2) % args.nodes).alias("dst"),
            )
        )
        .repartition(int(CPUS))
    )
    tc = timed(
        samples, "triangle_count",
        lambda: triangle_count(ring_chord).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_triangles").alias("lo"),
            F.max("n_triangles").alias("hi"),
        ).collect()[0],
        args.reps,
    )
    checks["triangles_exactly_3_per_node"] = (
        tc["n"] == args.nodes and tc["lo"] == tc["hi"] == 3
    )

    # ---- link prediction on the same 2M-node ring+2 graph: every node
    # pair at ring distance 3 shares EXACTLY the two middles between them
    # (aa = 2/ln 4), every pair at distance 4 exactly one (aa = 1/ln 4),
    # nothing else is unlinked with a common neighbor -> exactly N rows of
    # each kind
    import math

    from yckg_spark.operators.graph import link_prediction

    lp = timed(
        samples, "link_prediction",
        lambda: link_prediction(ring_chord)
        .groupBy("n_common")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("adamic_adar").alias("lo"),
            F.max("adamic_adar").alias("hi"),
        ).collect(),
        args.reps,
    )
    by_common = {r["n_common"]: r for r in lp}
    aa1, aa2 = round(1 / math.log(4), 6), round(2 / math.log(4), 6)
    checks["linkpred_ring_exact_distance_3_and_4"] = (
        set(by_common) == {1, 2}
        and by_common[1]["n_pairs"] == args.nodes
        and by_common[2]["n_pairs"] == args.nodes
        and by_common[1]["lo"] == by_common[1]["hi"] == aa1
        and by_common[2]["lo"] == by_common[2]["hi"] == aa2
    )

    # ---- replicate sf0.1 documents 100x for tfidf / lm invariants
    t0 = time.time()
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    rep = F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("rep")
    big = base.select("*", rep).withColumn(
        "doc_id", F.col("doc_id") * args.replicas + F.col("rep")
    ).drop("rep")
    big.repartition(int(CPUS)).write.parquet(f"{WORK}/docs")
    docs = spark.read.parquet(f"{WORK}/docs")
    n_docs = docs.count()
    out["synth_docs_s"] = round(time.time() - t0, 3)

    # tfidf: distinct per-base-doc rows == exact base result
    base_rows = tfidf_top_terms(base, k=3)
    def tfidf_stretched():
        return (
            tfidf_top_terms(docs, k=3)
            .select(
                (F.col("doc_id") / args.replicas).cast("bigint").alias("doc_id"),
                "term", "tfidf", "rank",
            ).distinct()
        )

    timed(samples, "tfidf_top3", lambda: tfidf_stretched().count(), args.reps)
    stretched = tfidf_stretched()
    diff = (
        stretched.exceptAll(base_rows).count() + base_rows.exceptAll(stretched).count()
    )
    checks["tfidf_idf_invariant_under_replication"] = diff == 0

    # lm: one distinct stat triple per base doc
    counts = lm_train_unigram(docs)
    lm_stats = timed(
        samples, "lm_train_and_score",
        lambda: lm_score(docs, counts)
        .select(
            (F.col("doc_id") / args.replicas).cast("bigint").alias("base_id"),
            "n_tokens", "avg_logprob", "ppl",
        ).distinct()
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.countDistinct("base_id").alias("n_base"),
        ).collect()[0],
        args.reps,
    )
    checks["lm_replica_consistent"] = (
        lm_stats["n_distinct"] == n_base and lm_stats["n_base"] == n_base
    )

    # ---- bm25 over the 500k replicated docs: replicas share (tf, dl) and
    # idf/avgdl are corpus-level, so every replica of a base doc gets ONE
    # exact score; ordering is (score desc, id asc) and replica ids of a
    # base doc are consecutive, so the top-k consists of complete
    # 100-replica groups with a single partial group only at the k cut
    from yckg_spark.operators.text_analysis import bm25_topk

    k_lp = 10 * args.replicas
    bm = timed(
        samples, "bm25_top1000",
        lambda: bm25_topk(docs, ["spark", "merge", "vector"], k=k_lp)
        .select((F.col("doc_id") / args.replicas).cast("bigint").alias("base_id"),
                "bm25")
        .groupBy("base_id")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("bm25").alias("n_scores"))
        .collect(),
        args.reps,
    )
    n_partial = sum(1 for r in bm if r["n"] != args.replicas)
    checks["bm25_replica_groups_single_score"] = all(r["n_scores"] == 1 for r in bm)
    checks["bm25_topk_cuts_at_most_one_group"] = (
        sum(r["n"] for r in bm) == k_lp and n_partial <= 1
    )

    # ---- mixture_sample over the 500k docs (8 synthetic strata, weight =
    # text length): the binding stratum keeps every doc; every stratum's
    # kept fraction lands within 5 sigma of its computed rate; the draw is
    # exactly reproducible
    from yckg_spark.operators.selection import mixture_sample

    sdocs = docs.select(
        "doc_id", F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string")).alias("source"),
        F.length("text").alias("n_chars"),
    )
    targets = {"s0": 0.30, "s1": 0.20, "s2": 0.20, "s3": 0.30}
    mx = timed(
        samples, "mixture_sample",
        lambda: mixture_sample(sdocs, targets, weight_col="n_chars")
        .groupBy("source").agg(F.count(F.lit(1)).alias("kept")).collect(),
        args.reps,
    )
    kept = {r["source"]: r["kept"] for r in mx}
    in_src = {r["source"]: r["n"] for r in
              sdocs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    w = {r["source"]: r["w"] for r in
         sdocs.groupBy("source").agg(F.sum("n_chars").alias("w")).collect()}
    lam = min(w[s] / t for s, t in targets.items())
    ok = set(kept) == set(targets)
    for s, t in targets.items():
        rate = min(1.0, lam * t / w[s])
        sigma = (in_src[s] * rate * (1 - rate)) ** 0.5
        ok = ok and abs(kept[s] - in_src[s] * rate) <= max(5 * sigma, 1)
    binding = min(targets, key=lambda s: w[s] / targets[s])
    checks["mixture_binding_keeps_all_others_in_5sigma"] = (
        ok and kept[binding] == in_src[binding]
    )

    # ---- host_stats over 500k synthesized URLs: host = id % 1000 (500
    # docs each), path index = (id // 1000) % 250 -> EXACTLY 250 distinct
    # paths per host
    from yckg_spark.operators.urls import host_stats

    n_hosts, n_paths_per_host = 1000, 250
    urls = spark.range(args.replicas * n_base).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % n_hosts).cast("string"),
            F.lit(".example.com/p/"),
            ((F.col("id") / n_hosts).cast("bigint") % n_paths_per_host).cast("string"),
        ).alias("url"),
        (F.col("id") % 91 + 10).alias("n_chars"),
    ).repartition(int(CPUS))
    hs = timed(
        samples, "host_stats",
        lambda: host_stats(urls).agg(
            F.count(F.lit(1)).alias("hosts"),
            F.min("n_docs").alias("d_lo"), F.max("n_docs").alias("d_hi"),
            F.min("n_paths").alias("p_lo"), F.max("n_paths").alias("p_hi"),
        ).collect()[0],
        args.reps,
    )
    docs_per_host = args.replicas * n_base // n_hosts
    checks["host_stats_exact_docs_and_paths_per_host"] = (
        hs["hosts"] == n_hosts
        and hs["d_lo"] == hs["d_hi"] == docs_per_host
        and hs["p_lo"] == hs["p_hi"] == min(n_paths_per_host, docs_per_host)
    )

    mins = {k: min(v) for k, v in samples.items()}
    out.update(
        {
            "n_events": n_events,
            "n_docs": n_docs,
            "n_base_docs": n_base,
            "seconds_min": mins,
            "seconds_all": samples,
            "events_per_s": {
                k: round(n_events / mins[k])
                for k in ("sessionize", "asof_join", "funnel", "cohort_retention")
            },
            "edges_per_s_modular": round(
                mod_edges.count() / mins["pagerank_modular_3iter"]
            ),
            "docs_per_s": {
                k: round(n_docs / mins[k])
                for k in (
                    "tfidf_top3",
                    "lm_train_and_score",
                    "bm25_top1000",
                    "mixture_sample",
                    "host_stats",
                )
            },
            "pairs_per_s_linkpred": round(2 * args.nodes / mins["link_prediction"]),
            "checks": checks,
            "all_checks_pass": all(checks.values()),
        }
    )
    (REPO / "BENCH" / "temporal_graph_stretch.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
