"""Selection-operator stretch: stratified sampling, source caps, shard
packing, and line filtering at 100x the sf0.1 document count, with
known-answer checks.

Same methodology as run_curation_stretch.py: synthesize a deterministic
100x corpus FROM the sf0.1 documents table (no external data) — 100
identical replicas per document with distinct doc_ids — so every answer
is known from the base corpus:

  * stratified_sample with {en: 1.0, de: 0.5, fr: 0.0}: the rate-1.0
    stratum keeps every row, the rate-0.0 stratum keeps none, and the
    0.5 stratum lands within 5 sigma of its Bernoulli expectation; a
    second run returns the identical count (determinism at scale);
  * source_cap (cap = min(1000, smallest source), so the cap binds on
    every source): the output is exactly n_sources x cap with exactly
    cap per source;
  * pack_shards(budget=65536): total tokens are conserved, shard ids
    are contiguous from 0, and every shard's token sum sits inside the
    greedy-packing bound [budget - max_doc + 1, budget + max_doc - 1]
    (the last shard only bounded above);
  * line_filter over replica-invariant injected multi-line text: the
    distinct (n_lines, n_kept, md5(text_clean)) signature set equals
    the base corpus's.

Each operator is timed (min of --reps interleaved). Writes
BENCH/selection_stretch.json.

Usage: python BENCH/run_selection_stretch.py [--replicas 100] [--reps 2]
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
WORK = "/dev/shm/yckg-selection-stretch"

RATES = {"en": 1.0, "de": 0.5, "fr": 0.0}
CAP = 1000
BUDGET = 65536


def timed(samples: dict, name: str, fn, reps: int):
    result = None
    for _ in range(reps):
        t0 = time.time()
        result = fn()
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
    return result


def injected_lines(col):
    return F.concat(
        F.replace(col, F.lit(" table "), F.lit("\n")),
        F.lit("\nshort one\nthis line mentions javascript today"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from yckg_spark.operators.selection import (
        line_filter,
        pack_shards,
        source_cap,
        stratified_sample,
        word_count,
    )
    from yckg_spark.session import get_spark

    spark = get_spark(
        "yckg-selection-stretch", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()

    # ---- materialize the 100x corpus (input prep, timed separately);
    # many splits, or the scan serializes (see BENCH/BASELINE.md)
    t0 = time.time()
    rep = F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("rep")
    big = base.select("*", rep).withColumn(
        "doc_id", F.col("doc_id") * args.replicas + F.col("rep")
    ).drop("rep")
    big.repartition(int(CPUS)).write.parquet(f"{WORK}/docs")
    synth_s = round(time.time() - t0, 3)
    docs = spark.read.parquet(f"{WORK}/docs")
    n_rows = docs.count()
    lang_counts = dict(docs.groupBy("lang").count().collect())
    n_sources = docs.select("source").distinct().count()

    samples: dict[str, list[float]] = {}
    checks: dict[str, bool] = {}

    # ---- stratified_sample
    kept = timed(
        samples, "stratified_sample",
        lambda: dict(stratified_sample(docs, RATES).groupBy("lang").count().collect()),
        args.reps,
    )
    again = dict(stratified_sample(docs, RATES).groupBy("lang").count().collect())
    n_de = lang_counts["de"]
    sigma = (0.25 * n_de) ** 0.5
    checks["sample_rate1_keeps_all"] = kept.get("en", 0) == lang_counts["en"]
    checks["sample_rate0_keeps_none"] = "fr" not in kept
    checks["sample_unlisted_dropped"] = not set(kept) - set(RATES)
    checks["sample_rate_half_within_5_sigma"] = abs(kept.get("de", 0) - 0.5 * n_de) < 5 * sigma
    checks["sample_deterministic_rerun"] = kept == again

    # ---- source_cap (cap chosen to bind on every source)
    min_source = min(n for _, n in docs.groupBy("source").count().collect())
    cap = min(CAP, min_source)
    per_source = timed(
        samples, "source_cap",
        lambda: dict(
            source_cap(docs, cap=cap, broadcast_keep=True)
            .groupBy("source").count().collect()
        ),
        args.reps,
    )
    checks["cap_exactly_cap_per_source"] = (
        len(per_source) == n_sources and set(per_source.values()) == {cap}
    )

    # ---- pack_shards
    def run_pack():
        out = pack_shards(docs, budget=BUDGET, n_buckets=int(CPUS) * 4)
        return (
            out.groupBy("shard").agg(F.sum("n_tokens").alias("toks")).collect(),
            out.agg(F.sum("n_tokens"), F.max("n_tokens")).first(),
        )

    (per_shard, (total_toks, max_doc)) = timed(samples, "pack_shards", run_pack, args.reps)
    base_total = base.select(F.sum(word_count(F.col("text")))).first()[0]
    shard_ids = sorted(r["shard"] for r in per_shard)
    last = max(shard_ids)
    checks["pack_tokens_conserved"] = total_toks == args.replicas * base_total
    checks["pack_shards_contiguous"] = shard_ids == list(range(last + 1))
    checks["pack_shard_sums_in_greedy_bound"] = all(
        r["toks"] < BUDGET + max_doc
        and (r["shard"] == last or r["toks"] > BUDGET - max_doc)
        for r in per_shard
    )

    # ---- line_filter (replica-invariant signature set)
    sig = lambda df: (
        line_filter(df.select("doc_id", injected_lines(F.col("text")).alias("text")))
        .select("n_lines", "n_kept", F.md5("text_clean").alias("h"))
        .distinct().count()
    )
    base_sigs = sig(base)
    big_sigs = timed(samples, "line_filter", lambda: sig(docs), args.reps)
    checks["line_filter_signature_set_invariant"] = big_sigs == base_sigs

    timings = {name: min(s) for name, s in samples.items()}
    out = {
        "metric": "selection_stretch",
        "sf_base": SF_DIR,
        "replicas": args.replicas,
        "rows": {"base": n_base, "docs": n_rows},
        "synth_s": synth_s,
        "reps": args.reps,
        "seconds": timings,
        "rep_samples": samples,
        "docs_per_sec": {name: round(n_rows / t, 1) for name, t in timings.items()},
        "known_answers": {
            "lang_counts": lang_counts,
            "kept_by_lang": kept,
            "n_sources": n_sources,
            "cap": cap,
            "n_shards": last + 1,
            "total_tokens": total_toks,
            "max_doc_tokens": max_doc,
            "line_signatures": {"base": base_sigs, "100x": big_sigs},
        },
        "checks": checks,
        "all_checks_pass": all(checks.values()),
        "cpus": int(CPUS),
    }
    with open(REPO / "BENCH" / "selection_stretch.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
