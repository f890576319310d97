"""sf1-like stretch: the training-data operators at 100x the sf0.1 row
count, with known-answer checks.

/root/testdata tops out at sf0.1 (5k documents / 2k embeddings), far below
where plan-shape mistakes show up. This harness synthesizes a
deterministic 100x corpus FROM the sf0.1 tables (no external data):

  * docs_exact  — 100 identical replicas per document (distinct doc_ids):
                  500k rows whose exact-dedup answer is known (the same
                  count the base corpus dedups to);
  * docs_near   — 10 near-dup replicas per document (replica k appends a
                  short ``rK-<id>`` marker, leaving Jaccard far above the
                  0.5 threshold): 50k rows whose minhash->components->
                  keep-one answer must equal the base corpus's;
  * emb100      — 100 jittered replicas per embedding (tiny deterministic
                  per-replica offset): 200k vectors for the persisted IVF
                  index path, with recall@10 measured against brute force.

Each operator is timed (min of --reps) and its known-answer check is
recorded. Writes BENCH/sf1_stretch.json.

Usage: python BENCH/run_sf1_stretch.py [--replicas 100] [--reps 2]
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
WORK = "/dev/shm/yckg-sf1-stretch"


def replicate_docs(docs, replicas: int, near: bool):
    """Deterministic replica fan-out via explode (distributed; no driver
    loop). Replica ids live in disjoint ranges: id' = id + k * 10^7."""
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    out = docs.select("*", rep).withColumn(
        "doc_id", F.col("doc_id") + F.col("rep") * F.lit(10_000_000)
    )
    if near:
        # replica 0 keeps the original text; k>0 appends a tiny marker so
        # the texts are near- (not exact-) duplicates
        out = out.withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" r"), F.col("rep"),
                         F.lit("-"), F.col("doc_id")),
            ),
        )
    return out.drop("rep")


def replicate_emb(emb, replicas: int):
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    jitter = (F.col("rep") % 17).cast("float") * F.lit(1e-4)
    return (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(10_000_000))
        # perturb one coordinate deterministically; replicas stay within
        # ~1e-3 cosine of the original, so cells cluster like real data
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x + jitter).otherwise(x),
            ).cast("array<float>"),
        )
        .drop("rep")
    )


def timed(samples: dict, name: str, fn, reps: int):
    best, out = None, None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 2)
        samples.setdefault(name, []).append(dt)
        best = dt if best is None else min(best, dt)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from yckg_spark.operators.dedup import (
        dedup_keep_representatives,
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from yckg_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_stored,
        ivf_write_index,
    )
    from yckg_spark.operators.text_analysis import (
        fingerprint,
        lang_id,
        quality_score,
    )
    from yckg_spark.session import get_spark

    spark = get_spark(
        "yckg-sf1-stretch", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    near_replicas = max(args.replicas // 10, 2)

    # ---- materialize the synthetic corpora (input prep, timed separately)
    t0 = time.time()
    replicate_docs(docs, args.replicas, near=False).write.parquet(f"{WORK}/docs_exact")
    replicate_docs(docs, near_replicas, near=True).write.parquet(f"{WORK}/docs_near")
    replicate_emb(emb, args.replicas).write.parquet(f"{WORK}/emb100")
    synth_s = round(time.time() - t0, 2)

    docs_exact = spark.read.parquet(f"{WORK}/docs_exact")
    docs_near = spark.read.parquet(f"{WORK}/docs_near")
    emb100 = spark.read.parquet(f"{WORK}/emb100")
    n_exact, n_near, n_emb = docs_exact.count(), docs_near.count(), emb100.count()

    # ---- known-answer baselines from the base corpus (cheap, 5k rows)
    base_kept_exact = exact_dedup(docs).count()
    base_pairs = minhash_lsh_pairs(docs, threshold=0.5)
    base_kept_near = dedup_keep_representatives(docs, base_pairs).count()

    samples: dict[str, list[float]] = {}
    checks: dict[str, bool] = {}

    kept_exact = timed(
        samples, "exact_dedup", lambda: exact_dedup(docs_exact).count(), args.reps
    )
    checks["exact_dedup_known_answer"] = kept_exact == base_kept_exact

    timed(
        samples, "quality_lang_id",
        lambda: lang_id(quality_score(docs_exact)).count(), args.reps,
    )
    timed(samples, "fingerprint", lambda: fingerprint(docs_exact).count(), args.reps)

    def near_pipeline():
        persisted: list = []
        pairs = minhash_lsh_pairs(docs_near, threshold=0.5, persisted_out=persisted)
        kept = dedup_keep_representatives(docs_near, pairs).count()
        while persisted:
            persisted.pop().unpersist()
        return kept

    kept_near = timed(samples, "minhash_components_keep_one", near_pipeline, args.reps)
    # every replica folds into its base doc's component, so the 10x corpus
    # must keep exactly what the base corpus keeps
    checks["minhash_known_answer"] = kept_near == base_kept_near

    timed(
        samples, "simhash_pairs",
        lambda: simhash_pairs(docs_near, max_hamming=3).count(), args.reps,
    )

    n_cells, nprobe, k = 64, 8, 10
    timed(
        samples, "ivf_write_index",
        lambda: ivf_write_index(emb100, f"{WORK}/ivf", n_cells=n_cells), args.reps,
    )
    queries = emb.orderBy("vec_id").limit(20).select("vec_id", "embedding")
    approx = timed(
        samples, "ivf_topk_stored",
        lambda: ivf_topk_stored(
            spark, f"{WORK}/ivf", queries, k=k, nprobe=nprobe
        ).collect(),
        args.reps,
    )
    brute = timed(
        samples, "brute_force_topk",
        lambda: brute_force_topk(emb100, queries, k=k).collect(), args.reps,
    )
    truth = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in approx:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    recall = round(sum(recalls) / len(recalls), 4)
    checks["ivf_recall_ge_0.9"] = recall >= 0.9

    timings = {name: min(s) for name, s in samples.items()}
    out = {
        "metric": "sf1_stretch",
        "sf_base": SF_DIR,
        "replicas": args.replicas,
        "rows": {"docs_exact": n_exact, "docs_near": n_near, "embeddings": n_emb},
        "synth_s": synth_s,
        "reps": args.reps,
        "seconds": timings,
        "rep_samples": samples,
        "docs_per_sec": {
            "exact_dedup": round(n_exact / timings["exact_dedup"], 1),
            "quality_lang_id": round(n_exact / timings["quality_lang_id"], 1),
            "minhash_components_keep_one": round(
                n_near / timings["minhash_components_keep_one"], 1
            ),
        },
        "known_answers": {
            "base_kept_exact": base_kept_exact,
            "kept_exact_100x": kept_exact,
            "base_kept_near": base_kept_near,
            "kept_near_10x": kept_near,
            "ivf_recall_at_10": recall,
        },
        "checks": checks,
        "all_checks_pass": all(checks.values()),
        "cpus": int(CPUS),
    }
    with open(REPO / "BENCH" / "sf1_stretch.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
