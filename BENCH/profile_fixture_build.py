"""Decompose bench.py's `kg_fixture_build` (the largest headline item)
into its pipeline stages: fixture IO, extraction UDF, domain parse, triple
emission, dedup. Each prefix of the pipeline is timed to a count() action
(min of --reps interleaved); stage cost = prefix delta. Writes
BENCH/fixture_build_profile.json.

Usage: python BENCH/profile_fixture_build.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("YCKG_LOCAL_DIR", "/dev/shm/spark-local")

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from fixtures.generate import default_fixture
    from yckg_spark.operators.canonicalize import dedup_triples
    from yckg_spark.operators.emit import emit_all
    from yckg_spark.session import get_spark
    from yckg_spark.sources.web_pages import parse_records, read_web_pages

    spark = get_spark(
        "yckg-profile", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    fdir = default_fixture("bench")

    def scan(_):
        return read_web_pages(spark, f"{fdir}/web_pages.parquet")

    def extracted(_):
        from yckg_spark.operators.extract import with_extracted_text

        return with_extracted_text(scan(None))

    def parsed(_):
        recs = parse_records(scan(None), use_extraction=True)
        # parse_records returns the per-domain record frames; count all
        return recs

    def emitted(_):
        t, _e = emit_all(parse_records(scan(None), use_extraction=True))
        return t

    def full(_):
        t, _e = emit_all(parse_records(scan(None), use_extraction=True))
        return dedup_triples(t)

    stages = {
        "scan": scan,
        "scan+extract": extracted,
        "scan+extract+parse": parsed,
        "scan..emit": emitted,
        "scan..emit+dedup(full)": full,
    }
    samples = {name: [] for name in stages}
    # warmup
    full(None).count()
    for _ in range(args.reps):
        for name, fn in stages.items():
            t0 = time.time()
            out = fn(None)
            if isinstance(out, dict):
                n = sum(df.count() for df in out.values())
            else:
                n = out.count()
            samples[name].append(round(time.time() - t0, 3))
            # parse_records persists its stage-cut frames; drop them so
            # repeated prefixes don't accumulate block-manager storage
            spark.catalog.clearCache()
    mins = {k: min(v) for k, v in samples.items()}
    keys = list(stages)
    deltas = {keys[0]: mins[keys[0]]}
    for prev, cur in zip(keys, keys[1:]):
        deltas[cur] = round(mins[cur] - mins[prev], 3)
    result = {
        "metric": "kg_fixture_build_stage_profile",
        "prefix_min_s": mins,
        "stage_delta_s": deltas,
        "rep_samples": samples,
        "cpus": int(CPUS),
    }
    with open(REPO / "BENCH" / "fixture_build_profile.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
