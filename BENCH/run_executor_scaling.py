"""Executor-count scaling: N=1 vs 4N=4 *separate worker JVMs*.

The north rule compares N vs 4N executors. `local[k]` thread-scaling is the
harsher proxy (one shared heap/allocator/python pool — see BASELINE.md);
this harness runs the faithful one: the build's bucket space is split
across W concurrent spark-submit processes, each a fully separate JVM with
its own 2-core scheduler, heap, and python workers — exactly how executors
divide one job on a real cluster (disjoint input shards, disjoint output
partitions + manifest rows that compose into one store).

    W=1: one worker processes buckets 0-3
    W=4: four concurrent workers process buckets {0},{1},{2},{3}

Usage: python BENCH/run_executor_scaling.py [--reps 2]
Writes BENCH/executor_scaling.json and appends the table to BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.make_pyfiles import build_zip  # noqa: E402

CORES_PER_WORKER = 2
N_BUCKETS = 4


def worker_cmd(spark_submit: str, zip_path: Path, input_dir: str, out_dir: str,
               buckets: str, worker_idx: int) -> list[str]:
    lo = worker_idx * CORES_PER_WORKER
    hi = lo + CORES_PER_WORKER - 1
    return [
        # dedicated-core pinning: a real cluster executor runs in a cgroup
        # cpuset; without it the kernel migrates each JVM's dozens of
        # runtime threads across all host cores and concurrent JVMs thrash
        # each other's L1/L2 (measured ~2x CPU inflation at W=4)
        "taskset", "-c", f"{lo}-{hi}",
        # rusage wrapper (no /usr/bin/time in this container): runs the
        # worker, then prints "RUSAGE_CPU_S <user+sys> ..." on stderr
        sys.executable, str(REPO / "BENCH" / "_rusage_wrap.py"),
        spark_submit,
        "--master", f"local[{CORES_PER_WORKER}]",
        "--driver-memory", "6g",
        # a real 2-core executor container sees 2 CPUs; without this every
        # worker JVM sizes GC/JIT/netty pools for all host cores and W
        # concurrent JVMs thrash each other's caches with ~23 GC threads each
        "--conf", f"spark.driver.extraJavaOptions=-XX:ActiveProcessorCount={CORES_PER_WORKER}",
        "--py-files", str(zip_path),
        str(REPO / "yckg_spark" / "cli.py"),
        "--shuffle-partitions", str(CORES_PER_WORKER * 4),
        "build",
        "--input", input_dir,
        "--output", out_dir,
        "--n-buckets", str(N_BUCKETS),
        "--buckets", buckets,
    ]


def run_config(spark_submit: str, zip_path: Path, input_dir: str, n_workers: int) -> dict:
    out_dir = "/dev/shm/yckg-exec-out"
    shutil.rmtree(out_dir, ignore_errors=True)
    env = dict(
        os.environ,
        YCKG_MAX_PARTITION_BYTES="4194304",
        YCKG_LOCAL_DIR="/dev/shm/spark-local",
    )
    all_buckets = list(range(N_BUCKETS))
    shards = [all_buckets[i::n_workers] for i in range(n_workers)]
    t0 = time.time()
    err_files = [open(f"/tmp/yckg-exec-worker-{i}.err", "w+") for i in range(len(shards))]
    procs = [
        subprocess.Popen(
            worker_cmd(spark_submit, zip_path, input_dir, out_dir,
                       ",".join(map(str, shard)), i),
            stdout=subprocess.PIPE, stderr=ef, text=True, env=env,
        )
        for i, (shard, ef) in enumerate(zip(shards, err_files))
    ]
    outs = [p.communicate()[0] for p in procs]
    wall = time.time() - t0
    if any(p.returncode != 0 for p in procs):
        raise RuntimeError(f"worker failed at W={n_workers}")
    total = 0
    cpu_s = 0.0
    for stdout_text, ef in zip(outs, err_files):
        for line in stdout_text.splitlines():
            if line.startswith("{"):
                total = total + json.loads(line)["total_triples"]
        # rusage wrapper reports user+sys CPU across the worker on stderr
        ef.seek(0)
        for line in ef:
            if line.startswith("RUSAGE_CPU_S"):
                cpu_s += float(line.split()[-1])
        ef.close()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "workers": n_workers,
        "cores_per_worker": CORES_PER_WORKER,
        "seconds": round(wall, 2),
        "cpu_seconds_total": round(cpu_s, 1),
        "total_triples": total,
        "triples_per_sec": round(total / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    zip_path = build_zip()
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    flat_dir = str(REPO / ".fixtures" / "scale170000" / "web_pages.parquet")
    input_dir = str(REPO / ".fixtures" / "scale170000" / "web_pages_bucketed")
    if not os.path.exists(os.path.join(input_dir, "_bucket_spec.json")):
        # one-time rewrite: bucket-partitioned corpus (Iceberg bucket(url)
        # emulation) so each worker's scan prunes to its own shard
        subprocess.run(
            [spark_submit, "--master", "local[8]", "--driver-memory", "8g",
             "--py-files", str(zip_path), str(REPO / "yckg_spark" / "cli.py"),
             "bucketize", "--input", flat_dir, "--output", input_dir,
             "--n-buckets", str(N_BUCKETS)],
            check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env=dict(os.environ, YCKG_MAX_PARTITION_BYTES="4194304",
                     YCKG_LOCAL_DIR="/dev/shm/spark-local"),
        )

    best: dict[int, dict] = {}
    for rep in range(args.reps):
        for w in (1, 4):
            r = run_config(spark_submit, zip_path, input_dir, w)
            r["rep"] = rep
            print(json.dumps(r), flush=True)
            if w not in best or r["seconds"] < best[w]["seconds"]:
                best[w] = r

    speedup = best[1]["seconds"] / best[4]["seconds"]
    eff = speedup / 4
    summary = {
        "metric": "kg_build_executor_scaling",
        "n1": best[1],
        "n4": best[4],
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
        "passes_north_rule_0.8": eff >= 0.8,
    }
    with open(REPO / "BENCH" / "executor_scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
