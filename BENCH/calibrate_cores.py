"""Measure per-core-pair speed so the scaling harness can pin workers to
speed-matched pairs.

Round 3 established (BENCH/BASELINE.md) that this host's vCPU pairs differ
by up to ~19% in single-thread speed — hypervisor placement, not anything
Spark does. The north rule's N-vs-4N comparison assumes homogeneous
executors (a real cluster's machines are identical SKUs); letting the W=4
wall clock be set by whichever worker landed on the slowest vCPU pair
measures the hypervisor, not the engine. This sweep times a fixed
CPU-bound workload on each 2-core pair (both cores busy, pairs run
SEQUENTIALLY so they never contend), repeats the sweep, and reports the
median seconds per pair. The scaling harness then takes the 4 pairs with
the most uniform speed (minimum spread window) and runs W=1 on one of
those same pairs — both configs see identical silicon.

Usage: python BENCH/calibrate_cores.py [--sweeps 3] [--seconds-hint 2.0]
Writes BENCH/core_calibration.json.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# CPU-bound, allocation-light inner loop: sha256 over a reused buffer.
# Relative pair-to-pair timing is all that matters, not absolute speed.
WORKLOAD = r"""
import hashlib, sys
n = int(sys.argv[1])
buf = b"x" * 4096
h = hashlib.sha256()
for _ in range(n):
    h.update(buf)
print(h.hexdigest()[:8])
"""


def time_pair(lo: int, n_iter: int) -> float:
    """Run the workload on BOTH cores of the pair concurrently (the worker
    JVMs use both their cores); return wall seconds for the slower one."""
    t0 = time.time()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(core), sys.executable, "-c", WORKLOAD,
             str(n_iter)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for core in (lo, lo + 1)
    ]
    for p in procs:
        p.wait()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--n-cores", type=int, default=32)
    ap.add_argument("--n-iter", type=int, default=400_000,
                    help="sha256 iterations per process (~1.5-2 s/pair)")
    args = ap.parse_args()

    pairs = list(range(0, args.n_cores, 2))
    results: dict[int, list[float]] = {lo: [] for lo in pairs}
    for sweep in range(args.sweeps):
        for lo in pairs:  # sequential: one pair busy at a time
            results[lo].append(time_pair(lo, args.n_iter))
        print(f"sweep {sweep + 1}/{args.sweeps} done", file=sys.stderr)

    med = {lo: statistics.median(v) for lo, v in results.items()}
    fastest = min(med.values())
    table = [
        {
            "pair": f"{lo}-{lo + 1}",
            "lo": lo,
            "median_s": round(med[lo], 3),
            "all_s": [round(x, 3) for x in results[lo]],
            "rel_speed": round(fastest / med[lo], 3),
        }
        for lo in pairs
    ]

    # choose the 4-pair window with minimum (max-min)/min spread: the most
    # homogeneous "cluster" this host can offer
    ranked = sorted(table, key=lambda r: r["median_s"])
    best_window, best_spread = None, None
    for i in range(len(ranked) - 3):
        win = ranked[i:i + 4]
        spread = (win[-1]["median_s"] - win[0]["median_s"]) / win[0]["median_s"]
        if best_spread is None or spread < best_spread:
            best_spread, best_window = spread, win
    chosen = sorted(r["lo"] for r in best_window)

    out = {
        "metric": "per_core_pair_speed",
        "method": (
            "2-process sha256 busy-loop per pair, pairs timed sequentially "
            f"(never concurrent), median of {args.sweeps} sweeps; "
            "chosen_pairs = the 4-pair window with minimum relative spread"
        ),
        "pairs": table,
        "spread_all_pairs": round(
            (max(med.values()) - fastest) / fastest, 3
        ),
        "chosen_pairs": chosen,
        "chosen_spread": round(best_spread, 3),
    }
    path = REPO / "BENCH" / "core_calibration.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
