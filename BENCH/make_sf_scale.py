"""Synthesize an sf1-like table set by deterministic 10x replication of
the driver's sf0.1 tables (no external data; /root/testdata is read-only
so the result lands under --output).

Replication rules keep referential integrity so every bench query runs
with realistic join fan-in at 10x the rows:

  * region/nation      — fixed dimensions, copied as-is (25/5 rows);
  * customer/supplier/part/orders/lineitem/events
                       — every key column offset by rep * 10^7 (the same
                         disjoint-range convention as run_sf1_stretch.py),
                         foreign keys offset identically so each replica
                         is a self-consistent shard of the star schema;
  * documents          — doc_id offset, text kept identical (exact-dedup
                         groups grow 10x; the kept-count answer stays the
                         number of distinct texts);
  * embeddings         — vec_id offset, a tiny deterministic per-replica
                         jitter on component 0 so vectors are near- (not
                         exact-) duplicates and ANN work is not degenerate.

DuckDB does the rewrite (single process, bounded threads) so this can run
without a Spark session. Usage:

    python BENCH/make_sf_scale.py --output /dev/shm/yckg-sf1 [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

COPY = ["region", "nation"]
# table -> list of integer key columns to offset per replica
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale_table(con, name: str, factor: int, out_dir: str) -> int:
    src = f"read_parquet('{SRC}/{name}.parquet')"
    dst = os.path.join(out_dir, f"{name}.parquet")
    if name in COPY:
        con.execute(f"COPY (SELECT * FROM {src}) TO '{dst}' (FORMAT PARQUET)")
    else:
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        keys = set(KEYED[name])
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.rep * {OFF} AS {c}")
            elif name == "embeddings" and c == "embedding":
                # nudge component 0 by rep * 1e-4: near-dup, not identical
                sel.append(
                    "CAST(list_prepend(CAST(embedding[1] + r.rep * 0.0001 "
                    "AS FLOAT), embedding[2:]) AS FLOAT[]) AS embedding"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM {src}, "
            f"(SELECT unnest(range({factor})) AS rep) r) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    return con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={args.threads}")
    for name in COPY + list(KEYED):
        n = scale_table(con, name, args.factor, args.output)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
