"""Derive a larger bench-only corpus from the driver's testdata.

Facts (orders/lineitem/events/documents/embeddings) replicate N times
with shifted primary keys; dimensions copy as-is (TPC-H dims scale
sublinearly; fixed dims preserve join shapes while facts scale).
Output is for BENCHMARKING ONLY — correctness always runs against the
driver's own /root/testdata corpora.

Note the derived corpus is a *harder* dedup workload than a real scale-
up: every document gains N-1 exact replicas, so LSH buckets and pair
counts are maximally dense. Caps that hold here hold on real data.

Usage: python tools/gen_benchdata.py [factor] [src_dir] [dst_dir]
       (default: 10 /root/testdata/sf0.1 <repo>/.benchdata/sf1)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FACT_KEYS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".benchdata", "sf1")
    os.makedirs(dst, exist_ok=True)
    t0 = time.time()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 4}")
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet')"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"CREATE VIEW g AS SELECT * FROM range({factor}) t(gen)")
    for table, key in FACT_KEYS.items():
        cols = [
            d[0]
            for d in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        span = con.execute(
            f"SELECT max({key})+1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
        sel = ", ".join(
            f"{c} + gen*{span} AS {c}" if c == key else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{table}.parquet', g)"
            f" TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote {dst} ({factor}x {src}) in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
