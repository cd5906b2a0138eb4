"""Derive a larger bench-only corpus from the driver's testdata.

Facts (orders/lineitem/events/documents/embeddings) replicate N times
with shifted primary keys; dimensions copy as-is (TPC-H dims scale
sublinearly; fixed dims preserve join shapes while facts scale).
Output is for BENCHMARKING ONLY — correctness always runs against the
driver's own /root/testdata corpora.

Note the default derived corpus is a *harder* dedup workload than a
real scale-up: every document gains N-1 exact replicas, so LSH buckets
and pair counts are maximally dense. Caps that hold here hold on real
data. Pass ``--fresh-docs`` for the density-honest variant: every
replica generation rewrites each document token with a generation
suffix, so replicas share NO shingles with their source — cross-
generation similarity drops to zero while the WITHIN-generation dup
structure (what sf0.1 actually measures) is preserved exactly. That
corpus demonstrates the claimed O(docs × shingles) minhash scaling
without the replica-density inflation.

Usage: python tools/gen_benchdata.py [factor] [src_dir] [dst_dir] [--fresh-docs]
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fresh_docs = "--fresh-docs" in sys.argv
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            only = set(a.split("=", 1)[1].split(","))
    factor = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    dst = args[2] if len(args) > 2 else os.path.join(REPO, ".benchdata", "sf1")
    os.makedirs(dst, exist_ok=True)
    t0 = time.time()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 4}")
    fact_keys = {
        t: k for t, k in FACT_KEYS.items() if only is None or t in only
    }
    dims = [t for t in DIMS if only is None or t in only]
    for t in dims:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet')"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"CREATE VIEW g AS SELECT * FROM range({factor}) t(gen)")
    # One shared span per KEY DOMAIN: orders and lineitem both key on
    # orderkey, so both must shift by the same span (orders' max). With
    # per-table spans they only stay FK-aligned because TPC-H happens to
    # give every tail order a lineitem; a corpus where the max orderkey
    # had no lineitems would silently change replicated join
    # cardinalities.
    orderkey_span = None
    if "orders" in fact_keys or "lineitem" in fact_keys:
        orderkey_span = con.execute(
            f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'"
        ).fetchone()[0]
    for table, key in fact_keys.items():
        cols = [
            d[0]
            for d in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        if table in ("orders", "lineitem"):
            span = orderkey_span
        else:
            span = con.execute(
                f"SELECT max({key})+1 FROM '{src}/{table}.parquet'"
            ).fetchone()[0]

        def col_sel(c: str) -> str:
            if c == key:
                return f"{c} + gen*{span} AS {c}"
            if fresh_docs and table == "documents" and c == "text":
                # gen 0 = the source corpus verbatim; gen > 0 rewrites
                # every token with a generation suffix → zero shared
                # shingles across generations, identical dup structure
                # within each generation.
                return (
                    "CASE WHEN gen = 0 THEN text ELSE "
                    "regexp_replace(text, '(\\S+)', "
                    "'\\1g' || CAST(gen AS VARCHAR), 'g') END AS text"
                )
            return c

        sel = ", ".join(col_sel(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{table}.parquet', g)"
            f" TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
    mode = " fresh-docs" if fresh_docs else ""
    print(f"wrote {dst} ({factor}x{mode} {src}) in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
