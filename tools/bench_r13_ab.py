"""Strict back-to-back A/B for the r13 restructures.

One subprocess per (query, SF, tree) via bench_heavy_sf1.py's
``query:<name>`` child mode (untimed warm-up + back-to-back min-of-3);
each (query, SF) pair runs before (worktree of the pre-change commit)
then after (current tree) ADJACENTLY, so machine-state drift cancels
and the ratio is the claim (CLAUDE.md 100x-level rule).

Usage: python tools/bench_r13_ab.py <before_worktree> [out.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_ngram_family_ab import point  # noqa: E402

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1_fresh_10x": os.path.join(REPO, ".benchdata", "sf1_fresh"),
    "sf10_fresh_100x": os.path.join(REPO, ".benchdata", "sf10_fresh"),
}

POINTS = [
    ("dedup_prefix_filter_join", "sf0.1"),
    ("dedup_prefix_filter_join", "sf1_fresh_10x"),
    ("dedup_ngram_jaccard_capped", "sf0.1"),
    ("dedup_ngram_jaccard_capped", "sf1_fresh_10x"),
    ("dedup_ngram_jaccard_capped", "sf10_fresh_100x"),
    ("dedup_prefix_filter_join", "sf10_fresh_100x"),
]


def main() -> None:
    before_tree = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_R13_AB.json"
    )
    out: dict = {
        "metric": "r13_restructure_ab",
        "unit": "sec",
        "method": (
            "one subprocess per (query, SF, tree); untimed warm-up + "
            "back-to-back min-of-3; before/after pairs run adjacently "
            "(before = pre-restructure worktree); identical corpora"
        ),
    }
    for name, sf_key in POINTS:
        sf_dir = SFS[sf_key]
        b = point(before_tree, sf_dir, name)
        a = point(REPO, sf_dir, name)
        out.setdefault(sf_key, {})[name] = {
            "before": b, "after": a,
            "speedup": round(b / a, 3) if a else None,
        }
        print(f"{sf_key} {name}: {b} -> {a}", flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print("AB_DONE", flush=True)


if __name__ == "__main__":
    main()
