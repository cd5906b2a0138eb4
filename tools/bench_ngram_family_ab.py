"""A/B ladder for the r12 dedup-family restructure (simhash map-side
core + ngram/sets int-keyed discovery).

Runs each (query, SF, tree) point in its OWN SUBPROCESS via
tools/bench_heavy_sf1.py's ``query:<name>`` child mode (fresh python →
fresh JVM, untimed warm-up + back-to-back min-of-3), pointing the
"before" runs at a read-only worktree of the pre-restructure commit —
so both trees measure the same corpora with the same harness on the
same solo machine.

Usage: python tools/bench_ngram_family_ab.py <before_worktree> [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_ngram_containment",
    "dedup_incremental_minhash",
    "dedup_minhash_estimate_accuracy",
    "dedup_prefix_filter_join",
    "dedup_lsh_recall_eval",
    "dedup_clusters",
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1_fresh_10x", os.path.join(REPO, ".benchdata", "sf1_fresh")),
    ("sf10_fresh_100x", os.path.join(REPO, ".benchdata", "sf10_fresh")),
]

# The 100x point only for the queries whose discovery/verify stages
# scale with candidate structure (the others' 10x rows already tell the
# story, and a 100x string-join "before" point costs minutes each).
LADDER_100X = [
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_incremental_minhash",
    "dedup_minhash_estimate_accuracy",
]


def point(tree: str, sf_dir: str, name: str) -> float:
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "tools", "bench_heavy_sf1.py"),
         "--point", sf_dir, f"query:{name}"],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])[name]


def main() -> None:
    before_tree = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_NGRAM_FAMILY_AB_r12.json"
    )
    out: dict = {
        "metric": "ngram_family_ab_r12",
        "unit": "sec",
        "method": (
            "one subprocess per (query, SF, tree); untimed warm-up + "
            "back-to-back min-of-3 (bench_heavy_sf1.py query: child "
            "mode); before = pre-restructure worktree, after = current "
            "tree; identical corpora"
        ),
    }
    for sf_key, sf_dir in SFS:
        out[sf_key] = {}
        for name in QUERIES:
            if sf_key == "sf10_fresh_100x" and name not in LADDER_100X:
                continue
            b = point(before_tree, sf_dir, name)
            a = point(REPO, sf_dir, name)
            out[sf_key][name] = {"before": b, "after": a}
            print(f"{sf_key} {name}: {b} -> {a}", flush=True)
            with open(out_path, "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main()
