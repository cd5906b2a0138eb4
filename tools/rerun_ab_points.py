"""Re-run selected A/B ladder points and patch them into
BENCH_NGRAM_FAMILY_AB_r12.json (see bench_ngram_family_ab.py).

The first pass's 100x section showed a 6.5x level swing on a re-probe
(46.2 vs 7.1 s for the same point minutes apart) — the whole section is
re-measured here back-to-back, plus the post-fix "after" points for the
two queries whose code changed after the first pass (capped, prefix).

Usage: python tools/rerun_ab_points.py <before_worktree>
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_ngram_family_ab import point  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".benchdata", "sf1_fresh")
SF10 = os.path.join(REPO, ".benchdata", "sf10_fresh")

LADDER_100X = [
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_incremental_minhash",
    "dedup_minhash_estimate_accuracy",
]


def main() -> None:
    before_tree = sys.argv[1]
    path = os.path.join(REPO, "BENCH_NGRAM_FAMILY_AB_r12.json")
    with open(path) as f:
        out = json.load(f)

    def save() -> None:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    # post-fix after-points for the two changed queries
    for sf_key, sf_dir in (("sf0.1", SF01), ("sf1_fresh_10x", SF1)):
        for name in ("dedup_ngram_jaccard_capped", "dedup_prefix_filter_join"):
            a = point(REPO, sf_dir, name)
            out[sf_key][name]["after"] = a
            print(f"refit {sf_key} {name}: after={a}", flush=True)
            save()

    # full 100x section, both trees, back-to-back per pair
    out["sf10_fresh_100x"] = {}
    for name in LADDER_100X:
        b = point(before_tree, SF10, name)
        a = point(REPO, SF10, name)
        out["sf10_fresh_100x"][name] = {"before": b, "after": a}
        print(f"sf10_fresh_100x {name}: {b} -> {a}", flush=True)
        save()

    out["note_100x"] = (
        "100x section re-measured back-to-back after the first pass "
        "showed a 6.5x same-point level swing (46.2 vs 7.1 s minutes "
        "apart) — levels at 100x depend on machine page-cache/JVM "
        "churn across the ~100 preceding subprocess lifecycles; "
        "before/after pairs here ran adjacently. capped/prefix 'after' "
        "values are the post-fix forms (exploded relation checkpointed "
        "for accurate join-size stats)."
    )
    save()
    print("done")


if __name__ == "__main__":
    main()
