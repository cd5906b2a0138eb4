"""Audit: which catalog queries plan a single-partition WindowExec?

A Window over `Exchange SinglePartition` moves its whole input to one
task — fatal when the input scales with the corpus, fine when it is
provably bounded (constant-k top-k output, decile cutoffs, vocab).
Prints each emitting query and whether the exchange's subtree contains
a raw parquet scan (scan-rooted = suspicious; aggregate/limit-rooted =
probably bounded). tests/test_global_window_allowlist.py pins the
result set.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from automated_data_pipeline_python_spark.queries import QUERIES
from automated_data_pipeline_python_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def _indent(line: str) -> int:
    m = re.match(r"[\s:+\-*()0-9]*", line)
    return m.end() if m else 0


def single_partition_window_subtrees(plan_text: str) -> list[str]:
    """Subtree text under each `Exchange SinglePartition` that feeds a
    Window node (the exchange appears below the Window in the printed
    tree, at greater depth, before the Window's subtree ends)."""
    lines = plan_text.splitlines()
    out = []
    for i, line in enumerate(lines):
        s = line.strip()
        if not (s.startswith("Window") or " Window " in line):
            continue
        depth = _indent(line)
        for j in range(i + 1, len(lines)):
            nxt = lines[j]
            if nxt.strip() and _indent(nxt) <= depth:
                break
            if "Exchange SinglePartition" in nxt:
                sub_depth = _indent(nxt)
                sub = [nxt]
                for k in range(j + 1, len(lines)):
                    if lines[k].strip() and _indent(lines[k]) <= sub_depth:
                        break
                    sub.append(lines[k])
                out.append("\n".join(sub))
                break
    return out


def main() -> None:
    spark = get_spark(app_name="window-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    hits = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].fn(spark, SF)
            text = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {type(e).__name__}: {e}", flush=True)
            continue
        subs = single_partition_window_subtrees(text)
        if subs:
            scan_rooted = any(
                ".parquet" in sub and "Aggregate" not in sub and "Limit" not in sub
                for sub in subs
            )
            hits[name] = scan_rooted
            print(f"{name}: single-partition window; scan_rooted={scan_rooted}", flush=True)
    print("\n=== allowlist candidate ===")
    for name, scan_rooted in sorted(hits.items()):
        print(f'    "{name}",{"  # SCAN-ROOTED — INVESTIGATE" if scan_rooted else ""}')


if __name__ == "__main__":
    main()
