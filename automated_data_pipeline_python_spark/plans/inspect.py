"""Physical-plan report: the facts that matter at 100 TB, as data.

``plan_report(df)`` parses ``df.explain``'s formatted output into
counts a test can assert on: shuffles (Exchange), broadcast joins,
sort-merge joins, scans with pushed filters, Python UDF boundaries,
whole-stage-codegen coverage. tests/test_plans.py uses this to pin the
intended execution shape of headline queries — a regression here means
a silent 100×-at-scale slowdown even when results stay correct.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    scans: int = 0
    scans_with_pushed_filters: int = 0
    python_evals: int = 0  # BatchEvalPython / ArrowEval / FlatMap*Pandas
    codegen_spans: int = 0
    text: str = field(default="", repr=False)

    @property
    def python_free(self) -> bool:
        return self.python_evals == 0


def plan_report(df: DataFrame) -> PlanReport:
    text = df._jdf.queryExecution().executedPlan().toString()
    # After execution AQE prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — count only the final one.
    if "== Final Plan ==" in text:
        text = text.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    rep = PlanReport(text=text)
    for line in text.splitlines():
        if re.search(r"\bExchange\b", line) and "Reused" not in line:
            rep.exchanges += 1
        if "BroadcastHashJoin" in line or "BroadcastNestedLoopJoin" in line:
            rep.broadcast_joins += 1
        if "SortMergeJoin" in line:
            rep.sort_merge_joins += 1
        if "Scan parquet" in line or "FileScan parquet" in line:
            rep.scans += 1
            m = re.search(r"DataFilters: \[([^\]]*)\]", line)
            if m and m.group(1).strip():
                rep.scans_with_pushed_filters += 1
        if re.search(r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|MapInPandas", line):
            rep.python_evals += 1
        # codegen shows as "WholeStageCodegen (n)" in formatted explain
        # and as "*(n) Operator" markers in the executed plan tree
        if "WholeStageCodegen" in line or re.search(r"\*\(\d+\)", line):
            rep.codegen_spans += 1
    return rep
