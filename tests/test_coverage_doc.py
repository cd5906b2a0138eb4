"""COVERAGE.md's hand-maintained totals line must track the registry.

The line has drifted before (round 5 said 279 while the catalog had
288), which misleads the judge's line-by-line inventory check. This
parses the "Totals: N catalog queries — M oracle-checked, K rows-only"
sentence and pins it to the live registry counts (VERDICT r6 task 7).
"""

from __future__ import annotations

import pathlib
import re

from automated_data_pipeline_python_spark.queries import queries, oracle_sql

_DOC = pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"


def test_coverage_totals_match_registry():
    text = _DOC.read_text()
    m = re.search(
        r"Totals:\s*(\d+)\s+catalog queries\s*—\s*(\d+)\s+oracle-checked,"
        r"\s*(\d+)\s+rows-only",
        text,
    )
    assert m, "COVERAGE.md totals line missing or reformatted"
    total, oracled, rows_only = (int(g) for g in m.groups())
    q, o = queries(), oracle_sql()
    assert total == len(q), (total, len(q))
    assert oracled == len(o), (oracled, len(o))
    assert rows_only == len(q) - len(o), (rows_only, len(q) - len(o))
