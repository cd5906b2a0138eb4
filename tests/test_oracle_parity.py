"""Every catalog query with an oracle hash-matches DuckDB at sf0.01.

This mirrors the driver's t2 correctness gate.
"""

from __future__ import annotations

import pytest

from automated_data_pipeline_python_spark.queries import QUERIES
from tests.oracle import assert_matches_oracle, duckdb_conn

WITH_ORACLE = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_matches_duckdb(name, spark, sf_dir, oracle):
    q = QUERIES[name]
    assert_matches_oracle(q.fn(spark, sf_dir), oracle, q.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_no_engine_dependent_round_in_any_oracle():
    """CLAUDE.md invariant, enforced mechanically: no oracle may call
    SQL round() — engines disagree near .xx5 boundaries; the portable
    form is floor(x*1eD + 0.5)/1eD. (VARCHAR casts are NOT checked:
    oracles are DuckDB-only text, where VARCHAR is legal.)"""
    import re

    offenders = [
        name
        for name, q in QUERIES.items()
        if q.oracle and re.search(r"(?<![a-z_])round\s*\(", q.oracle, re.I)
    ]
    assert offenders == []
