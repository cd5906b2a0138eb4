"""DuckDB-oracle comparison helper mirroring the driver's t2 gate.

Canonicalization (FIXTURES.md): sort columns by name, sort rows by all
columns, round doubles, render timestamps ISO, normalize nulls — then
compare cell-by-cell.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from automated_data_pipeline_python_spark.tables import TABLE_NAMES

ROUND_DIGITS = 6


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == 0:
            v = 0.0
        # Relative rounding so big doubles (sums) compare stably too.
        return f"{v:.{ROUND_DIGITS}e}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return repr(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch spark={sorted(actual.columns)} duckdb={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count spark={len(actual)} duckdb={len(expected)}"
    )
    a, e = canonicalize(actual), canonicalize(expected)
    if a != e:
        diffs = [(x, y) for x, y in zip(a, e) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs {diffs}")
