"""Order-independence of money aggregates (functions/numeric.py).

Round-1 regression: ``q7_nation_trade_by_year`` returned a 1-cent-off
total because Spark and DuckDB accumulate double sums in different
orders and rounded a borderline value in opposite directions. The fix
snaps each row to an integer grid before summing (exact_sum /
sql_exact_sum). These tests prove the property the fix claims:
identical results under ANY partitioning of the input.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.functions.numeric import (
    exact_avg,
    exact_sum,
    stable_round,
)
from automated_data_pipeline_python_spark.queries.catalog import QUERIES

from tests.conftest import SF_SMOKE


def _canon(rows):
    out = []
    for r in sorted(tuple(str(v) for v in row) for row in rows):
        out.append(r)
    return out


# Adversarial fixture: many values ending in .xx5-adjacent cents whose
# true total sits at a rounding boundary — raw float sums round either
# way depending on accumulation order.
_BOUNDARY_VALUES = [10.01, 20.02, 0.005, 1.115, 2.225, 3.335, 99.99, 0.01] * 250


def test_exact_sum_partition_invariant(spark):
    base = None
    for nparts in (1, 3, 17, 64):
        df = spark.createDataFrame(
            [(i % 7, v) for i, v in enumerate(_BOUNDARY_VALUES)], "k int, v double"
        ).repartition(nparts)
        got = {
            r["k"]: (r["s"], r["a"])
            for r in df.groupBy("k")
            .agg(
                stable_round(exact_sum("v", 4), 2).alias("s"),
                stable_round(exact_avg("v", 4), 6).alias("a"),
            )
            .collect()
        }
        if base is None:
            base = got
        else:
            assert got == base, f"exact_sum changed under {nparts} partitions"


def test_exact_sum_matches_true_decimal_total(spark):
    # Ground truth via integer arithmetic in Python.
    vals = _BOUNDARY_VALUES
    true_total = sum(round(v * 1e4) for v in vals) / 1e4
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(13)
    got = df.agg(exact_sum("v", 4).alias("s")).collect()[0]["s"]
    assert math.isclose(got, true_total, rel_tol=0, abs_tol=1e-9)


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q7_nation_trade_by_year",
        "q5_region_revenue",
        "agg_corr_regression",
    ],
)
def test_query_results_shuffle_partition_invariant(spark, name):
    """Headline money-sum queries return bit-identical rows when the
    shuffle partitioning (and hence accumulation order) changes."""
    fn = QUERIES[name].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        base = _canon(fn(spark, SF_SMOKE).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        alt = _canon(fn(spark, SF_SMOKE).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt
