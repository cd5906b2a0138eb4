"""Bucketed-join tests: the co-located fact join plans with NO shuffle."""

from __future__ import annotations

import pytest

from automated_data_pipeline_python_spark.plans import plan_report
from automated_data_pipeline_python_spark.storage import read_table, write_bucketed
from automated_data_pipeline_python_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    write_bucketed(
        load(spark, SF, "lineitem"), "b_lineitem", "l_orderkey", num_buckets=8
    )
    write_bucketed(
        load(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        "l_orderkey",
        num_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = read_table(spark, "b_lineitem").join(
            read_table(spark, "b_orders"), "l_orderkey"
        )
        rep = plan_report(joined)
        assert rep.sort_merge_joins == 1
        assert rep.exchanges == 0, "bucketed join must not shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_correctness(spark, bucketed):
    got = (
        read_table(spark, "b_lineitem")
        .join(read_table(spark, "b_orders"), "l_orderkey")
        .count()
    )
    li = load(spark, SF, "lineitem")
    orders = load(spark, SF, "orders")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_bucketed_groupby_avoids_shuffle(spark, bucketed):
    # Aggregation on the bucket key reuses the bucketing: no Exchange.
    agg = read_table(spark, "b_lineitem").groupBy("l_orderkey").count()
    assert plan_report(agg).exchanges == 0
