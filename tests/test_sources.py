"""Source/sink roundtrip tests (SURVEY §2.1 S4/S6)."""

from __future__ import annotations

import pytest

from automated_data_pipeline_python_spark.sources import (
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
)
from automated_data_pipeline_python_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nationlike(spark):
    return load(spark, SF, "customer")


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip_partitioned(spark, nationlike, tmp_path):
    path = str(tmp_path / "cust_parq")
    write_parquet(nationlike, path, partition_by=["c_mktsegment"])
    back = read_parquet(spark, path)
    assert _sorted(back.select(*nationlike.columns)) == _sorted(nationlike)
    # partition pruning: segment filter must prune input files
    pruned = back.filter("c_mktsegment = 'BUILDING'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_csv_roundtrip_with_nulls(spark, tmp_path):
    df = load(spark, SF, "customer").selectExpr(
        "c_custkey",
        "CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS c_name",
        "c_acctbal",
    )
    path = str(tmp_path / "cust_csv")
    write_csv(df, path)
    back = read_csv(spark, path, df.schema)
    assert _sorted(back) == _sorted(df)
    assert back.filter("c_name IS NULL").count() == df.filter("c_name IS NULL").count()


def test_jsonl_roundtrip_nested(spark, tmp_path):
    df = load(spark, SF, "customer").selectExpr(
        "c_custkey",
        "named_struct('name', c_name, 'segment', c_mktsegment) AS info",
        "array(c_acctbal, c_acctbal * 2) AS balances",
    )
    path = str(tmp_path / "cust_json")
    write_json(df, path)
    back = read_json(spark, path, df.schema)
    assert _sorted(back) == _sorted(df)


def test_timestamp_roundtrip_csv(spark, tmp_path):
    df = load(spark, SF, "orders").select("o_orderkey", "o_orderdate")
    path = str(tmp_path / "orders_csv")
    write_csv(df, path)
    back = read_csv(spark, path, df.schema)
    assert _sorted(back) == _sorted(df)
