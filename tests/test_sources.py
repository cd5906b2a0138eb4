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


class TestPaginatedRestDataSource:
    def test_distributed_fetch_reads_all_pages(self, spark):
        from automated_data_pipeline_python_spark.sources import rest

        rest.register(spark)
        df = (
            spark.read.format("paginated_rest")
            .option(
                "transport",
                "automated_data_pipeline_python_spark.sources.transports_testing:fake_pages_of_ten",
            )
            .option("pages", 7)
            .option("pagesPerPartition", 2)
            .load()
        )
        assert df.rdd.getNumPartitions() == 4  # ceil(7/2) page ranges
        rows = df.collect()
        assert len(rows) == 70
        import json as _json

        ids = sorted(int(_json.loads(r.record)["identifier"]) for r in rows)
        assert ids == list(range(70))

    def test_records_parse_into_typed_bronze(self, spark):
        from pyspark.sql import functions as F
        from automated_data_pipeline_python_spark.sources import rest

        rest.register(spark)
        df = (
            spark.read.format("paginated_rest")
            .option(
                "transport",
                "automated_data_pipeline_python_spark.sources.transports_testing:fake_single_item",
            )
            .option("pages", 3)
            .load()
        )
        typed = df.select(
            F.get_json_object("record", "$.identifier").cast("int").alias("identifier"),
            F.get_json_object("record", "$.name").alias("name"),
        )
        assert sorted(map(tuple, typed.collect())) == [(0, "n0"), (1, "n1"), (2, "n2")]
