"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's query catalog
(``automated_data_pipeline_python_spark.queries``): ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2;
``entry()`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automated_data_pipeline_python_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _catalog.oracle_sql()
