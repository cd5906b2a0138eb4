"""Managed-table storage: bucketing for co-located, shuffle-free joins.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
both tables bucketed by the join key (same bucket count) lets Spark plan
a SortMergeJoin with **no Exchange** on either side — the join becomes
embarrassingly parallel per bucket. ``tests/test_storage.py`` asserts
exactly that on the executed plan.

Bucketing requires the session catalog (``saveAsTable``): bucket
metadata lives in the metastore, not the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
