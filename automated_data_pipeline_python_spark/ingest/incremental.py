"""Incremental ingest: high-water-mark refresh of the bronze zone.

The reference keeps re-runs cheap with RFC-9111 revalidation against a
Redis response cache (reference pipeline/utils/api.py:140-214 — ETag /
max-age / stale-while-revalidate). In a durable-lake engine the same
goal — don't refetch what you already have — is met structurally
(SURVEY §4.3): bronze is persistent and append-only, and each refresh
fetches only records newer than the stored high-water mark, landing them
in a new partition.

This module is pure driver-side orchestration around the injectable
fetcher; the engine sees only parquet.
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.ingest.fetcher import (
    RetryingFetcher,
    paginate,
)


@dataclass(frozen=True)
class RefreshResult:
    new_rows: int
    high_water_mark: int | None
    partition: str | None


def current_high_water_mark(
    spark: SparkSession, bronze_path: str, cursor_col: str
) -> int | None:
    """Max cursor value already landed, or None for an empty/missing zone."""
    try:
        df = spark.read.parquet(bronze_path)
    except Exception:
        return None
    row = df.agg(F.max(cursor_col).alias("hwm")).collect()[0]
    return row.hwm


def incremental_refresh(
    spark: SparkSession,
    bronze_path: str,
    fetch: Callable[[str], Awaitable[dict]],
    url_for_cursor: Callable[[int | None], str],
    next_url: Callable[[dict, str], str | None],
    cursor_col: str = "seq",
    batch_id: str = "0",
    schema=None,
) -> RefreshResult:
    """Fetch only records past the stored high-water mark; append them as
    a new bronze partition (idempotent per ``batch_id``: re-running the
    same batch overwrites its own partition only).
    """
    hwm = current_high_water_mark(spark, bronze_path, cursor_col)
    fetcher = RetryingFetcher(fetch)
    items = asyncio.run(paginate(fetcher, url_for_cursor(hwm), next_url))
    fresh = [it for it in items if hwm is None or it[cursor_col] > hwm]
    if not fresh:
        return RefreshResult(0, hwm, None)
    df: DataFrame = spark.createDataFrame(fresh, schema=schema)
    partition = f"{bronze_path.rstrip('/')}/batch={batch_id}"
    df.write.mode("overwrite").parquet(partition)
    new_hwm = max(it[cursor_col] for it in fresh)
    return RefreshResult(len(fresh), new_hwm, partition)
