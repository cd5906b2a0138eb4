"""Custom Python Data Source: distributed paginated-REST ingest.

The reference fetches one collection driver-side (asyncio,
pipeline/collectors/nft.py). At 100 TB-scale ingest you fan the fetch
out across executors; Spark 4's Python Data Source API
(``spark.dataSource.register``) makes that a first-class ``spark.read``
— each *partition* owns a page range and fetches inside the executor,
so rate limits, retries, and progress all ride on Spark's task machinery
(SURVEY §2.1 S2 "at scale" disposition).

The transport is named by dotted import path (``pkg.module:callable``)
because the DataSource is re-instantiated inside separate Python worker
processes — only importable references survive the boundary (module
globals and driver-side registries do not).
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Callable, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("record", T.StringType()),  # raw JSON (bronze shape)
    ]
)


def _resolve(path: str) -> Callable[[int], dict]:
    """``pkg.module:callable`` → the callable (importable on any worker)."""
    module_name, _, attr = path.partition(":")
    if not attr:
        raise ValueError(f"transport must be 'module:callable', got {path!r}")
    return getattr(importlib.import_module(module_name), attr)


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class PaginatedRestReader(DataSourceReader):
    def __init__(self, transport: str, n_pages: int, pages_per_partition: int) -> None:
        self.transport = transport
        self.n_pages = n_pages
        self.pages_per_partition = pages_per_partition

    def partitions(self) -> list[InputPartition]:
        step = self.pages_per_partition
        return [
            _PageRange(lo, min(lo + step, self.n_pages))
            for lo in range(0, self.n_pages, step)
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        fetch_page = _resolve(self.transport)
        for page in range(partition.start, partition.end):
            payload = fetch_page(page)
            for item in payload.get("items", []):
                yield (page, json.dumps(item, sort_keys=True))


class PaginatedRestDataSource(DataSource):
    """``spark.read.format("paginated_rest")`` source.

    Options: ``transport`` (dotted path ``module:callable`` returning a
    page dict), ``pages`` (total page count, discovered by a driver-side
    probe in practice), ``pagesPerPartition`` (fan-out granularity — one
    task per range).
    """

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> T.StructType:
        return RECORD_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return PaginatedRestReader(
            transport=self.options["transport"],
            n_pages=int(self.options.get("pages", "1")),
            pages_per_partition=int(self.options.get("pagesperpartition", "4")),
        )


def register(spark) -> None:
    spark.dataSource.register(PaginatedRestDataSource)
