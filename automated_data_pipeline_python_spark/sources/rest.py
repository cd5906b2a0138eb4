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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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


class PaginatedRestStreamReader(SimpleDataSourceStreamReader):
    """Incremental REST poll as a Structured Streaming source.

    Offsets are page numbers — the same replayable-cursor contract Kafka
    uses — so recovery re-fetches a deterministic page range
    (``readBetweenOffsets``) and the sink sees each page exactly once
    across restarts. ``read`` advances at most ``pages_per_batch`` pages
    per micro-batch.

    Exactly-once hinges on the offset only ever crossing IMMUTABLE
    pages: a page with fewer than ``page_size`` items is the feed's
    still-filling tail (the standard paginated-API contract — a page is
    complete once a later page exists, and it is full just before
    that). Ingesting a partial page and advancing past it would both
    drop the items appended to it later AND let a post-restart
    ``readBetweenOffsets`` replay a different row set than the batch
    originally committed. So ``read`` stops BEFORE any non-full page;
    the tail is re-polled next trigger and ingested whole once it
    fills (or once the caller knows the feed is drained).

    The *simple* stream-reader API prefetches on the driver — right for
    the modest page rates a polled API allows (the rate limiter is the
    remote service, not Spark). A feed hot enough to need executor-side
    parallel fetch would implement ``DataSourceStreamReader`` with page
    ranges as partitions, exactly like the batch reader above.
    """

    def __init__(self, transport: str, pages_per_batch: int, page_size: int) -> None:
        self.transport = transport
        self.pages_per_batch = pages_per_batch
        self.page_size = page_size

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        fetch_page = _resolve(self.transport)
        rows: list[tuple] = []
        page = start["page"]
        for _ in range(self.pages_per_batch):
            items = fetch_page(page).get("items", [])
            if len(items) < self.page_size:
                break  # still-filling tail page: re-poll it next trigger
            rows.extend((page, json.dumps(i, sort_keys=True)) for i in items)
            page += 1
        return iter(rows), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        fetch_page = _resolve(self.transport)
        for page in range(start["page"], end["page"]):
            for item in fetch_page(page).get("items", []):
                yield (page, json.dumps(item, sort_keys=True))


class PaginatedRestDataSource(DataSource):
    """``spark.read.format("paginated_rest")`` source (batch + stream).

    Options: ``transport`` (dotted path ``module:callable`` returning a
    page dict), ``pages`` (total page count, discovered by a driver-side
    probe in practice), ``pagesPerPartition`` (batch fan-out granularity
    — one task per range), ``pagesPerBatch`` (streaming: max pages per
    micro-batch), ``pageSize`` (streaming: the feed's full-page item
    count — pages below it are treated as the still-filling tail and
    not crossed; see PaginatedRestStreamReader).
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

    def simpleStreamReader(self, schema: T.StructType) -> SimpleDataSourceStreamReader:
        return PaginatedRestStreamReader(
            transport=self.options["transport"],
            pages_per_batch=int(self.options.get("pagesperbatch", "4")),
            page_size=int(self.options.get("pagesize", "1")),
        )


def register(spark) -> None:
    spark.dataSource.register(PaginatedRestDataSource)
