"""Paginated REST ingestion with retry, backpressure, and error isolation.

Re-expresses the reference's collector architecture
(``pipeline/collectors/nft.py:25-99`` + ``pipeline/utils/api.py``):

- cursor-paginated producer feeding a bounded ``asyncio.Queue``
  (reference nft.py:25-45,63)
- a worker pool consuming items with per-item error isolation
  (reference nft.py:66-86: log & skip, run survives)
- sentinel shutdown (reference nft.py:89-96)
- retry with exponential backoff (reference api.py:154,23)
- bounded concurrency semaphore (reference api.py:54,176)

The transport is injected (``fetch: Callable[[str], Awaitable[dict]]``)
so tests run hermetically and the engine has no HTTP dependency; wire in
an httpx/aiohttp client at deployment. The output is a bronze-layer
record list ready for ``spark.createDataFrame`` — re-runs then read
bronze parquet instead of refetching, which replaces the reference's
Redis response cache (SURVEY.md §4.3).

At scale: run this driver-side for small collections; for large fetch
fan-out, partition a DataFrame of page cursors / URLs and run the same
coroutine per partition inside ``mapInPandas`` with a per-partition
client (bounded concurrency per executor).
"""

from __future__ import annotations

import asyncio
import logging
import random
from collections.abc import Awaitable, Callable
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)

FetchFn = Callable[[str], Awaitable[dict]]


@dataclass
class FetchStats:
    """Run counters (reference api.py:22 Counter equivalent)."""

    pages: int = 0
    items: int = 0
    enriched: int = 0
    errors: int = 0
    retries: int = 0
    skipped: list[str] = field(default_factory=list)


class RetryingFetcher:
    """Bounded-concurrency fetch with exponential backoff + jitter.

    Reference parity: stamina @retry(wait_initial=1, wait_max=300)
    (api.py:154,23) and BoundedSemaphore(max_concurrency) (api.py:54).
    """

    def __init__(
        self,
        fetch: FetchFn,
        max_concurrency: int = 15,
        max_attempts: int = 5,
        wait_initial: float = 1.0,
        wait_max: float = 300.0,
        stats: FetchStats | None = None,
        rng: random.Random | None = None,
    ) -> None:
        self._fetch = fetch
        self._semaphore = asyncio.BoundedSemaphore(max_concurrency)
        self._max_attempts = max_attempts
        self._wait_initial = wait_initial
        self._wait_max = wait_max
        self.stats = stats or FetchStats()
        self._rng = rng or random.Random()

    async def get(self, url: str) -> dict:
        delay = self._wait_initial
        async with self._semaphore:
            for attempt in range(1, self._max_attempts + 1):
                try:
                    return await self._fetch(url)
                except Exception:
                    if attempt == self._max_attempts:
                        raise
                    self.stats.retries += 1
                    sleep = min(delay, self._wait_max) * (0.5 + self._rng.random())
                    logger.warning("retry %d for %s in %.1fs", attempt, url, sleep)
                    await asyncio.sleep(sleep)
                    delay *= 2
        raise AssertionError("unreachable")


async def paginate(
    fetcher: RetryingFetcher,
    first_url: str,
    next_url: Callable[[dict, str], str | None],
    items_key: str = "items",
) -> list[dict]:
    """Follow a cursor-paginated endpoint to exhaustion.

    ``next_url(page_json, current_url)`` returns the next URL or None
    (reference nft.py:25-45: OpenSea ``next`` cursor loop).
    """
    url: str | None = first_url
    items: list[dict] = []
    while url:
        page = await fetcher.get(url)
        batch = page.get(items_key, [])
        items.extend(batch)
        fetcher.stats.pages += 1
        fetcher.stats.items += len(batch)
        url = next_url(page, url)
    return items


async def collect_with_enrichment(
    list_fetcher: RetryingFetcher,
    enrich_fetcher: RetryingFetcher,
    first_url: str,
    next_url: Callable[[dict, str], str | None],
    enrich_url: Callable[[dict], str | None],
    apply_enrichment: Callable[[dict, dict], dict],
    items_key: str = "items",
    queue_size: int = 500,
    workers: int = 15,
) -> list[dict]:
    """Producer→queue→worker-pool pipeline with per-item error isolation.

    Reference parity (nft.py:47-99): the producer pushes items onto a
    bounded queue while ``workers`` consumers enrich concurrently;
    enrichment failures are logged and the bare item kept (nft.py:76-77
    isolates per-NFT exceptions); items without an enrichment URL pass
    through (nft.py:18-20); sentinel shutdown after the producer drains
    (nft.py:89-96).
    """
    queue: asyncio.Queue[dict | None] = asyncio.Queue(maxsize=queue_size)
    out: list[dict] = []
    stats = enrich_fetcher.stats

    async def producer() -> None:
        url: str | None = first_url
        while url:
            page = await list_fetcher.get(url)
            for item in page.get(items_key, []):
                await queue.put(item)
                list_fetcher.stats.items += 1
            list_fetcher.stats.pages += 1
            url = next_url(page, url)

    async def worker() -> None:
        while True:
            item = await queue.get()
            try:
                if item is None:
                    return
                url = enrich_url(item)
                if not url:
                    out.append(item)
                    continue
                try:
                    extra = await enrich_fetcher.get(url)
                    out.append(apply_enrichment(item, extra))
                    stats.enriched += 1
                except Exception:
                    logger.exception("enrichment failed; keeping bare item")
                    stats.errors += 1
                    out.append(item)
            finally:
                queue.task_done()

    tasks = [asyncio.create_task(worker()) for _ in range(workers)]
    await producer()
    for _ in tasks:
        await queue.put(None)
    await asyncio.gather(*tasks)
    return out
