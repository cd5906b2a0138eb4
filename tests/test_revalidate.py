"""Conditional-revalidation state machine (reference api.py:140-214)."""

from __future__ import annotations

import asyncio

import pytest

from automated_data_pipeline_python_spark.ingest.revalidate import (
    CacheEntry,
    ConditionalFetcher,
    load_records,
    store_records,
)


class Clock:
    def __init__(self) -> None:
        self.now = 1000.0

    def __call__(self) -> float:
        return self.now


class Server:
    """Scriptable transport recording every request's headers."""

    def __init__(self) -> None:
        self.requests: list[tuple[str, dict]] = []
        self.responses: list[tuple[int, dict, dict]] = []
        self.fail_first = 0

    async def fetch(self, url: str, headers: dict) -> tuple[int, dict, dict]:
        self.requests.append((url, dict(headers)))
        if self.fail_first > 0:
            self.fail_first -= 1
            raise ConnectionError("boom")
        return self.responses.pop(0)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture()
def rig():
    server = Server()
    clock = Clock()
    f = ConditionalFetcher(
        server.fetch, clock=clock, max_attempts=3, wait_initial=0.001
    )
    return server, clock, f


def test_fresh_entry_served_without_network(rig):
    server, clock, f = rig
    server.responses = [(200, {"ETag": 'W/"a"', "Cache-Control": "max-age=60"}, {"v": 1})]
    assert run(f.get("u"))["v"] == 1
    clock.now += 30  # still fresh
    assert run(f.get("u"))["v"] == 1
    assert len(server.requests) == 1
    assert f.stats.cache_hits == 1


def test_stale_304_refreshes_ttl_and_serves_cached(rig):
    server, clock, f = rig
    server.responses = [
        (200, {"ETag": 'W/"a"', "Cache-Control": "max-age=60"}, {"v": 1}),
        (304, {"Cache-Control": "max-age=60"}, {}),
    ]
    run(f.get("u"))
    clock.now += 120  # stale → conditional request
    assert run(f.get("u"))["v"] == 1
    assert server.requests[1][1] == {"if-none-match": 'W/"a"'}
    assert f.stats.revalidated_304 == 1
    clock.now += 30  # TTL was refreshed by the 304
    assert run(f.get("u"))["v"] == 1
    assert len(server.requests) == 2


def test_stale_200_replaces_entry(rig):
    server, clock, f = rig
    server.responses = [
        (200, {"ETag": 'W/"a"', "Cache-Control": "max-age=60"}, {"v": 1}),
        (200, {"ETag": 'W/"b"', "Cache-Control": "max-age=60"}, {"v": 2}),
    ]
    run(f.get("u"))
    clock.now += 120
    assert run(f.get("u"))["v"] == 2
    assert f.store["u"].etag == 'W/"b"'
    assert f.stats.refetched_200 == 2


def test_no_cache_always_revalidates(rig):
    server, clock, f = rig
    server.responses = [
        (200, {"ETag": 'W/"a"', "Cache-Control": "no-cache, max-age=60"}, {"v": 1}),
        (304, {}, {}),
    ]
    run(f.get("u"))
    assert run(f.get("u"))["v"] == 1  # fresh but no-cache → conditional hit
    assert len(server.requests) == 2


def test_no_store_never_cached(rig):
    server, clock, f = rig
    server.responses = [
        (200, {"Cache-Control": "no-store"}, {"v": 1}),
        (200, {"Cache-Control": "no-store"}, {"v": 2}),
    ]
    assert run(f.get("u"))["v"] == 1
    assert "u" not in f.store
    assert run(f.get("u"))["v"] == 2


def test_last_modified_used_when_no_etag(rig):
    server, clock, f = rig
    server.responses = [
        (200, {"Last-Modified": "Mon", "Cache-Control": "max-age=1"}, {"v": 1}),
        (304, {}, {}),
    ]
    run(f.get("u"))
    clock.now += 5
    run(f.get("u"))
    assert server.requests[1][1] == {"if-modified-since": "Mon"}


def test_stale_while_revalidate_serves_stale_then_updates(rig):
    server, clock, f = rig
    server.responses = [
        (200, {"ETag": 'W/"a"',
               "Cache-Control": "max-age=1, stale-while-revalidate=60"}, {"v": 1}),
        (200, {"ETag": 'W/"b"', "Cache-Control": "max-age=60"}, {"v": 2}),
    ]

    async def scenario():
        await f.get("u")
        clock.now += 5
        stale = await f.get("u")  # served immediately from stale cache
        await f.drain_background()
        return stale

    assert run(scenario())["v"] == 1
    assert f.store["u"].body == {"v": 2}  # background revalidation landed


def test_retry_composes_with_conditional_exchange(rig):
    server, clock, f = rig
    server.fail_first = 2
    server.responses = [(200, {"Cache-Control": "max-age=60"}, {"v": 1})]
    assert run(f.get("u"))["v"] == 1
    assert f.stats.retries == 2
    assert len(server.requests) == 3


def test_store_roundtrips_through_parquet(rig, spark, tmp_path):
    server, clock, f = rig
    server.responses = [
        (200, {"ETag": 'W/"a"', "Cache-Control": "max-age=60"}, {"k": "v"}),
    ]
    run(f.get("u"))
    path = str(tmp_path / "sidecar.parquet")
    schema = (
        "url string, body map<string,string>, etag string, "
        "last_modified string, cache_control string, fetched_at double"
    )
    spark.createDataFrame(store_records(f.store), schema).write.parquet(path)
    rows = [r.asDict() for r in spark.read.parquet(path).collect()]
    restored = load_records(rows)
    assert restored["u"].etag == 'W/"a"'
    assert restored["u"].body == {"k": "v"}
    assert restored["u"].is_fresh(clock.now + 30)
