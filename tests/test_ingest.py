"""Ingest-boundary tests: normalize/store/cachekeys/fetcher/enrich.

Fixtures model the reference's data shapes (FIXTURES.md §A), including
the documented edge rows: missing metadata_url, null/empty traits,
duplicate URLs, non-numeric identifier, empty input.
"""

from __future__ import annotations

import asyncio

import pytest

from automated_data_pipeline_python_spark.ingest.cachekeys import (
    build_cache_key,
    filter_headers,
    normalize_url,
)
from automated_data_pipeline_python_spark.ingest.enrich import (
    enrichment_join,
    fetch_distinct_urls,
)
from automated_data_pipeline_python_spark.ingest.fetcher import (
    FetchStats,
    RetryingFetcher,
    collect_with_enrichment,
    paginate,
)
from automated_data_pipeline_python_spark.ingest.normalize import (
    from_records,
    normalize_nfts,
)
from automated_data_pipeline_python_spark.ingest.store import to_parquet, write_tables

RAW_RECORDS = [
    {
        "identifier": "1",
        "collection": "c",
        "contract": "0xabc",
        "token_standard": "erc721",
        "name": "one",
        "metadata_url": "http://meta/1",
        "traits": [
            {"trait_type": "color", "value": "red"},
            {"trait_type": "size", "value": "xl"},
        ],
    },
    {
        "identifier": "2",
        "collection": "c",
        "contract": "0xabc",
        "token_standard": "erc721",
        "name": None,
        "metadata_url": None,  # enrichment skipped (reference nft.py:18-20)
        "traits": None,
    },
    {
        "identifier": "not-a-number",  # cast edge
        "collection": "c",
        "contract": "0xabc",
        "token_standard": "erc721",
        "name": "bad id",
        "metadata_url": "http://meta/1",  # duplicate URL
        "traits": [],
    },
]


class TestNormalize:
    def test_schema_applied_and_cast(self, spark):
        tables = normalize_nfts(from_records(spark, RAW_RECORDS))
        nfts = tables["nfts"].orderBy("name").collect()
        assert [f.name for f in tables["nfts"].schema.fields] == [
            "identifier",
            "collection",
            "contract",
            "token_standard",
            "name",
            "metadata_url",
        ]
        by_name = {r.name: r for r in nfts}
        assert by_name["one"].identifier == 1
        assert by_name["bad id"].identifier is None  # non-numeric -> null

    def test_traits_exploded_one_row_per_trait(self, spark):
        # The reference's flatten is a documented no-op
        # (normalize.py:26-29); we implement the intent.
        traits = normalize_nfts(from_records(spark, RAW_RECORDS))["traits"]
        rows = sorted(traits.collect())
        assert [tuple(r) for r in rows] == [
            (1, "color", "red"),
            (1, "size", "xl"),
        ]  # null + empty trait arrays produce no rows

    def test_empty_input_preserves_schema(self, spark):
        tables = normalize_nfts(from_records(spark, []))
        assert tables["nfts"].count() == 0
        assert tables["traits"].columns == ["identifier", "trait_type", "value"]


class TestStore:
    def test_writes_empty_dataset(self, spark, tmp_path):
        # Divergence from reference store.py:9-11 (skips empty tables):
        # we persist schema-preserving empty datasets.
        empty = normalize_nfts(from_records(spark, []))["nfts"]
        path = str(tmp_path / "empty_nfts")
        to_parquet(empty, path)
        back = spark.read.parquet(path)
        assert back.count() == 0
        assert back.columns == empty.columns

    def test_write_tables_roundtrip(self, spark, tmp_path):
        tables = normalize_nfts(from_records(spark, RAW_RECORDS))
        write_tables(tables, str(tmp_path), prefix="slug_")
        nfts = spark.read.parquet(str(tmp_path / "slug_nfts"))
        traits = spark.read.parquet(str(tmp_path / "slug_traits"))
        assert nfts.count() == 3
        assert traits.count() == 2


class TestCacheKeys:
    def test_url_normalization(self):
        # Reference cache.py:29-39: lowercase scheme/host, sorted query,
        # fragment dropped.
        a = normalize_url("HTTP://Api.Example.com/v2/x?b=2&a=1#frag")
        b = normalize_url("http://api.example.com/v2/x?a=1&b=2")
        assert a == b

    def test_header_allowlist(self):
        assert filter_headers(
            {"Accept": "application/json", "X-Api-Key": "secret", "content-type": "a"}
        ) == {"accept": "application/json", "content-type": "a"}

    def test_cache_key_deterministic_and_namespaced(self):
        k1 = build_cache_key("http://x/y?b=2&a=1", {"Accept": "json"})
        k2 = build_cache_key("HTTP://X/y?a=1&b=2", {"accept": "json", "X-Other": "z"})
        assert k1 == k2
        assert k1.startswith("ingest:v1:")
        assert k1 != build_cache_key("http://x/y?a=1&b=3")


def _paged_api(n_pages: int, per_page: int, fail_urls: dict[str, int] | None = None):
    """Fake cursor-paginated endpoint; fail_urls[url] = #failures before ok."""
    remaining = dict(fail_urls or {})

    async def fetch(url: str) -> dict:
        if url in remaining and remaining[url] > 0:
            remaining[url] -= 1
            raise ConnectionError(f"flaky {url}")
        if url.startswith("http://api/page/"):
            page = int(url.rsplit("/", 1)[1])
            items = [
                {"identifier": str(page * per_page + i), "metadata_url": f"http://meta/{(page * per_page + i) % 3}"}
                for i in range(per_page)
            ]
            nxt = f"http://api/page/{page + 1}" if page + 1 < n_pages else None
            return {"items": items, "next": nxt}
        if url.startswith("http://meta/"):
            return {"attributes": [{"trait_type": "mod", "value": url[-1]}]}
        raise KeyError(url)

    return fetch


def _next_url(page: dict, _cur: str) -> str | None:
    return page.get("next")


class TestFetcher:
    def test_paginate_exhausts_cursor(self):
        fetcher = RetryingFetcher(_paged_api(3, 4), wait_initial=0.001)
        items = asyncio.run(paginate(fetcher, "http://api/page/0", _next_url))
        assert len(items) == 12
        assert fetcher.stats.pages == 3

    def test_retry_with_backoff_recovers(self):
        fetch = _paged_api(2, 2, fail_urls={"http://api/page/1": 2})
        fetcher = RetryingFetcher(fetch, wait_initial=0.001)
        items = asyncio.run(paginate(fetcher, "http://api/page/0", _next_url))
        assert len(items) == 4
        assert fetcher.stats.retries == 2

    def test_retry_gives_up_after_max_attempts(self):
        fetch = _paged_api(1, 1, fail_urls={"http://api/page/0": 99})
        fetcher = RetryingFetcher(fetch, max_attempts=3, wait_initial=0.001)
        with pytest.raises(ConnectionError):
            asyncio.run(paginate(fetcher, "http://api/page/0", _next_url))
        assert fetcher.stats.retries == 2

    def test_pipeline_enriches_and_isolates_errors(self):
        # meta/2 always fails -> its items pass through bare
        # (reference nft.py:76-77 error isolation).
        fetch = _paged_api(2, 3, fail_urls={"http://meta/2": 99})
        lf = RetryingFetcher(fetch, wait_initial=0.001)
        ef = RetryingFetcher(fetch, max_attempts=2, wait_initial=0.001)

        def apply(item, extra):
            return {**item, "traits": extra["attributes"]}

        out = asyncio.run(
            collect_with_enrichment(
                lf,
                ef,
                "http://api/page/0",
                _next_url,
                enrich_url=lambda it: it.get("metadata_url"),
                apply_enrichment=apply,
                workers=4,
                queue_size=2,
            )
        )
        assert len(out) == 6
        enriched = [o for o in out if "traits" in o]
        bare = [o for o in out if "traits" not in o]
        assert len(enriched) == 4  # urls meta/0 and meta/1
        assert len(bare) == 2  # meta/2 items survive bare
        assert ef.stats.errors == 2


class TestEnrichmentJoin:
    def test_distinct_url_fetch_then_left_join(self, spark):
        calls: list[str] = []

        async def fetch(url: str) -> dict:
            calls.append(url)
            return {"attributes": [{"trait_type": "mod", "value": url[-1]}]}

        raw = from_records(spark, RAW_RECORDS).drop("traits")
        meta = fetch_distinct_urls(raw, fetch)
        # Duplicate URL fetched once (subsumes the reference's response
        # cache within a run).
        assert calls == ["http://meta/1"]
        joined = enrichment_join(raw, meta)
        rows = {r.name: r for r in joined.collect()}
        assert rows["one"].traits[0].value == "1"
        assert rows["bad id"].traits == rows["one"].traits
        assert rows[None].traits is None  # null URL passes through


class TestIncrementalRefresh:
    def _api(self, upto: int):
        """Server holding records seq 0..upto-1, paginated by 5, with a
        since-cursor endpoint."""

        async def fetch(url: str) -> dict:
            since = int(url.rsplit("=", 1)[1])
            start = since + 1
            items = [
                {"seq": s, "payload": f"rec{s}"}
                for s in range(start, min(start + 5, upto))
            ]
            nxt = (
                f"http://api/records?since={items[-1]['seq']}"
                if items and items[-1]["seq"] + 1 < upto
                else None
            )
            return {"items": items, "next": nxt}

        return fetch

    @staticmethod
    def _url_for(hwm):
        return f"http://api/records?since={-1 if hwm is None else hwm}"

    def test_first_run_lands_everything_then_only_new(self, spark, tmp_path):
        from automated_data_pipeline_python_spark.ingest.incremental import (
            incremental_refresh,
        )

        bronze = str(tmp_path / "bronze")
        schema = "seq long, payload string"
        r1 = incremental_refresh(
            spark, bronze, self._api(12), self._url_for,
            lambda page, _u: page.get("next"), batch_id="b1", schema=schema,
        )
        assert (r1.new_rows, r1.high_water_mark) == (12, 11)

        # No new data upstream -> nothing fetched past the mark.
        r2 = incremental_refresh(
            spark, bronze, self._api(12), self._url_for,
            lambda page, _u: page.get("next"), batch_id="b2", schema=schema,
        )
        assert r2.new_rows == 0

        # Upstream grows -> only the delta lands, in a fresh partition.
        r3 = incremental_refresh(
            spark, bronze, self._api(20), self._url_for,
            lambda page, _u: page.get("next"), batch_id="b3", schema=schema,
        )
        assert (r3.new_rows, r3.high_water_mark) == (8, 19)
        total = spark.read.parquet(bronze)
        assert total.count() == 20
        assert total.select("seq").distinct().count() == 20

    def test_rerun_same_batch_is_idempotent(self, spark, tmp_path):
        from automated_data_pipeline_python_spark.ingest.incremental import (
            incremental_refresh,
        )

        bronze = str(tmp_path / "bronze2")
        schema = "seq long, payload string"
        incremental_refresh(
            spark, bronze, self._api(7), self._url_for,
            lambda page, _u: page.get("next"), batch_id="b1", schema=schema,
        )
        # Simulate a retry of the same batch against a server that still
        # reports the same data: partition overwritten, no duplicates...
        import shutil as _sh

        _sh.rmtree(f"{bronze}/batch=b1")  # lost partition -> hwm resets
        r = incremental_refresh(
            spark, bronze, self._api(7), self._url_for,
            lambda page, _u: page.get("next"), batch_id="b1", schema=schema,
        )
        assert r.new_rows == 7
        assert spark.read.parquet(bronze).count() == 7
