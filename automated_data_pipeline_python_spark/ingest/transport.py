"""Production HTTP transport bindings for the injectable fetch seam.

The reference ships a pooled HTTP/2 httpx AsyncClient as its one real
transport (reference pipeline/utils/api.py:33-46: shared client,
connection pool, timeout, default headers). The engine keeps the seam
injectable (``FetchFn = Callable[[str], Awaitable[dict]]``) and this
module provides the real bindings:

- :class:`HttpxTransport` — pooled HTTP/2 client, used when httpx is
  importable (deployment image). Import-gated: this container does not
  ship httpx.
- :class:`PooledHttpTransport` — urllib3 ``PoolManager`` binding
  (pooled keep-alive HTTP/1.1, stdlib-adjacent, present everywhere
  Spark's Python is). Sync client bridged onto the event loop with
  ``asyncio.to_thread`` so the async fetcher pipeline
  (``RetryingFetcher`` / ``collect_with_enrichment``) drives it
  unchanged; the fetcher's BoundedSemaphore caps the number of
  concurrent threads at ``max_concurrency``.

Transport contract (what ``RetryingFetcher`` expects):
- return the decoded JSON dict on 2xx,
- raise on transport errors AND on retryable HTTP statuses — retry
  policy (attempts/backoff/jitter) lives in ``RetryingFetcher``
  (reference api.py:154 @retry), never in the transport,
- no retries, no sleeps, no global state inside the transport itself.

``make_transport`` picks the best available binding.
"""

from __future__ import annotations

import asyncio
import json
from typing import Any

__all__ = [
    "HttpStatusError",
    "HttpxTransport",
    "PooledHttpTransport",
    "make_transport",
]


class HttpStatusError(Exception):
    """Non-2xx response; carries the status for retry/skip decisions."""

    def __init__(self, url: str, status: int, body_snippet: str = ""):
        super().__init__(f"HTTP {status} for {url}: {body_snippet[:200]}")
        self.url = url
        self.status = status


class PooledHttpTransport:
    """urllib3-backed pooled transport (keep-alive HTTP/1.1).

    One ``PoolManager`` per transport instance = one connection pool
    shared across all fetches, mirroring the reference's single shared
    client (api.py:33-46). ``num_pools``/``maxsize`` bound sockets the
    way httpx's ``Limits(max_connections=...)`` does.
    """

    def __init__(
        self,
        headers: dict[str, str] | None = None,
        timeout_s: float = 30.0,
        maxsize: int = 15,
        num_pools: int = 4,
    ) -> None:
        import urllib3

        self._http = urllib3.PoolManager(
            num_pools=num_pools,
            maxsize=maxsize,
            block=False,
            headers=headers or {},
            timeout=urllib3.Timeout(total=timeout_s),
            # Retry policy belongs to RetryingFetcher — but retries=False
            # would also disable redirect FOLLOWING in urllib3, turning a
            # permanent 301/302 into an HttpStatusError that the fetcher
            # retries to exhaustion. Allow redirects only: total must be
            # None (it takes precedence over every per-category count,
            # so total=0 would block redirects too — verified against a
            # live server), with connect/read/status/other retries at 0.
            retries=urllib3.Retry(
                total=None, connect=0, read=0, status=0, other=0, redirect=3
            ),
        )

    def fetch_sync(self, url: str) -> dict[str, Any]:
        resp = self._http.request("GET", url)
        if not 200 <= resp.status < 300:
            raise HttpStatusError(url, resp.status, resp.data[:200].decode("utf-8", "replace"))
        return json.loads(resp.data.decode("utf-8"))

    async def __call__(self, url: str) -> dict[str, Any]:
        # Bridge the sync pool onto the loop; concurrency is bounded by
        # the fetcher's semaphore, so at most max_concurrency threads.
        return await asyncio.to_thread(self.fetch_sync, url)

    def close(self) -> None:
        self._http.clear()

    def __enter__(self) -> "PooledHttpTransport":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()


class HttpxTransport:
    """httpx-backed pooled HTTP/2 transport (deployment binding).

    Exact reference-parity client (api.py:33-46: http2=True, shared
    AsyncClient, pool limits, default headers). Import-gated — raises
    ImportError where httpx is absent; ``make_transport`` falls back to
    :class:`PooledHttpTransport` there.
    """

    def __init__(
        self,
        headers: dict[str, str] | None = None,
        timeout_s: float = 30.0,
        max_connections: int = 15,
    ) -> None:
        import httpx  # deployment-only dependency

        self._client = httpx.AsyncClient(
            http2=True,
            headers=headers or {},
            timeout=timeout_s,
            limits=httpx.Limits(max_connections=max_connections),
        )

    async def __call__(self, url: str) -> dict[str, Any]:
        resp = await self._client.get(url)
        if not 200 <= resp.status_code < 300:
            raise HttpStatusError(url, resp.status_code, resp.text)
        return resp.json()

    async def aclose(self) -> None:
        await self._client.aclose()


def make_transport(
    headers: dict[str, str] | None = None,
    timeout_s: float = 30.0,
    max_connections: int = 15,
):
    """Best available pooled transport: httpx (HTTP/2) when importable,
    else urllib3. Returns an async callable satisfying ``FetchFn``."""
    try:
        return HttpxTransport(
            headers=headers, timeout_s=timeout_s, max_connections=max_connections
        )
    except ImportError:
        return PooledHttpTransport(
            headers=headers, timeout_s=timeout_s, maxsize=max_connections
        )
