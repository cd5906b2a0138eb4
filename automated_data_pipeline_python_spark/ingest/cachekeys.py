"""Canonical request identity functions.

Same semantics as the reference's cache-key construction
(``pipeline/utils/cache.py:29-74``): normalize the URL (lowercase
scheme/host, sorted query params, fragment dropped), allowlist the vary
headers, then SHA-256 over a canonical JSON envelope, namespaced.

In the Spark engine these are used at the ingest boundary (driver-side,
plain Python) for idempotent bronze-layer fetches, and the same
construction doubles as the exact-dedup canonical key column-side
(``F.sha2(F.to_json(F.struct(...)), 256)``, see queries/dedup.py).
"""

from __future__ import annotations

import hashlib
import json
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

# Headers that participate in request identity (reference cache.py:41-55).
VARY_HEADER_ALLOWLIST = frozenset({"accept", "content-type"})

KEY_NAMESPACE = "ingest"
KEY_VERSION = "v1"


def normalize_url(url: str) -> str:
    """Canonical URL: lowercase scheme/host, sorted query, no fragment.

    Reference parity: pipeline/utils/cache.py:29-39.
    """
    parts = urlsplit(url)
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc.lower(), parts.path, query, "")
    )


def filter_headers(headers: dict[str, str]) -> dict[str, str]:
    """Keep only identity-relevant headers, lowercase keys.

    Reference parity: pipeline/utils/cache.py:41-55.
    """
    return {
        k.lower(): v
        for k, v in sorted(headers.items(), key=lambda kv: kv[0].lower())
        if k.lower() in VARY_HEADER_ALLOWLIST
    }


def build_cache_key(url: str, headers: dict[str, str] | None = None) -> str:
    """``namespace:v1:sha256(canonical-json)`` request identity.

    Reference parity: pipeline/utils/cache.py:58-74.
    """
    envelope = {
        "url": normalize_url(url),
        "headers": filter_headers(headers or {}),
    }
    canonical = json.dumps(envelope, sort_keys=True, separators=(",", ":"))
    digest = hashlib.sha256(canonical.encode("utf-8")).hexdigest()
    return f"{KEY_NAMESPACE}:{KEY_VERSION}:{digest}"
