"""Hermetic fake transports for the paginated REST data source.

Live in the package (not tests/) so Python worker processes can import
them by dotted path regardless of how the test runner set up sys.path.
"""

from __future__ import annotations


def fake_pages_of_ten(page: int) -> dict:
    return {
        "items": [
            {"identifier": str(page * 10 + i), "page_of": page} for i in range(10)
        ]
    }


def fake_single_item(page: int) -> dict:
    return {"items": [{"identifier": str(page), "name": f"n{page}"}]}


def fake_bounded_feed(page: int) -> dict:
    """7 pages of 5 items, then empty forever (a drained feed)."""
    if page >= 7:
        return {"items": []}
    return {
        "items": [{"identifier": str(page * 5 + i), "page_of": page} for i in range(5)]
    }


def fake_partial_tail_feed(page: int) -> dict:
    """2 full pages of 5, then a still-filling tail page of 3."""
    if page < 2:
        return {
            "items": [{"identifier": str(page * 5 + i)} for i in range(5)]
        }
    if page == 2:
        return {"items": [{"identifier": str(10 + i)} for i in range(3)]}
    return {"items": []}
