"""Broadcast-independence: results must not depend on join strategy.

At 100 TB, joins that broadcast at test scale (dimensions, dedup
bucket tables) can exceed autoBroadcastJoinThreshold and silently fall
back to shuffle joins. These tests disable broadcasting entirely and
assert bit-identical results for the join-heaviest headline queries —
proving the plans are strategy-agnostic, not accidentally dependent on
build-side semantics (e.g. a hint that changes null behavior).
"""

from __future__ import annotations

import pytest

from automated_data_pipeline_python_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

JOIN_HEAVY = [
    "q5_region_revenue",
    "q8_market_share",
    "q18_large_volume_customers",   # big-orders hint dropped in round 5
    "q21_sole_late_shipper",
    "dedup_minhash_lsh",
    "contamination_ngram_overlap",
    "join_asof_purchase_click",
    "doc_unigram_surprisal",        # vocab join must be strategy-agnostic
    "cdc_snapshot_diff",            # full-outer diff join
    "dedup_incremental_minhash",    # band-index probe join
    "text_token_pmi",               # hot-list join + doc-level pair join
    "pipe_syntax_nation_value",     # unhinted pipe-syntax star join
    "events_rolling_wau",           # day-spine range join
    "ann_ndcg_eval",                # exact/approx scoring join
    "dedup_substring_windows",      # window-hash count join-back
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in row) for row in df.select(*cols).collect())


@pytest.mark.parametrize("name", JOIN_HEAVY)
def test_result_identical_without_broadcasts(spark, name):
    default = _canon(QUERIES[name].fn(spark, SF_SMOKE))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        no_bcast = _canon(QUERIES[name].fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert no_bcast == default, f"{name}: result depends on join strategy"


TIME_SENSITIVE = [
    "events_tumbling_10min",
    "events_sessionization",
    "events_interval_join",
    "join_asof_purchase_click",
    "gapfill_monthly_orders",
    "events_path_patterns",
    "events_ohlc_hourly",
]


@pytest.mark.parametrize("name", TIME_SENSITIVE)
def test_result_identical_across_session_timezones(spark, name):
    """The driver runs a VANILLA session (machine timezone, not our UTC
    factory conf). Timestamps are NTZ end-to-end, so results must be
    identical under any session timezone — pinned against a shifted one."""
    default = _canon(QUERIES[name].fn(spark, SF_SMOKE))
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")  # UTC+14
    try:
        shifted = _canon(QUERIES[name].fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert shifted == default, f"{name}: result depends on session timezone"
