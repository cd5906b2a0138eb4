"""Time-series family: behaviors the sf0.01 oracle replay can't cover.

The recursion-depth test matters at scale: Spark's default
cteRecursionLevelLimit (100) silently bounds the EWMA/CUSUM series
length at ~3 months of days; the operators raise the limit themselves
(vanilla driver session — no pre-configured conf to lean on), and this
test proves a year-plus series works end-to-end and still matches the
DuckDB oracle on the same long corpus.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

from automated_data_pipeline_python_spark.queries import QUERIES
from tests.oracle import assert_matches_oracle


@pytest.fixture(scope="module")
def long_events_dir(tmp_path_factory):
    """150 daily events per type — deterministic, no randomness. 150 >
    the default 100-level recursion limit, which is the failure this
    test pins (each recursion level is its own Spark job, so the day
    count is also the test-runtime knob)."""
    base = tmp_path_factory.mktemp("long_events")
    rows = []
    eid = 0
    t0 = datetime.datetime(2020, 1, 1)
    for day in range(150):
        for j, etype in enumerate(["view", "click", "purchase"]):
            # varying per-day count: 1 + ((day*7 + j) % 5) events
            for k in range(1 + (day * 7 + j) % 5):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": t0
                        + datetime.timedelta(days=day, minutes=10 * k + j),
                        "user_id": (eid * 13) % 50,
                        "event_type": etype,
                        "value": float(k),
                        "props": "{}",
                    }
                )
                eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(base / "events.parquet", index=False)
    return str(base)


@pytest.mark.parametrize(
    "name", ["events_ewma_daily", "events_cusum_changepoints"]
)
def test_recursive_series_survives_400_days(name, spark, long_events_dir):
    q = QUERIES[name]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{long_events_dir}/events.parquet'"
    )
    df = q.fn(spark, long_events_dir)
    assert_matches_oracle(df, con, q.oracle, name=name)
    assert df.count() == 150 * 3
