"""Streaming tests: batch/stream parity on the events table.

Each test streams the sf0.001 events parquet through a transformation
(availableNow trigger → memory sink) and compares against the identical
transformation applied in batch.
"""

from __future__ import annotations

import shutil

import pytest

from automated_data_pipeline_python_spark.streaming.events import (
    dedup_events,
    read_events_stream,
    run_to_memory,
    sessionize,
    tumbling_counts,
    with_watermark,
)
from automated_data_pipeline_python_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_counts_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(tumbling_counts(stream), "t_tumbling")
    want = tumbling_counts(load(spark, SF_DIR, "events"))
    cols = ["win_start", "event_type", "cnt"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_sessionize_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(sessionize(stream), "t_sessions")
    want = sessionize(load(spark, SF_DIR, "events"))
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_incremental_microbatches_converge(spark, events_dir, tmp_path):
    # Split the file into two "arrivals" and bound ingest rate: the
    # backpressure analogue of the reference's Queue(maxsize=500)
    # (reference nft.py:63). Final aggregate must equal single-shot batch.
    d = tmp_path / "multi"
    d.mkdir()
    ev = load(spark, SF_DIR, "events")
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    for name, part in [("a", a), ("b", b)]:
        part.selectExpr(
            "event_id",
            "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts) AS LONG) * 1000 AS ts",
            "user_id",
            "event_type",
            "value",
            "props",
        ).coalesce(1).write.parquet(str(d / name))
    # flatten part files into the watch dir
    watch = tmp_path / "watch"
    watch.mkdir()
    i = 0
    for sub in d.iterdir():
        for f in sub.glob("*.parquet"):
            shutil.copy(f, watch / f"part-{i:03d}.parquet")
            i += 1
    stream = read_events_stream(spark, str(watch), max_files_per_trigger=1)
    got = run_to_memory(tumbling_counts(stream), "t_incremental")
    want = tumbling_counts(ev)
    cols = ["win_start", "event_type", "cnt"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_dedup_within_watermark_drops_duplicates(spark, events_dir, tmp_path):
    # Duplicate the entire input (two identical files) → stateful dedup
    # must return each event_id once.
    d = tmp_path / "dup"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-001.parquet")
    stream = read_events_stream(spark, str(d))
    deduped = dedup_events(with_watermark(stream, "2 hours"), within_watermark=True)
    got = run_to_memory(deduped.select("event_id"), "t_dedup", output_mode="append")
    n_unique = load(spark, SF_DIR, "events").select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.distinct().count() == n_unique
