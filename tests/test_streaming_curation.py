"""Streaming curation gate: stream==batch parity and kept-only sink.

The gate is map-only, so streaming it in append mode must produce
exactly the rows the oracle-checked batch catalog query produces.
"""

from __future__ import annotations

import shutil

import pytest

from automated_data_pipeline_python_spark.queries import QUERIES
from automated_data_pipeline_python_spark.streaming.documents import (
    quality_gated_stream,
    read_documents_stream,
)
from automated_data_pipeline_python_spark.streaming.events import run_to_memory
from tests.conftest import SF_SMOKE


@pytest.fixture()
def docs_dir(tmp_path):
    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/documents.parquet", d / "part-000.parquet")
    return str(d)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_streamed_gate_equals_batch_catalog_query(spark, docs_dir):
    stream = quality_gated_stream(read_documents_stream(spark, docs_dir))
    got = run_to_memory(stream, "gate_stream", output_mode="append")
    batch = QUERIES["quality_logistic_filter"].fn(spark, SF_SMOKE)
    assert _canon(got) == _canon(batch)


def test_gate_parity_across_micro_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 over a two-file input forces two
    micro-batches; a map-only gate must be batch-boundary-invariant."""
    d = tmp_path / "docs_stream_2"
    d.mkdir()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    half = docs.count() // 2
    docs.where(f"doc_id < {half}").coalesce(1).write.parquet(str(d / "f0"))
    docs.where(f"doc_id >= {half}").coalesce(1).write.parquet(str(d / "f1"))
    stream = quality_gated_stream(
        read_documents_stream(spark, f"{d}/*/", max_files_per_trigger=1)
    )
    got = run_to_memory(stream, "gate_stream_mb", output_mode="append")
    batch = QUERIES["quality_logistic_filter"].fn(spark, SF_SMOKE)
    assert _canon(got) == _canon(batch)


def test_kept_only_stream_drops_rejects(spark, docs_dir):
    stream = quality_gated_stream(
        read_documents_stream(spark, docs_dir), keep_only=True
    )
    got = run_to_memory(stream, "gate_stream_kept", output_mode="append")
    rows = got.collect()
    assert rows and all(r.kept for r in rows)
    batch = QUERIES["quality_logistic_filter"].fn(spark, SF_SMOKE)
    assert len(rows) == batch.filter("kept").count()
