"""Streaming curation: gate documents on ingest, before bronze.

The quality gate (queries/curation2.py) is map-only — no aggregation,
no state, no watermark — so the exact transformation that curates the
batch corpus also runs in a Structured Streaming append pipeline:
documents stream in from files (or Kafka via
``streaming/events.parse_kafka_events``-style decoding), the gate
scores each micro-batch, and only kept rows continue to the sink. At
100 TB-scale ingest this is the cheapest placement for the filter:
upstream of every shuffle, dedup pass, and write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_documents_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of documents parquet files.

    Schema comes from a batch footer read of the same directory (no
    data scan), following whatever the corpus ships.
    """
    stored_schema = spark.read.parquet(directory).schema
    reader = spark.readStream.schema(stored_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)


def quality_gated_stream(docs_stream: DataFrame, keep_only: bool = False) -> DataFrame:
    """Apply the logistic quality gate to a document stream.

    Returns the scored stream (append-mode legal: map-only). With
    ``keep_only`` the dropped rows are filtered out — the
    curation-on-ingest shape where rejected documents never reach the
    bronze layer.
    """
    from automated_data_pipeline_python_spark.queries.curation2 import quality_gate

    gated = quality_gate(docs_stream)
    return gated.filter("kept") if keep_only else gated
