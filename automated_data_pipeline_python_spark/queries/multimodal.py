"""Multimodal metadata query for the driver catalog.

The corpus has no binary table, so media blobs are derived from document
text bytes (payload-agnostic plumbing — see multimodal/binary_ops.py for
the mapInPandas decode/feature/frame passes, which have no SQL oracle and
are covered by tests/test_multimodal.py). The metadata pass itself is
JVM-side and oracle-checkable: byte length + content hash per blob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load, load_scaled


@register(
    "multimodal_media_metadata",
    oracle="""
    SELECT
        doc_id                              AS media_id,
        CAST(strlen(text) AS INT)           AS n_bytes,
        sha256(text)                        AS content_sha,
        CAST(length(text) AS INT)           AS n_chars
    FROM documents
    """,
)
def multimodal_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob metadata: UTF-8 byte size + SHA-256 content hash.

    Scale: pure projection (no shuffle); the hash doubles as the
    content-address for exact media dedup.
    """
    docs = load_scaled(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length("text").alias("n_bytes"),
        F.sha2("text", 256).alias("content_sha"),
        F.length("text").alias("n_chars"),
    )
