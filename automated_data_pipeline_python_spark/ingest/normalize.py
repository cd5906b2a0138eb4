"""Normalization: raw NFT records → typed ``nfts`` + exploded ``traits``.

Re-expresses reference ``pipeline/transform/normalize.py:6-33`` on
DataFrames. Documented divergences from the reference (kept
deliberately — see SURVEY.md §5.4):

1. The reference's ``.flatten()`` on ``traits`` (normalize.py:26-29) is
   a no-op on a list<struct> column in PyArrow; the README (:110)
   promises "flattened trait data". We implement the *intent*: one row
   per trait via ``explode``.
2. The reference casts identifier string→int32 with PyArrow's default
   error behavior (normalize.py:11-16); we use ANSI-off cast semantics
   (non-numeric → null) and keep a dead-letter flag column available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.schemas import NFT_RAW_SCHEMA

NFT_COLUMNS = [
    "identifier",
    "collection",
    "contract",
    "token_standard",
    "name",
    "metadata_url",
]


def from_records(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Apply the explicit schema to raw collector dicts.

    Mirrors ``Table.from_pylist(..., schema=)`` (reference
    normalize.py:8): extra keys dropped, missing keys null — Spark's
    ``createDataFrame`` with an explicit schema has the same contract
    for dict rows.
    """
    return spark.createDataFrame(records, schema=NFT_RAW_SCHEMA)


def normalize_nfts(raw: DataFrame) -> dict[str, DataFrame]:
    """Split raw records into the ``nfts`` and ``traits`` tables.

    Reference parity: identifier cast (normalize.py:11-16), nfts
    projection (:18-25), traits projection + *intended* flatten
    (:26-29) implemented as a real explode.
    """
    typed = raw.withColumn("identifier", F.col("identifier").try_cast("int"))
    nfts = typed.select(*NFT_COLUMNS)
    traits = (
        typed.select("identifier", F.explode("traits").alias("t"))
        .select(
            "identifier",
            F.col("t.trait_type").alias("trait_type"),
            F.col("t.value").alias("value"),
        )
    )
    return {"nfts": nfts, "traits": traits}
