"""Readers for the driver's testdata star schema.

``spark.read.parquet`` gives Catalyst full pushdown (column pruning +
predicate pushdown reach the parquet scan). At 100 TB these would be
partitioned/bucketed tables behind a catalog; the API shape is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixed-size dimension tables (5 / 25 rows at ANY scale factor): the
# only tables safe to hint-broadcast unconditionally. customer/supplier/
# part grow with scale factor — joins against them stay unhinted so AQE
# broadcasts them while small and shuffle-joins at scale
# (tests/test_no_scaling_broadcast_hints.py pins this).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.parquet`` has shipped with two physical types for ``ts``
    across corpus generations: TIMESTAMP(NANOS) (which Spark's parquet
    reader surfaces as LONG under the ``nanosAsLong`` legacy conf) and
    plain ``timestamp[us]`` (read as a timestamp type directly). Branch
    on the dtype Spark actually reads so any corpus works: LONG →
    rebuild TimestampNTZ via NTZ-base timestampadd (timezone-free;
    sub-microsecond parts are zero in the nanos corpus, so the micros
    truncation is lossless); TIMESTAMP (LTZ — a future corpus shipping
    isAdjustedToUTC=true parquet) → rebuild from unix_micros, which is
    epoch-based and hence session-timezone-independent, yielding the
    UTC wall clock as NTZ (a plain CAST to TIMESTAMP_NTZ would render
    in the session timezone and shift per machine under the driver's
    vanilla session); TIMESTAMP_NTZ (naive parquet timestamps under
    Spark's default inferTimestampNTZ) → pass through.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        if isinstance(ts_type, TimestampType):
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts),"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(path)


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark size conf ("128m", "4194304b", plain digits) to bytes."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def _estimated_scan_partitions(spark: SparkSession, path: str) -> int | None:
    """Estimate the parquet scan's partition count from file sizes.

    Mirrors Spark's split sizing (FilePartition.maxSplitBytes):
    ``min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))``
    with each file charged ``openCostInBytes`` — close enough to decide
    "fewer splits than cores?" without the RDD-conversion round trip
    ``df.rdd.getNumPartitions()`` costs (a full plan-to-RDD translation
    per call — measured ~0.1-0.2 s on the driver, in the timed region
    of every load_scaled query; guide §1.2 "per-task work" applies to
    the driver too). Returns None when the path is not a local
    file/directory (object stores etc.) — callers then fall back to the
    exact RDD probe.
    """
    sizes: list[int] = []
    if os.path.isfile(path):
        sizes = [os.path.getsize(path)]
    elif os.path.isdir(path):
        for root, _dirs, fnames in os.walk(path):
            sizes.extend(
                os.path.getsize(os.path.join(root, fn))
                for fn in fnames
                if fn.endswith(".parquet")
            )
    if not sizes:
        return None
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    max_part = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    total = sum(sizes) + open_cost * len(sizes)
    parallelism = max(1, spark.sparkContext.defaultParallelism)
    max_split = min(max_part, max(open_cost, total // parallelism))
    return max(1, -(-total // max_split))  # ceil division


def load_scaled(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table for compute-heavy per-row pipelines (tokenize, hash,
    shingle, vector math).

    A small corpus arrives as ONE input split (file size below
    ``spark.sql.files.maxPartitionBytes``), which serializes every
    downstream map stage onto a single core until the first exchange —
    the dominant cost for SHA/tokenizer/fold-heavy operators. When (and
    only when) the scan yields fewer partitions than the session's
    parallelism, round-robin repartition: locally that turns a
    single-core pipeline into a full-width one for a few-MB shuffle; on
    a real multi-file 100 TB corpus the scan already has more splits
    than cores and this is a no-op — no shuffle is ever added at scale.

    The split count comes from file sizes (Spark's own split formula)
    when the corpus is a local path; only non-local paths pay the exact
    ``df.rdd.getNumPartitions()`` plan-to-RDD probe.
    """
    df = load(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    n = _estimated_scan_partitions(spark, path)
    if n is None:
        n = df.rdd.getNumPartitions()
    if n < target:
        df = df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql(...) queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
