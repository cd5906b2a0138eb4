"""Warehouse-maintenance queries: SCD Type-2 merge as a catalog entry.

The operator lives in ``operators/scd.py`` (pure DataFrame, one
full-outer join per merge); this query drives it end-to-end on the
``customer`` dimension with a deterministic synthetic snapshot so the
whole merge is DuckDB-oracle-checkable: delinquent customers
(``c_acctbal < 0``) move to segment ``DELINQUENT`` — their open
version closes at the batch timestamp and a new version opens — while
everyone else passes through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.operators.scd import scd2_merge
from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load

_T0 = "1992-01-01 00:00:00"
_BATCH = "1998-01-01 00:00:00"

_SCD2_DUCK_SQL = f"""
WITH cur AS (
    SELECT c_custkey AS cust_key, c_mktsegment AS segment, c_acctbal
    FROM customer
)
-- unchanged: still the original open version (NULL valid_to = open)
SELECT cust_key, segment,
       TIMESTAMP '{_T0}'         AS valid_from,
       CAST(NULL AS TIMESTAMP)   AS valid_to,
       true                      AS is_current
FROM cur WHERE c_acctbal >= 0
UNION ALL
-- changed: the original version, closed at the batch timestamp
SELECT cust_key, segment,
       TIMESTAMP '{_T0}', TIMESTAMP '{_BATCH}', false
FROM cur WHERE c_acctbal < 0
UNION ALL
-- changed: the new open version
SELECT cust_key, 'DELINQUENT',
       TIMESTAMP '{_BATCH}', CAST(NULL AS TIMESTAMP), true
FROM cur WHERE c_acctbal < 0
"""


@register("scd2_customer_segments", oracle=_SCD2_DUCK_SQL)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge: delinquent customers change segment, others pass.

    Scale: one full-outer join on the business key; with bucketed
    dimension storage (storage.py) the join is shuffle-free. Lakehouse
    deployments express the same logic as MERGE INTO.
    """
    cust = load(spark, sf_dir, "customer")
    current = cust.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(_T0).cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    snapshot = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"),
        F.when(F.col("c_acctbal") < 0, F.lit("DELINQUENT"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    return scd2_merge(
        current, snapshot, key="cust_key", tracked=["segment"], batch_ts=_BATCH
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff: insert/update/delete between two table versions
# ---------------------------------------------------------------------------
# The change-data-capture primitive under incremental pipelines and
# lakehouse MERGE: given yesterday's and today's snapshot of a table,
# emit each key's operation. Both snapshots are deterministic slices of
# the orders table so the whole diff is oracle-checkable:
#   old = orders except keys ≡ 3 (mod 10)      (those become inserts)
#   new = orders except keys ≡ 7 (mod 10)      (those become deletes)
#   new prices for keys ≡ 0 (mod 7) are uplifted 10%   (updates)
# Price arithmetic stays on the cent grid (floor(x*110+0.5)/100), so
# equality compares are exact on both engines.
#
# Scale: ONE full-outer join on the key — with both snapshots bucketed
# or partitioned by key (how snapshots are laid out in practice) this
# is co-located and shuffle-free; unchanged rows are filtered before
# any downstream work, so output is change-sized, not table-sized.

_CDC_SQL = """
WITH old_snap AS (
    SELECT o_orderkey AS key, o_totalprice AS price, o_orderstatus AS status
    FROM orders WHERE o_orderkey % 10 != 3
),
new_snap AS (
    SELECT o_orderkey AS key,
           CASE WHEN o_orderkey % 7 = 0
                THEN floor(o_totalprice * 110 + 0.5) / 100
                ELSE o_totalprice END AS price,
           o_orderstatus AS status
    FROM orders WHERE o_orderkey % 10 != 7
),
diff AS (
    SELECT
        coalesce(o.key, n.key) AS key,
        CASE WHEN o.key IS NULL THEN 'insert'
             WHEN n.key IS NULL THEN 'delete'
             WHEN o.price != n.price OR o.status != n.status THEN 'update'
             ELSE 'unchanged' END AS op,
        o.price AS old_price,
        n.price AS new_price
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.key = n.key
)
SELECT key, op, old_price, new_price
FROM diff WHERE op != 'unchanged'
"""


@register("cdc_snapshot_diff", oracle=_CDC_SQL)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert/update/delete diff between two deterministic snapshots."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CDC_SQL)
