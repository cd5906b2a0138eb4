"""Recommendation analytics: item-item collaborative filtering over
the order history.

``reco_item_item_cosine`` is the classic neighborhood-model build
step: binarized user×item interactions → per-user frequency cap →
shared-user pair co-occurrence → cosine similarity → global top-k
pairs. It complements the market-basket family (``basket_brand_lift``
works at brand granularity on association *lift*; this works at part
granularity on *cosine* similarity, the form item-kNN recommenders
consume).

Scale shape: the interaction matrix is built in ONE orders⋈lineitem
pass; the per-user cap (top-20 items by interaction count,
deterministic item-id tiebreak) bounds the shared-user self-join at
users·cap²/2 pairs regardless of basket skew — the standard guard that
keeps item-item CF from going quadratic on power users. Counts are
exact integers; cosine = co/(√n_a·√n_b) is IEEE-identical cross-engine
(sqrt is correctly rounded by IEEE 754, inputs are exact integers),
snapped anyway per house discipline; the top-50 is totally ordered by
(cosine, item_a, item_b) so the LIMIT boundary is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load

_CAPPED_SQL = """
SELECT u, it FROM (
    SELECT ui.u, ui.it,
           row_number() OVER (PARTITION BY ui.u
                              ORDER BY ui.n DESC, ui.it) AS rk
    FROM (
        SELECT o_custkey AS u, l_partkey AS it,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_custkey, l_partkey
    ) ui
) ranked
WHERE rk <= 20
"""


def _cosine_tail(capped: str) -> str:
    return f"""
WITH item_n AS (
    SELECT it, CAST(count(*) AS BIGINT) AS n_u FROM {capped} GROUP BY it
),
pairs AS (
    SELECT a.it AS item_a, b.it AS item_b, CAST(count(*) AS BIGINT) AS co
    FROM {capped} a
    JOIN {capped} b ON a.u = b.u AND a.it < b.it
    GROUP BY a.it, b.it
    HAVING count(*) >= 2
)
SELECT p.item_a, p.item_b, p.co,
       floor((CAST(p.co AS DOUBLE)
              / (sqrt(CAST(na.n_u AS DOUBLE)) * sqrt(CAST(nb.n_u AS DOUBLE))))
             * 1e6 + 0.5) / 1e6 AS cosine_sim
FROM pairs p
JOIN item_n na ON p.item_a = na.it
JOIN item_n nb ON p.item_b = nb.it
ORDER BY cosine_sim DESC, p.item_a, p.item_b
LIMIT 50
"""


_ITEM_ITEM_DUCK = (
    "WITH capped AS (" + _CAPPED_SQL + ")\n"
    + _cosine_tail("capped").replace("WITH item_n", ", item_n", 1)
)


@register("reco_item_item_cosine", oracle=_ITEM_ITEM_DUCK)
def reco_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 item-item cosine-similar part pairs from order history.

    The capped interaction set feeds three pipeline stages (item
    counts, both sides of the pair self-join); Spark inlines CTEs, so
    it is materialized once via localCheckpoint (DuckDB materializes
    shared CTEs itself — single-statement oracle).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(_CAPPED_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "reco_capped"
    )
    return spark.sql(_cosine_tail("reco_capped"))
