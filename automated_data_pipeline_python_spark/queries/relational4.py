"""Relational surface, part 4: statistical aggregates, dup-aware set
ops, cross join, sampling, and the Pandas-UDAF boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.functions.numeric import (
    sql_exact_sum,
    stable_round,
)
from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load


def _corr_sql(table: str) -> str:
    """Bivariate statistics from exact snapped moment sums.

    The builtin corr/covar/regr_* aggregates accumulate doubles in
    partition order — not reproducible across engines at a rounding
    boundary. Computing them from order-independent moment sums
    (Σx, Σy, Σx², Σy², Σxy — each snapped to its decimal grid, summed
    as DECIMAL) makes every downstream double op a deterministic
    function of exact inputs. Identical SQL text runs on both engines,
    so even the operation ORDER matches.
    """
    sx = sql_exact_sum("l_quantity", 2)
    sy = sql_exact_sum("l_extendedprice", 2)
    sd = sql_exact_sum("l_discount", 2)
    sxx = sql_exact_sum("l_quantity * l_quantity", 4)
    syy = sql_exact_sum("l_extendedprice * l_extendedprice", 4)
    sxy = sql_exact_sum("l_quantity * l_extendedprice", 4)
    sxd = sql_exact_sum("l_quantity * l_discount", 4)
    return f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               {sx} AS sx, {sy} AS sy, {sd} AS sd,
               {sxx} AS sxx, {syy} AS syy, {sxy} AS sxy, {sxd} AS sxd
        FROM {table}
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
        floor(((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1e6 + 0.5) / 1e6
            AS qty_price_corr,
        floor(((sxd - sx * sd / n) / (n - 1)) * 1e6 + 0.5) / 1e6
            AS qty_disc_covar,
        floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e4 + 0.5) / 1e4
            AS price_per_qty,
        floor(((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n) * 1e4 + 0.5) / 1e4
            AS price_at_zero,
        floor((((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1e6 + 0.5) / 1e6
            AS r2
    FROM m
    """


@register("agg_corr_regression", oracle=_corr_sql("lineitem"))
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics: corr/covar/linear regression per group.

    Single aggregation pass (all moments partial-aggregate map-side);
    see ``_corr_sql`` for why the moments formulation replaces the
    builtin corr/covar/regr_* accumulators.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_corr")
    return spark.sql(_corr_sql("lineitem_corr"))


@register(
    "setops_all_variants",
    oracle="""
    WITH a AS (SELECT o_custkey % 50 AS k FROM orders WHERE o_orderkey < 2000),
         b AS (SELECT o_custkey % 50 AS k FROM orders WHERE o_orderkey >= 1000
                                                        AND o_orderkey < 3000)
    SELECT k, 'intersect_all' AS op FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT k, 'except_all' AS op FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    """,
)
def setops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL (duplicate-aware semantics)."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter("o_orderkey < 2000").selectExpr("o_custkey % 50 AS k")
    b = orders.filter("o_orderkey >= 1000 AND o_orderkey < 3000").selectExpr(
        "o_custkey % 50 AS k"
    )
    return (
        a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
        .unionByName(a.exceptAll(b).withColumn("op", F.lit("except_all")))
    )


@register(
    "cross_join_regions_segments",
    oracle="""
    SELECT r_name, seg, CAST(coalesce(cnt, 0) AS BIGINT) AS customers
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    LEFT JOIN (
        SELECT r2.r_name AS rn, c_mktsegment AS cs, count(*) AS cnt
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region r2 ON n_regionkey = r2.r_regionkey
        GROUP BY rn, cs
    ) x ON x.rn = r_name AND x.cs = seg
    """,
)
def cross_join_regions_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian scaffold (dimension grid) + left join of facts —
    the dense-grid reporting pattern (zero-filled cells survive)."""
    region = load(spark, sf_dir, "region")
    segs = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg")
    ).distinct()
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region2 = load(spark, sf_dir, "region")
    counts = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region2), nation.n_regionkey == region2.r_regionkey)
        .groupBy(F.col("r_name").alias("rn"), F.col("c_mktsegment").alias("cs"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = region.crossJoin(segs)
    return grid.join(
        counts, (counts.rn == grid.r_name) & (counts.cs == grid.seg), "left"
    ).select(
        "r_name", "seg", F.coalesce("cnt", F.lit(0)).alias("customers")
    )


@register("sample_reproducible", oracle=None)  # engine-specific RNG → rows-only
def sample_reproducible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling (A-series). No oracle: sampling RNGs are
    engine-specific by design; determinism within the engine is what
    matters (same seed → same sample, asserted in tests)."""
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.01, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def grouped_slope_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer price/time slope via grouped ``applyInPandas``.

    The UDAF escape hatch (SURVEY §2.8): used when an aggregate has no
    Catalyst expression. This one intentionally duplicates
    ``regr_slope`` so tests can verify the Pandas path against the JVM
    path — the pattern to copy for genuinely custom aggregates.
    Not in the catalog: the JVM version (agg_corr_regression) is the
    production path; Python-per-group costs ~ms per group.
    """

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = (pdf["o_orderdate"] - pd.Timestamp(0)).dt.total_seconds() / 86_400  # days
        y = pdf["o_totalprice"]
        vx = ((x - x.mean()) ** 2).sum()
        s = float("nan") if vx == 0 else ((x - x.mean()) * (y - y.mean())).sum() / vx
        return pd.DataFrame({"o_custkey": [pdf["o_custkey"].iloc[0]], "slope": [s]})

    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", "o_orderdate", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(slope, schema="o_custkey long, slope double")
    )
