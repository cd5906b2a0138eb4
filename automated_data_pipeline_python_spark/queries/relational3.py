"""Relational surface, part 3: TPC-H-shaped composite queries.

Adaptations of classic TPC-H shapes (Q2/Q7/Q12/Q14/Q18/Q19) to the
driver's star schema — each exercises a distinct plan pattern: min-per-
group join-back, year-bucketed multi-joins, conditional aggregation,
ratio-of-filtered-sums, HAVING-gated semi joins, OR-of-ANDs predicate
pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.functions.numeric import (
    exact_sum,
    sql_exact_sum,
    stable_round,
)
from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load

# price*(1-discount) is exact on a 1e-4 grid (2dp price × 2dp discount);
# summing it snapped to that grid is order-independent — see
# functions/numeric.py. REV is the shared SQL fragment for oracles.
_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q2_cheapest_supplier_per_part",
    oracle="""
    WITH ranked AS (
        SELECT
            l_partkey,
            l_suppkey,
            l_extendedprice / l_quantity AS unit_price,
            row_number() OVER (PARTITION BY l_partkey
                               ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rn
        FROM lineitem
    )
    SELECT
        p_partkey,
        p_name,
        s_name,
        floor((unit_price) * 1e4 + 0.5) / 1e4 AS best_unit_price
    FROM ranked
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 AND p_partkey < 200
    """,
)
def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group then join back the argmin row.

    Window row_number over (part) replaces the correlated MIN subquery —
    one shuffle instead of an extra join against an aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    supp = load(spark, sf_dir, "supplier")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = (
        li.select("l_partkey", "l_suppkey", unit)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            stable_round(F.col("unit_price"), 4).alias("best_unit_price"),
        )
    )


@register(
    "q7_nation_trade_by_year",
    oracle=f"""
    SELECT
        n1.n_name AS cust_nation,
        n2.n_name AS supp_nation,
        CAST(year(o_orderdate) AS INT) AS order_year,
        floor(({sql_exact_sum(_REV, 4)}) * 1e2 + 0.5) / 1e2 AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
      AND year(o_orderdate) BETWEEN 1996 AND 1998
    GROUP BY cust_nation, supp_nation, order_year
    """,
)
def q7_nation_trade_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of one dimension (nation twice) +
    year bucketing. The nation table broadcasts twice under different
    aliases — no self-join ambiguity because each gets its own read.

    The revenue sum is snapped per-row to the 1e-4 grid before summing
    (order-independent; round-1 failed here when Spark's and DuckDB's
    accumulation orders rounded a borderline total in opposite ways)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    year = F.year("o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .filter((F.col("cust_nation") < F.col("supp_nation")) & year.between(1996, 1998))
        .groupBy("cust_nation", "supp_nation", year.alias("order_year"))
        .agg(
            stable_round(
                exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("volume")
        )
    )


@register(
    "q12_priority_by_status",
    oracle="""
    SELECT
        o_orderstatus,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY o_orderstatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-sum aggregation over a join with a
    cross-table predicate (shipdate vs orderdate)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT
        floor((100.0 * ({sql_exact_sum(
            f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0.0 END", 4)})
               / ({sql_exact_sum(_REV, 4)})) * 1e4 + 0.5) / 1e4
            AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of filtered sums in one aggregation pass."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            stable_round(
                100.0
                * exact_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0), 4)
                / exact_sum(rev, 4),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT
        c_custkey,
        c_name,
        o_orderkey,
        floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS o_totalprice
    FROM orders
    JOIN big      ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate driving a semi-style join.

    The big-orders aggregate is ~20% of all orders on this corpus — it
    GROWS with scale factor, so no forced broadcast (a hinted broadcast
    of it is the same 100 TB OOM pattern as hinting customer/supplier).
    AQE broadcasts it while it fits; at scale both sides already hash
    by orderkey, so the fallback is a co-partitioned shuffle join.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            stable_round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT
        floor(({sql_exact_sum(_REV, 4)}) * 1e2 + 0.5) / 1e2 AS revenue,
        CAST(count(*) AS BIGINT) AS matched_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
       OR (p_type = 'PROMO' AND l_quantity < 5)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.

    Catalyst extracts the common join key and pushes per-side conjuncts
    below the join where possible — the pattern that defeats naive
    pushdown in many engines.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(part, part.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 20)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") < 5))
    )
    return joined.filter(cond).agg(
        stable_round(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("matched_lines"),
    )
