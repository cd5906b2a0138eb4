"""Relational surface, part 5: edit-distance fuzzy matching, trig/bit
batteries, discrete percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.functions.numeric import stable_round
from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load


@register(
    "fuzzy_levenshtein_pairs",
    oracle="""
    SELECT
        a.p_partkey AS part_a,
        b.p_partkey AS part_b,
        a.p_name    AS name_a,
        b.p_name    AS name_b,
        CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 300 AND b.p_partkey < 300
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching, brand-blocked.

    The entity-resolution primitive: blocking key (brand) drives the
    join; O(len²) edit distance evaluates only inside blocks — never a
    global cartesian.
    """
    a = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    b = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_distance"),
        )
    )


@register(
    "scalar_trig_funcs",
    oracle="""
    SELECT
        vec_id,
        floor((sin(CAST(vec_id AS DOUBLE) / 100)) * 1e6 + 0.5) / 1e6  AS s,
        floor((cos(CAST(vec_id AS DOUBLE) / 100)) * 1e6 + 0.5) / 1e6  AS c,
        floor((atan2(CAST(vec_id AS DOUBLE), 100.0)) * 1e6 + 0.5) / 1e6 AS at2,
        floor((degrees(atan2(CAST(vec_id AS DOUBLE), 100.0))) * 1e4 + 0.5) / 1e4 AS deg,
        floor((exp(CAST(vec_id AS DOUBLE) / 500)) * 1e6 + 0.5) / 1e6  AS e,
        CAST(sign(CAST(vec_id AS DOUBLE) - 250) AS INT)               AS sgn
    FROM embeddings
    """,
)
def scalar_trig_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/exponential battery (F10 math completion).

    libm implementations agree to well under the rounding precision for
    these argument ranges; stable-rounded for safety.
    """
    emb = load(spark, sf_dir, "embeddings")
    x = F.col("vec_id").cast("double")
    return emb.select(
        "vec_id",
        stable_round(F.sin(x / 100), 6).alias("s"),
        stable_round(F.cos(x / 100), 6).alias("c"),
        stable_round(F.atan2(x, F.lit(100.0)), 6).alias("at2"),
        stable_round(F.degrees(F.atan2(x, F.lit(100.0))), 4).alias("deg"),
        stable_round(F.exp(x / 500), 6).alias("e"),
        F.signum(x - 250).cast("int").alias("sgn"),
    )


@register(
    "scalar_bit_funcs",
    oracle="""
    SELECT
        o_orderkey,
        o_orderkey & 255                         AS low_byte,
        o_orderkey | 4096                        AS with_flag,
        xor(o_orderkey, o_custkey)               AS key_xor,
        CAST(o_orderkey << 2 AS BIGINT)          AS shifted_l,
        CAST(o_orderkey >> 3 AS BIGINT)          AS shifted_r,
        CAST(bit_count(o_orderkey) AS INT)       AS pop_count
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def scalar_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery: and/or/xor/shifts/popcount (F10)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("pop_count"),
    )


@register(
    "percentiles_discrete",
    oracle="""
    SELECT
        c_mktsegment,
        quantile_disc(c_acctbal, 0.5)  AS median_disc,
        quantile_disc(c_acctbal, 0.9)  AS p90_disc,
        min(c_acctbal)                 AS lo,
        max(c_acctbal)                 AS hi
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def percentiles_discrete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (non-interpolating) percentiles: an actual data value.

    Spark's ``percentile_disc`` === DuckDB's ``quantile_disc`` (lower
    value at the boundary) — exact equality, no rounding needed.
    """
    cust = load(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias("median_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)").alias("p90_disc"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )
