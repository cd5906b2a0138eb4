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

from automated_data_pipeline_python_spark.functions.numeric import (
    sql_exact_sum,
    sql_stable_round,
)
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


# ---------------------------------------------------------------------------
# Rank-1 ALS: one alternating-least-squares round over the
# customer x brand rating matrix
# ---------------------------------------------------------------------------
# The matrix-factorization training kernel (Koren et al. 2009) at rank
# 1, where each half-step has a closed form and the whole round is
# relational algebra:
#
#   r(u,b) = total quantity customer u bought of brand b (exact BIGINT)
#   init   v0(b) = 1            ->  u1(u) = sum_b r(u,b) / |b(u)|
#   update v1(b) = sum_u r(u,b)*u1(u) / sum_u u1(u)^2   (observed u only)
#
# plus the per-brand RMSE of r ~ u1*v1 — the convergence signal a
# driver-looped higher-rank ALS would test (rank k swaps the scalar
# divisions for k x k normal-equation solves per entity; the join/agg
# plan is unchanged, which is the point of shipping the rank-1 form).
#
# Float discipline: u1 is one snapped division of exact integers; the
# v1 numerator/denominator and the squared-error sums are cross-row
# float sums -> sql_exact_sum (1e-6-snapped terms, DECIMAL
# accumulation), so accumulation order cannot flip a digit.
#
# Scale: ratings are ONE orders JOIN lineitem JOIN part pass, then every
# stage aggregates or joins on (u) or (b) keys — no pairs anywhere;
# brand cardinality is bounded, user cardinality shuffles hash-
# partitioned. The ratings relation feeds three consumers (u-step,
# v-step, error pass) and u1 feeds two; Spark inlines CTEs, so both
# are materialized via localCheckpoint.

_ALS_RATINGS_SQL = """
SELECT o_custkey AS u, p_brand AS b,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
JOIN part ON p_partkey = l_partkey
GROUP BY o_custkey, p_brand
"""

_ALS_UFAC_TPL = """
SELECT u,
       floor((CAST(sum(r) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS uf
FROM {ratings} GROUP BY u
"""


def _als_tail(ratings: str, ufac: str) -> str:
    num = sql_exact_sum("CAST(rt.r AS DOUBLE) * uf.uf", 6)
    den = sql_exact_sum("uf.uf * uf.uf", 6)
    sse = sql_exact_sum(
        "(CAST(rt.r AS DOUBLE) - uf.uf * vs.vf)"
        " * (CAST(rt.r AS DOUBLE) - uf.uf * vs.vf)", 6
    )
    return f"""
vfac AS (
    SELECT rt.b,
           CAST(count(*) AS BIGINT) AS n_users,
           {num} AS num,
           {den} AS den
    FROM {ratings} rt JOIN {ufac} uf ON uf.u = rt.u
    GROUP BY rt.b
),
vs AS (
    SELECT b, n_users,
           {sql_stable_round("num / den", 6)} AS vf
    FROM vfac
),
err AS (
    SELECT rt.b,
           {sse} AS sse,
           CAST(count(*) AS BIGINT) AS n
    FROM {ratings} rt
    JOIN {ufac} uf ON uf.u = rt.u
    JOIN vs ON vs.b = rt.b
    GROUP BY rt.b
)
SELECT vs.b AS brand,
       vs.n_users,
       vs.vf AS item_factor,
       {sql_stable_round("sqrt(err.sse / err.n)", 6)} AS rmse
FROM vs JOIN err ON err.b = vs.b
ORDER BY vs.b
"""


_ALS_DUCK_SQL = (
    "WITH ratings AS (" + _ALS_RATINGS_SQL + "),\n"
    + "ufac AS (" + _ALS_UFAC_TPL.format(ratings="ratings") + "),\n"
    + _als_tail("ratings", "ufac").replace("\nvfac AS", "\n vfac AS", 1)
)


@register("reco_als_rank1_round", oracle=_ALS_DUCK_SQL)
def reco_als_rank1_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One closed-form rank-1 ALS round over customer x brand
    quantities: per-brand item factor after the u-step/v-step pair,
    with per-brand RMSE as the convergence signal.

    Ratings feed three stages and the user factors two; Spark inlines
    CTEs, so both are materialized via localCheckpoint.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    spark.sql(_ALS_RATINGS_SQL).localCheckpoint(
        eager=True
    ).createOrReplaceTempView("als_ratings")
    spark.sql(_ALS_UFAC_TPL.format(ratings="als_ratings")).localCheckpoint(
        eager=True
    ).createOrReplaceTempView("als_ufac")
    return spark.sql("WITH " + _als_tail("als_ratings", "als_ufac").lstrip())


# ---------------------------------------------------------------------------
# Temporal hit-rate evaluation of the co-purchase recommender
# ---------------------------------------------------------------------------
# The offline eval a recommender ships with: train top-3 "customers
# also bought" brand recommendations on the FIRST half of the order
# history, score them against co-purchases that actually happened in
# the SECOND half. Per source brand: how many held-out co-purchase
# partners existed, how many were in the top-3 list (hit), and the
# hit rate. Time-split (not random-split) — the honest protocol for
# transactional data, no leakage of future baskets into training.
#
# All counts are exact integers (co-purchase weights, hits); ranks are
# PARTITIONED row_number with (weight DESC, brand) total order; one
# snapped division per output row.
#
# Scale: both halves reduce to distinct (order, brand) then brand-pair
# aggregates — bounded by the brand vocabulary squared, with the
# corpus-sized work being the two scan+join passes. No global windows.

_RECO_EVAL_SQL = """
WITH mid AS (
    SELECT CAST(min(o_orderdate) AS DATE)
           + CAST(floor({div}) AS INT) AS cut
    FROM orders
),
ob AS (
    SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS brand,
           CASE WHEN CAST(o.o_orderdate AS DATE) < m.cut
                THEN 0 ELSE 1 END AS half
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    CROSS JOIN mid m
),
train_edges AS (
    SELECT a.brand AS src, b.brand AS dst, CAST(count(*) AS BIGINT) AS w
    FROM ob a JOIN ob b ON a.o = b.o AND a.brand <> b.brand
    WHERE a.half = 0 AND b.half = 0
    GROUP BY a.brand, b.brand
),
recs AS (
    SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rk
        FROM train_edges
    ) r WHERE rk <= 3
),
test_pairs AS (
    SELECT DISTINCT a.brand AS src, b.brand AS dst
    FROM ob a JOIN ob b ON a.o = b.o AND a.brand <> b.brand
    WHERE a.half = 1 AND b.half = 1
)
SELECT t.src AS brand,
       CAST(count(*) AS BIGINT) AS n_test_partners,
       CAST(sum(CASE WHEN r.dst IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
       floor((CAST(sum(CASE WHEN r.dst IS NOT NULL THEN 1 ELSE 0 END)
                   AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS hit_rate
FROM test_pairs t
LEFT JOIN recs r ON r.src = t.src AND r.dst = t.dst
GROUP BY t.src
ORDER BY brand
"""

_RECO_EVAL_DIV = (
    "CAST(CAST(max(o_orderdate) AS DATE)"
    " - CAST(min(o_orderdate) AS DATE) AS BIGINT) {op} 2"
)


@register(
    "reco_copurchase_hitrate_eval",
    oracle=_RECO_EVAL_SQL.format(div=_RECO_EVAL_DIV.format(op="//")),
)
def reco_copurchase_hitrate_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-split offline eval of the top-3 co-purchase recommender:
    per-brand held-out partner count, hits, and hit rate (train on the
    first half of the order history, test on the second)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        _RECO_EVAL_SQL.format(div=_RECO_EVAL_DIV.format(op="DIV"))
    )


# ---------------------------------------------------------------------------
# Recommendation-list coverage & diversity metrics
# ---------------------------------------------------------------------------
# The beyond-accuracy eval suite (Castells et al.): the hit-rate eval
# above asks "are the recommendations right"; this asks "are they
# varied" — the metrics that catch a recommender collapsing onto
# popular items. Over the top-3 co-purchase lists:
#   * catalog coverage — share of the brand catalog that appears in
#     ANY list;
#   * intra-list diversity — per list, 1 − (same-family pair share)
#     using the Brand#XY family digit, averaged over lists;
#   * recommendation entropy — Shannon entropy of how often each
#     brand is recommended (max = ln(n_recommended) under perfect
#     balance).
#
# Counts are exact integers; per-list diversity and per-brand entropy
# terms snap (1e-6 / 1e-9) before order-independent exact sums; three
# final snapped divisions.
#
# Scale: one corpus pass builds the brand-pair edge list (basket-
# bounded self-join); recs = partitioned top-3 over it (brand-sized,
# materialized once — three consumers); all metrics run on recs.

_RECO_EDGES_SQL = """
WITH ob AS (
    SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT a.brand AS src, b.brand AS dst, CAST(count(*) AS BIGINT) AS w
FROM ob a JOIN ob b ON a.o = b.o AND a.brand <> b.brand
GROUP BY a.brand, b.brand
"""


def _reco_div_tail(edges: str) -> str:
    ild = sql_exact_sum("ild", 6)
    ent = sql_exact_sum("ent_term", 9)
    return f"""
recs AS (
    SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rk
        FROM {edges}
    ) r WHERE rk <= 3
),
catalog AS (SELECT CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
            FROM part),
cover AS (SELECT CAST(count(DISTINCT dst) AS BIGINT) AS n_recommended
          FROM recs),
pairs AS (
    SELECT a.src,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN substr(a.dst, 7, 1) = substr(b.dst, 7, 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_same
    FROM recs a JOIN recs b ON a.src = b.src AND a.dst < b.dst
    GROUP BY a.src
),
perlist AS (
    SELECT src,
           floor((1e0 - CAST(n_same AS DOUBLE) / n_pairs) * 1e6 + 0.5)
               / 1e6 AS ild
    FROM pairs
),
ildagg AS (
    SELECT floor({ild} / count(*) * 1e6 + 0.5) / 1e6
               AS mean_intralist_diversity
    FROM perlist
),
dstc AS (
    SELECT dst, CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY dst
),
dstt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM dstc),
entterms AS (
    SELECT floor((-1e0 * (CAST(c AS DOUBLE) / t.t)
                  * ln(CAST(c AS DOUBLE) / t.t)) * 1e9 + 0.5) / 1e9
               AS ent_term
    FROM dstc CROSS JOIN dstt t
),
entagg AS (SELECT floor(({ent}) * 1e6 + 0.5) / 1e6 AS rec_entropy
           FROM entterms)
SELECT cat.n_brands, cov.n_recommended,
       floor(CAST(cov.n_recommended AS DOUBLE) / cat.n_brands
             * 1e6 + 0.5) / 1e6 AS catalog_coverage,
       i.mean_intralist_diversity,
       e.rec_entropy
FROM catalog cat CROSS JOIN cover cov
CROSS JOIN ildagg i CROSS JOIN entagg e
"""


@register(
    "reco_coverage_diversity",
    oracle="WITH reco_edges AS (" + _RECO_EDGES_SQL + "),\n"
    + _reco_div_tail("reco_edges").lstrip(),
)
def reco_coverage_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-accuracy metrics of the top-3 co-purchase recommender:
    catalog coverage, mean intra-list (brand-family) diversity, and
    recommendation-frequency entropy."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.sql(_RECO_EDGES_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "reco_edges"
    )
    return spark.sql("WITH " + _reco_div_tail("reco_edges").lstrip())
