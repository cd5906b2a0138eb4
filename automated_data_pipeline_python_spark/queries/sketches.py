"""Mergeable-sketch rollups (Apache DataSketches HLL, built into Spark).

THE summarization pattern for 100 TB: per-partition/per-group sketches
are small, associative, and re-aggregatable — a daily distinct-user
sketch rolls up to weekly/monthly/global WITHOUT rescanning the facts
(union of sketches == sketch of union). Contrast `events_hierarchical_
rollup`, which proves the same compositionality for exact sums/counts;
sketches extend it to count-distinct, where exact partials don't
compose.

Rows-only check: sketch estimates are engine-specific (DuckDB's
approx_count_distinct uses a different sketch), so there is no
cross-engine hash parity by design. tests/test_sketches.py pins the
semantics instead: ≤2% relative error vs exact, and union-of-group-
sketches == direct global sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load, load_scaled


def user_reach_sketches(events: DataFrame) -> DataFrame:
    """Per-event-type HLL sketches of user reach (binary, mergeable)."""
    return events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )


@register("sketch_user_reach_rollup", oracle=None)
def sketch_user_reach_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type + a TOTAL row from sketch union.

    The TOTAL is computed by merging the per-type sketches — the facts
    are scanned ONCE. At scale the sketch table is the stored rollup
    (bytes per group), and any coarser grain (type → all types, day →
    month) is a cheap re-aggregation over sketches.

    Scale: one shuffle of (type, sketch) rows — a sketch is ~KBs
    regardless of cardinality; the union step moves 5 rows.
    """
    sketches = user_reach_sketches(load(spark, sf_dir, "events"))
    per_type = sketches.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("distinct_users"),
    )
    total = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users")
    ).select(F.lit("TOTAL").alias("event_type"), "distinct_users")
    return per_type.unionByName(total).orderBy("event_type")


_HEAVY_HITTER_ORACLE = """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
counted AS (
    SELECT term, count(*) AS cnt FROM toks WHERE length(term) > 0 GROUP BY term
),
ranked AS (
    SELECT term, cnt,
           row_number() OVER (ORDER BY cnt DESC, term) AS rnk
    FROM counted
)
SELECT CAST(rnk AS INT) AS rnk, term, cnt FROM ranked WHERE rnk <= 10
"""


@register("sketch_heavy_hitter_terms", oracle=_HEAVY_HITTER_ORACLE)
def sketch_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-sketch heavy hitters: top-10 corpus terms via approx_top_k.

    The streaming/mergeable counterpart of `text_tfidf_top_terms`'s
    exact counting: approx_top_k keeps a bounded sketch per partition
    and merges — memory is O(maxItemsTracked), not O(vocabulary). The
    sketch is exact whenever distinct items per partition stay within
    maxItemsTracked — passed explicitly as 100000 (~20× this corpus'
    vocabulary; the default 10000 would make a regenerated richer
    corpus go red for a non-bug reason), which is what lets the DuckDB
    exact-count oracle hash-match. We over-fetch k=25 from the sketch
    and re-rank with a (cnt DESC, term) tiebreak so ties at the top-10
    boundary resolve identically in both engines (approx_top_k's own
    tie order is unspecified). Bound documented in
    tests/test_sketches.py: the full count-tie cluster at the rank-10
    boundary must also fit inside the over-fetched 25.

    Scale: the token explode never shuffles raw tokens — each partition
    reduces to one bounded sketch; the merge moves KBs. The re-rank
    window sees ≤25 rows.
    """
    from pyspark.sql.window import Window

    docs = load_scaled(spark, sf_dir, "documents")
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.length("term") > 0)
        .agg(F.expr("approx_top_k(term, 25, 100000)").alias("tk"))
        .select(F.explode("tk").alias("entry"))
        .select(
            F.col("entry.item").alias("term"),
            F.col("entry.count").cast("long").alias("cnt"),
        )
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select("rnk", "term", "cnt")
    )
