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


# ---------------------------------------------------------------------------
# Count-Min sketch in pure SQL (deterministic, hence oracle-checkable)
# ---------------------------------------------------------------------------
# The frequency companion to HLL: a d×w counter grid where each term
# increments one bucket per hash row and its estimate is the MIN over
# rows — memory is d·w counters per partition regardless of vocabulary,
# grids merge by cell-wise addition (union == sum), and estimates only
# ever OVER-count (collision bias), never under. Because the bucket
# hashes derive from the portable sha-based hash, the whole pipeline is
# deterministic and the DuckDB oracle checks it end-to-end — unlike the
# engine-internal HLL registers above. The report: exact count vs CM
# estimate for the exact top-10 terms, with the collision overestimate
# shown honestly (the d/w tuning signal).

from automated_data_pipeline_python_spark.functions.text import (  # noqa: E402
    DUCK_TOKENS,
    SPARK_TOKENS,
    duck_hash60,
    spark_hash60,
)

_CM_D = 4     # hash rows
_CM_W = 256   # buckets per row

_S_TOKENS = SPARK_TOKENS.format(col="text")
_D_TOKENS = DUCK_TOKENS.format(col="text")


def _cm_tail(hash60, concat_key: str) -> str:
    # bucket(r, term): portable hash of ('cm', r, term) mod w.
    bucket = f"{hash60(concat_key)} % {_CM_W}"
    return f"""
rows_ AS ({{series}}),
cells AS (
    SELECT t.r, {bucket} AS bucket, count(*) AS c
    FROM tok
    CROSS JOIN rows_ t
    GROUP BY 1, 2
),
exact AS (
    SELECT term, count(*) AS n FROM tok GROUP BY term
),
top AS (
    SELECT term, n FROM exact ORDER BY n DESC, term LIMIT 10
),
est AS (
    SELECT top.term, top.n,
           min(cells.c) AS cm_estimate
    FROM top
    CROSS JOIN rows_ t
    JOIN cells ON cells.r = t.r
              AND cells.bucket = ({{bucket_top}})
    GROUP BY top.term, top.n
)
SELECT term,
       CAST(n AS BIGINT) AS exact_count,
       CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(cm_estimate - n AS BIGINT) AS overestimate
FROM est
ORDER BY exact_count DESC, term
"""


def _cm_sql(spark_side: bool) -> str:
    if spark_side:
        tok = f"SELECT tok AS term FROM (SELECT explode({_S_TOKENS}) AS tok FROM documents)"
        series = "SELECT explode(sequence(0, {d})) AS r".format(d=_CM_D - 1)
        h = spark_hash60
        key = "concat('cm', CAST(t.r AS STRING), ':', term)"
        key_top = "concat('cm', CAST(t.r AS STRING), ':', top.term)"
    else:
        tok = f"SELECT tok AS term FROM (SELECT unnest({_D_TOKENS}) AS tok FROM documents)"
        series = (
            "SELECT CAST(unnest(generate_series(0, {d})) AS BIGINT) AS r"
        ).format(d=_CM_D - 1)
        h = duck_hash60
        key = "concat('cm', CAST(t.r AS VARCHAR), ':', term)"
        key_top = "concat('cm', CAST(t.r AS VARCHAR), ':', top.term)"
    tail = _cm_tail(h, key).replace(
        "{bucket_top}", f"{h(key_top)} % {_CM_W}"
    ).replace("{series}", series)
    return f"WITH tok AS ({tok}),\n{tail}"


@register("sketch_count_min_terms", oracle=_cm_sql(False))
def sketch_count_min_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates vs exact counts for the top-10 terms.

    Scale: the grid build is one hash-agg over (r, bucket) — d·w cells
    per partition, merged additively by the shuffle (map-side combine
    IS the sketch merge). The token stream is scanned once for the
    grid and once for the exact truth this eval needs; a production
    run keeps only the first pass.
    """
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_cm_sql(True))
