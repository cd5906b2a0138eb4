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
from automated_data_pipeline_python_spark.tables import load


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
