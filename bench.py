"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query executes its full plan via a noop sink (no driver collect
bottleneck, no disk write in the measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from automated_data_pipeline_python_spark.session import get_spark  # noqa: E402

# Headline set: the queries whose execution shape matters at scale
# (fact-table agg, star join, top-k, window, as-of, text explode,
# dedup and similarity once implemented).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_by_revenue",
    "window_top3_parts_per_brand",
    "join_asof_purchase_click",
    "explode_top_words",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_exact_documents",
    "knn_bruteforce_topk",
    "ann_lsh_topk",
    "text_tfidf_top_terms",
    "events_tumbling_10min",
    "events_sessionization",
    "q8_market_share",
    "q21_sole_late_shipper",
    "events_interval_join",
    "gapfill_monthly_orders",
    "ann_ivf_topk",
    "dq_star_schema_report",
    "sketch_user_reach_rollup",
    "corpus_curation_funnel",
    "kmeans_lloyd_refine",
    "dedup_minhash_lsh_uncapped",
    "contamination_ngram_overlap",
    "pack_sequences_chunked",
    "text_repetition_scores",
]
# semdedup_cluster_prune and ann_pq_adc_topk are deliberately NOT in the
# headline set: the total must stay comparable round-over-round (same 28
# queries since round 2). Their plan shapes live in PLANS.md and their
# correctness in the driver gate.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from automated_data_pipeline_python_spark.queries import QUERIES

    # Warm up codegen/shuffle/scan/python-worker paths once so per-query
    # timings measure steady-state execution, not JVM cold start, first
    # parquet footer reads, or Arrow worker spawn (TPC-style warm runs).
    from automated_data_pipeline_python_spark.tables import load

    warm = spark.range(1_000_000).selectExpr("id", "id % 7 AS k")
    warm.groupBy("k").count().write.format("noop").mode("overwrite").save()
    for t in [
        "lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "events", "documents", "embeddings",
    ]:
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Min-of-N per query (default 3, SPARK_GRAFT_BENCH_REPEATS to
    # override): the min filters out one-off JIT/GC/OS noise, so
    # round-over-round numbers track plan changes, not scheduler luck.
    # Raised from 2 to 3 in round 9: the 2-repeat headline manufactured
    # three phantom regressions in round 8 that the same-commit 5-run
    # repeat study refuted (VERDICT r8 task 5).
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = QUERIES.get(name)
        if q is None:
            continue  # not implemented yet
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # Temp views registered by a query keep their plans — and any
        # localCheckpoint blocks inside them — reachable for the rest
        # of the run; heap pressure then inflates LATER queries'
        # numbers (measured: multi-second swings on the dedup family).
        # Drop them between queries (outside the timed region) so each
        # measurement starts from a clean executor heap.
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # Self-describing methodology (VERDICT r9 task 5): each
                # per-query number is the minimum over `repeats` runs,
                # so cross-round comparisons can detect method changes.
                "method": f"min-of-{repeats}",
                "repeats": repeats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
