"""Production drift/quality monitoring: the engine's monitors composed.

The nightly report a 100 TB ingestion pipeline runs before promoting a
new batch, at test scale:

1. VOCAB DRIFT   per-source KL divergence vs the corpus distribution
2. VALUE DRIFT   PSI of the metric distribution, early vs late window
3. SHAPE DRIFT   two-sample KS + Wasserstein-1 magnitude (in dollars)
4. MEAN DRIFT    Page-Hinkley running-mean alarm on daily counts
5. VECTOR DRIFT  per-label embedding centroid cosine between halves
6. OUTLIERS      median/MAD robust z-scores on the daily event series
7. INTEGRITY     Benford first-digit conformance of order amounts
8. DEPENDENCY    categorical mutual-information matrix
9. FILTER HEALTH Gopher-rule pass/fail census on the document corpus

Every section is a catalog operator with a DuckDB oracle; this script
chains them over the same testdata tables and prints a one-line alarm
summary per section plus the rows that trip thresholds.
Run: ``python examples/drift_monitor.py [sf_dir]``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from automated_data_pipeline_python_spark.queries import QUERIES
from automated_data_pipeline_python_spark.session import get_spark

# (section, catalog query, alarm predicate over the result DataFrame)
SECTIONS = [
    ("vocab_drift", "corpus_source_kl_divergence", "kl_nats > 0.05"),
    ("value_drift", "events_psi_value_drift", "psi_term > 0.02"),
    ("shape_drift", "events_ks_two_sample", "p_value < 0.05"),
    ("shape_drift_w1", "events_wasserstein_distance", "w1_distance > 1.0"),
    ("mean_drift", "events_page_hinkley_drift", "alarm = 1"),
    ("vector_drift", "embedding_centroid_drift", "centroid_cosine < 0.9"),
    ("outliers", "events_mad_outliers", "is_outlier = 1"),
    ("changepoint", "events_pettitt_changepoint", "significant_05 = 1"),
    ("error_budget", "events_slo_burn_rate", "page_alert = 1"),
    ("integrity", "dq_benford_first_digit", "abs_dev > 0.05"),
    ("dependency", "dq_mutual_information", "nmi > 0.5"),
    ("filter_health", "quality_gopher_rules", "pass_rate < 0.5"),
]


def run(spark, sf_dir: str) -> dict:
    report: dict[str, dict] = {}
    for section, query, alarm_pred in SECTIONS:
        df = QUERIES[query].fn(spark, sf_dir)
        # Every monitor reduces to a small report relation, so execute
        # ONCE and apply the alarm predicate driver-side — count()/
        # filter().count()/show() would re-trigger the corpus job per
        # call.
        rows = df.collect()
        flagged = [r for r in df.sparkSession.createDataFrame(
            rows, df.schema).filter(alarm_pred).collect()]
        report[section] = {
            "query": query,
            "rows": len(rows),
            "alarms": len(flagged),
        }
        status = "ALARM" if flagged else "ok"
        print(f"[{status:5s}] {section:14s} {query}: "
              f"{len(flagged)} row(s) past threshold")
        for r in flagged[:5]:
            print("        ", r.asDict())
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    session = get_spark(app_name="drift-monitor")
    try:
        out = run(session, sf)
        total = sum(s["alarms"] for s in out.values())
        print(f"sections={len(out)} total_alarms={total}")
    finally:
        session.stop()
