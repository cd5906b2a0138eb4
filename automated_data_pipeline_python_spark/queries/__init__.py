"""Query catalog: every operator from SURVEY.md §2 as a named query.

Importing this package populates the registry; ``__spark_entry__.py``
re-exports it for the driver's correctness harness.
"""

from automated_data_pipeline_python_spark.queries.catalog import (  # noqa: F401
    QUERIES,
    Query,
    oracle_sql,
    queries,
    register,
)

# Import for registration side effects.
from automated_data_pipeline_python_spark.queries import (  # noqa: F401,E402
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    tpch2,
    modern_sql,
    curation,
    curation2,
    clustering,
    dq,
    sketches,
    windows2,
    text,
    training,
    dedup,
    lm,
    similarity,
    events,
    timeseries,
    graph,
    drift,
    experiments,
    experiments2,
    reco,
    retrieval,
    multimodal,
    warehouse,
    rag,
    mlstats,
    curation3,
)

# ---------------------------------------------------------------------------
# Registry priority order
# ---------------------------------------------------------------------------
# The grading driver records correctness rows for (at most) the first 50
# registered queries. From round 5 onward the window's job is converting
# replay-only evidence into hard driver rows: after the r1-r7 union,
# 272 of 345 queries have a driver row; 73 have only the committed
# full-catalog replays (VERIFY_FULL_r07* — 345/345 green at sf0.01 AND
# sf0.1) plus the pytest oracle-parity sweep. Per VERDICT r7 task 1,
# every round-8 slot goes to the never-driver-rowed set (50 of 73,
# leaving a 23-query tail — the timeseries/warehouse batteries plus
# three stragglers — for round 9 alongside any round-8 additions, which
# stay replay+pytest covered until their r9 rows). Everything rotated
# out stays proven by regenerated round-8 full replays committed at
# round end.
_PRIORITY = [
    # Sketch family (VERDICT r7 task 1, named):
    "sketch_count_min_terms",
    "sketch_bloom_prefilter",
    "sketch_kmv_distinct",
    "sketch_kmv_set_ops",
    "sketch_linear_counting",
    "sketch_histogram_quantiles",
    # Warehouse ops (named):
    "warehouse_compaction_plan",
    "warehouse_zone_map_skipping",
    "warehouse_deletion_vectors",
    "part_skyline_pareto",
    # DQ screens (named; dq_chi2_independence lives in drift):
    "dq_benford_first_digit",
    "dq_k_anonymity",
    "dq_chi2_independence",
    "dq_freshness_sla",
    # Reco (named):
    "reco_item_item_cosine",
    "reco_coverage_diversity",
    # Audio/image offset plans (named):
    "multimodal_audio_segments",
    "multimodal_image_tile_plan",
    # Events robustness/experiment tail (named families):
    "events_ks_two_sample",
    "events_bootstrap_ci_mean",
    "events_ucb_bandit_replay",
    "events_bitmap_retention",
    "events_power_analysis",
    "events_crosscorr_lead_lag",
    # Full-module retirement — drift:
    "corpus_source_kl_divergence",
    "corpus_source_js_matrix",
    "corpus_simpson_diversity",
    "feature_quantile_normalize",
    # Full-module retirement — curation2 (quality/eval battery):
    "sample_importance_dsir",
    "quality_gopher_rules",
    "vocab_coverage_oov_curve",
    "quality_calibration_bins",
    "quality_auc_rank",
    "quality_brier_decomposition",
    # Full-module retirement — dedup:
    "dedup_ngram_containment",
    "dedup_minhash_estimate_accuracy",
    "dedup_cdc_chunks",
    # Full-module retirement — events (engagement battery):
    "events_dau_mau_stickiness",
    "events_trajectory_similarity",
    "events_markov_stationary",
    # Remaining single-query module gaps:
    "graph_brand_kcore",
    "text_token_llr",          # lm module
    "param_marker_priority_stats",  # modern_sql
    "lineitem_ols_two_factor",      # relational4
    "text_inverted_postings",       # retrieval
    "embedding_hard_negatives",     # retrieval
    "ann_dim_truncation_recall",    # similarity
    "embedding_class_separability",  # similarity
    "lang_id_confusion",            # text
    "text_rake_phrases",            # text
    # Everything else (all 272 r1-r7 driver-rowed queries, the 23-query
    # never-rowed tail deferred to round 9, and any round-8 additions)
    # still registers and is replayed by tools/verify_driver.py at
    # sf0.01+sf0.1 per round (VERIFY_FULL_r08*), plus the pytest
    # oracle-parity sweep.
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"priority list names unknown queries: {missing}")
    rest = [n for n in QUERIES if n not in set(_PRIORITY)]
    ordered = {n: QUERIES[n] for n in [*_PRIORITY, *rest]}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
