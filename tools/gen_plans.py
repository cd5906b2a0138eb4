"""Generate PLANS.md: executed-plan facts for the headline queries.

Run: ``python tools/gen_plans.py`` (rewrites PLANS.md). This is the
"explain and iterate" artifact — reviewers see the physical shape each
query actually executes with, and tests/test_plans.py pins the
load-bearing properties so they can't regress silently.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from automated_data_pipeline_python_spark.plans import plan_report  # noqa: E402
from automated_data_pipeline_python_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

QUERY_SET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_nation_trade_by_year",
    "q19_disjunctive_predicates",
    "top_customers_by_revenue",
    "window_top3_parts_per_brand",
    "join_asof_purchase_click",
    "join_range_acctbal",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "knn_bruteforce_topk",
    "ann_lsh_topk",
    "text_tfidf_top_terms",
    "events_sessionization",
    "multimodal_media_metadata",
    "multimodal_frame_sample_plan",
    "multimodal_audio_segments",
    "multimodal_image_tile_plan",
    "dq_k_anonymity",
    "events_latency_decade_histogram",
    "lineitem_ols_two_factor",
    "warehouse_compaction_plan",
    "warehouse_zorder_clustering",
    "warehouse_zone_map_skipping",
    "text_rake_phrases",
    "graph_link_prediction",
    "dedup_prefix_filter_join",
    "sketch_histogram_quantiles",
    "part_skyline_pareto",
    "quality_calibration_bins",
    "sketch_linear_counting",
    "warehouse_deletion_vectors",
    "quality_auc_rank",
    "events_cem_matching",
    "feature_quantile_normalize",
    "bpe_train_merge_rounds",
    "graph_weighted_sssp",
    "events_cep_absence_pattern",
    "lm_heldout_perplexity",
    "sketch_kmv_distinct",
    "sketch_kmv_set_ops",
    "dq_freshness_sla",
    "orders_association_rules",
    "events_power_analysis",
    "events_hysteresis_alerts",
    "orders_ship_latency_percentiles",
    "events_new_vs_returning_dau",
    "events_trajectory_similarity",
    "events_three_way_interval_join",
    "lineitem_price_index_laspeyres",
    "rag_reciprocal_rank_fusion",
    "ann_lsh_multiprobe_topk",
    "ann_multiprobe_recall_eval",
    "mixture_temperature_weights",
    "bpe_compression_curve",
    "q8_market_share",
    "q21_sole_late_shipper",
    "events_interval_join",
    "gapfill_monthly_orders",
    "ann_ivf_topk",
    "dq_star_schema_report",
    "corpus_curation_funnel",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh_capped",
    "contamination_ngram_overlap",
    "text_repetition_scores",
    "sample_stratified_deterministic",
    "pack_sequences_chunked",
    "mixture_domain_weights",
    "ann_recall_at_k",
    "join_asof_arrow_cogroup",
    "chunk_documents_overlap",
    "chunk_dedup_rate",
    "doc_length_histogram",
    "embedding_quantize_int8",
    "scd2_customer_segments",
    "semdedup_cluster_prune",
    "ann_pq_adc_topk",
    "ann_pq_tuning_sweep",
    "ann_ivf_cell_assignment",
    "quality_logistic_filter",
    "doc_unigram_surprisal",
    "corpus_shuffle_shards",
    "sample_token_budget",
    "cdc_snapshot_diff",
    "profile_orders_columns",
    "events_zscore_bands",
    "dedup_incremental_minhash",
    "dedup_substring_windows",
    "lm_bigram_entropy",
    "bpe_pair_merge_counts",
    "text_zipf_slope",
    "pipe_syntax_nation_value",
    "events_path_patterns",
    "events_ohlc_hourly",
    "text_token_pmi",
    "ann_ndcg_eval",
    "events_retention_cohorts",
    "events_twap_hourly",
    "sample_weighted_reservoir",
    "events_rolling_wau",
    "embedding_power_iteration",
    "events_markov_transitions",
    "rfm_customer_segments",
    "sample_train_val_test",
    "contamination_semantic",
    "basket_brand_lift",
    "events_funnel_timing",
    "events_ewma_daily",
    "events_activity_streaks",
    "events_interarrival_stats",
    "events_daily_acf",
    "events_last_touch_attribution",
    "graph_brand_pagerank",
    "graph_brand_triangles",
    "dq_key_skew_report",
    "events_cusum_changepoints",
    "events_ab_test_lift",
    "orders_cohort_ltv",
    "warehouse_incremental_agg",
    "text_bm25_ranking",
    "text_inverted_postings",
    "embedding_hard_negatives",
    "dq_benford_first_digit",
    "events_mad_outliers",
    "corpus_source_kl_divergence",
    "dq_mutual_information",
    "events_psi_value_drift",
    "lang_id_confusion",
    "sample_importance_dsir",
    "quality_gopher_rules",
    "ann_dim_truncation_recall",
    "events_bitmap_retention",
    "events_seasonality_profile",
    "orders_pareto_concentration",
    "sketch_count_min_terms",
    "sketch_bloom_prefilter",
    "events_holt_forecast",
    "events_forecast_backtest",
    "events_multi_touch_attribution",
    "param_marker_priority_stats",
    "events_theil_sen_trend",
    "orders_interpurchase_survival",
    "dedup_ngram_containment",
    "text_term_burstiness",
    "events_cuped_adjustment",
    "events_winsorized_stats",
    "scd2_as_of_snapshot",
    "events_session_bounce_rate",
    "text_heaps_vocab_growth",
    "embedding_class_separability",
    "events_dau_mau_stickiness",
    "graph_brand_reachability",
    "corpus_source_js_matrix",
    "events_peak_concurrency",
    "events_lag_feature_matrix",
    "orders_hhi_concentration",
    "dedup_minhash_estimate_accuracy",
    "lineitem_abc_classification",
    "events_seasonal_anomalies",
    "corpus_simpson_diversity",
    "vocab_coverage_oov_curve",
    "dq_chi2_independence",
    "events_ucb_bandit_replay",
    "events_sprt_ab_trajectory",
    "events_crosscorr_lead_lag",
    "reco_item_item_cosine",
    "events_holt_winters_weekly",
    "warehouse_merge_upsert",
    "quality_brier_decomposition",
    "text_textrank_keywords",
    "dedup_cdc_chunks",
    "events_bootstrap_ci_mean",
    "events_ks_two_sample",
    "events_kleinberg_bursts",
    "join_asof_nearest",
    "graph_brand_kcore",
    "text_token_llr",
    "retrieval_maxsim_colbert",
    "lm_unigram_em_round",
    "lm_kneser_ney_bigram",
    "selection_kcenter_greedy",
    "reco_als_rank1_round",
]


def main() -> None:
    spark = get_spark(app_name="gen-plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    from automated_data_pipeline_python_spark.queries import QUERIES

    lines = [
        "# PLANS — executed physical-plan facts (generated)",
        "",
        f"Generated by `tools/gen_plans.py` at sf0.01 on local[4]; the",
        "load-bearing properties are pinned by `tests/test_plans.py`.",
        "",
        "| query | scans | pushed-filter scans | exchanges | broadcast joins | sort-merge joins | python stages | codegen spans |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in QUERY_SET:
        df = QUERIES[name].fn(spark, SF)
        df.collect()  # materialize the final AQE plan (incl. codegen markers)
        r = plan_report(df)
        lines.append(
            f"| {name} | {r.scans} | {r.scans_with_pushed_filters} | "
            f"{r.exchanges} | {r.broadcast_joins} | {r.sort_merge_joins} | "
            f"{r.python_evals} | {r.codegen_spans} |"
        )
    lines += [
        "",
        "Reading guide:",
        "- *pushed-filter scans*: predicates reached the parquet reader",
        "  (`PushedFilters`) — no full-scan-then-filter.",
        "- *exchanges*: shuffles in the executed plan (post-AQE; reused",
        "  exchanges excluded). Star joins show low counts because every",
        "  dimension broadcasts. For queries that localCheckpoint a",
        "  shared subtree (the ANN eval family), exchange/codegen counts",
        "  can shift a few units between generation sessions as exchange",
        "  reuse kicks in or not — the load-bearing columns (scans,",
        "  pushed filters, joins, python stages) are session-stable and",
        "  are what tests/test_plans.py pins.",
        "- *python stages*: Arrow-batched Python boundaries. Only the",
        "  as-of join carries one — everything else is JVM/codegen.",
        "",
    ]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
