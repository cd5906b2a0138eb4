"""Registry-order contract: the grading driver only records correctness
rows for the first 50 registered queries, so the window must be spent
where it buys new evidence. Round-8 rotation (VERDICT r7 task 1): the
r1-r7 union driver-rowed 272 of 345 queries; this window spends every
slot on 50 of the 73 never-driver-rowed queries — the sketch family,
warehouse ops, DQ screens, reco, the audio/image offset plans, the
events robustness/experiment tail, and full-module retirement of the
drift/curation2/dedup/events batteries — converting replay-only
evidence into hard rows. The 23-query remainder (the timeseries and
warehouse engagement/finance batteries plus three stragglers) and any
round-8 additions take the round-9 window; everything rotated out stays
proven by the committed full-catalog replays (VERIFY_FULL_r07*/r08*)
and the pytest oracle-parity sweep.
"""

from __future__ import annotations

from automated_data_pipeline_python_spark.queries import QUERIES, _PRIORITY, oracle_sql

# VERDICT r7 task 1 names these families explicitly; their first-ever
# driver rows are the round-8 deliverable.
ROUND8_VERDICT_NAMED = [
    "sketch_count_min_terms",
    "sketch_bloom_prefilter",
    "sketch_kmv_distinct",
    "sketch_kmv_set_ops",
    "sketch_linear_counting",
    "sketch_histogram_quantiles",
    "warehouse_compaction_plan",
    "warehouse_zone_map_skipping",
    "warehouse_deletion_vectors",
    "part_skyline_pareto",
    "dq_benford_first_digit",
    "dq_k_anonymity",
    "dq_chi2_independence",
    "dq_freshness_sla",
    "reco_item_item_cosine",
    "reco_coverage_diversity",
    "multimodal_audio_segments",
    "multimodal_image_tile_plan",
    "events_ks_two_sample",
    "events_bootstrap_ci_mean",
    "events_ucb_bandit_replay",
    "events_bitmap_retention",
]

# The rest of the never-driver-rowed set taken this round (module
# retirement + single-query module gaps).
ROUND8_NEVER_ROWED = [
    "events_power_analysis",
    "events_crosscorr_lead_lag",
    "corpus_source_kl_divergence",
    "corpus_source_js_matrix",
    "corpus_simpson_diversity",
    "feature_quantile_normalize",
    "sample_importance_dsir",
    "quality_gopher_rules",
    "vocab_coverage_oov_curve",
    "quality_calibration_bins",
    "quality_auc_rank",
    "quality_brier_decomposition",
    "dedup_ngram_containment",
    "dedup_minhash_estimate_accuracy",
    "dedup_cdc_chunks",
    "events_dau_mau_stickiness",
    "events_trajectory_similarity",
    "events_markov_stationary",
    "graph_brand_kcore",
    "text_token_llr",
    "param_marker_priority_stats",
    "lineitem_ols_two_factor",
    "text_inverted_postings",
    "embedding_hard_negatives",
    "ann_dim_truncation_recall",
    "embedding_class_separability",
    "lang_id_confusion",
    "text_rake_phrases",
]

# New catalog queries added in round 8: replay+pytest evidence this
# round; they take round-9 window slots (per the VERDICT r7 task-1
# directive that all 50 r8 slots go to the never-rowed backlog).
ROUND8_NEW: list[str] = [
    "events_wasserstein_distance",
    "events_page_hinkley_drift",
    "text_gini_token_concentration",
    "mlstats_eb_beta_shrinkage",
    "rag_mmr_rerank",
    "mixture_unimax_budget",
    "feature_target_encode_oof",
    "events_ipw_ate",
    "events_qini_uplift_curve",
    "events_did_estimator",
    "embedding_centroid_drift",
    "events_markov_entropy_rate",
    "text_burrows_delta",
    "lineitem_newsvendor_stock",
    "text_ql_dirichlet_ranking",
    "lineitem_eoq_reorder_point",
    "text_readability_flesch",
    "lineitem_abc_xyz_matrix",
]


def test_priority_list_is_first_50():
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY


def test_window_covers_touched_and_backfill():
    window = set(_PRIORITY)
    for required in [*ROUND8_VERDICT_NAMED, *ROUND8_NEVER_ROWED]:
        assert required in window, required


def test_round8_additions_registered():
    for name in ROUND8_NEW:
        assert name in QUERIES, name


# Modules with no round-8 window sentinel: batteries whose every member
# already has a hash-green driver row in the r1-r7 union AND stays
# covered by the committed full-catalog replays + the pytest
# oracle-parity sweep. First driver evidence for never-rowed queries
# outranks a redundant sentinel.
REPLAY_COVERED_MODULES = {
    "clustering",
    "curation",
    "curation3",
    "experiments",     # events_power_analysis IS windowed; keep for safety
    "mlstats",
    "rag",
    "relational",
    "relational2",
    "relational3",
    "relational5",
    "tpch2",
    "timeseries",      # events_bitmap_retention IS windowed; 13-query tail -> r9
    "training",        # mixture_temperature_weights -> r9
    "warehouse",       # 4 windowed; 7-query tail -> r9
    "windows2",
}


def test_window_represents_every_module():
    """Sentinel coverage: a regression in any query module must be able
    to surface in the driver window (or the module is in the documented
    replay-covered exemption set)."""
    window_mods = {
        QUERIES[n].fn.__module__.rsplit(".", 1)[1] for n in _PRIORITY
    }
    all_mods = {
        q.fn.__module__.rsplit(".", 1)[1] for q in QUERIES.values()
    }
    assert all_mods - window_mods - REPLAY_COVERED_MODULES == set()


def test_window_is_oracle_dense():
    """Every window slot hash-checks (the by-design rows-only queries
    are out of the window — their rows exist in the r1-r6 union)."""
    oracles = oracle_sql()
    missing = [n for n in _PRIORITY if n not in oracles]
    assert missing == []


def test_deferred_collect_is_isolated_from_later_registrations(spark):
    """Queries register shared temp-view names (documents, mh_sh, ...).
    A driver may build many DataFrames before collecting any; plans must
    bind at build time, so later view re-registration cannot change an
    earlier query's result."""
    from tests.conftest import SF_SMOKE

    names = [
        "dedup_minhash_lsh",        # registers documents + mh_sh
        "text_tfidf_top_terms",     # re-registers documents + tfidf_tok
        "contamination_ngram_overlap",  # re-registers documents + ct_sh
        "semdedup_cluster_prune",   # registers embeddings + sd_asn
        "ann_pq_adc_topk",          # re-registers embeddings + pq_sub
    ]
    built = {n: QUERIES[n].fn(spark, SF_SMOKE) for n in names}  # build all first

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())

    deferred = {n: canon(df) for n, df in built.items()}        # collect after
    fresh = {n: canon(QUERIES[n].fn(spark, SF_SMOKE)) for n in names}
    assert deferred == fresh


def test_query_build_drops_its_temp_views(spark):
    """Catalog queries must not leak their intermediate temp views (a
    leaked view keeps localCheckpoint blocks reachable for the session
    lifetime — measured multi-second heap-pressure inflation across a
    long run). Pre-existing views stay."""
    from tests.conftest import SF_SMOKE

    spark.range(1).createOrReplaceTempView("preexisting_view")
    try:
        before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
        for name in ("dedup_minhash_lsh", "text_tfidf_top_terms",
                     "embedding_power_iteration", "lm_unigram_em_round"):
            QUERIES[name].fn(spark, SF_SMOKE)
        after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
        assert after == before
        assert "preexisting_view" in after
    finally:
        spark.catalog.dropTempView("preexisting_view")
