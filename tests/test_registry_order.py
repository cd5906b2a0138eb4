"""Registry-order contract: the grading driver only records correctness
rows for the first 50 registered queries, so the window must be spent
where it buys new evidence. Round-9 rotation (VERDICT r8 task 1): the
r1-r8 union driver-rowed 322 of 363 queries; this window spends 41
slots on EVERY remaining never-driver-rowed query — the 23 r7-backlog
leftovers (events robustness/engagement, orders/lineitem finance, text
scaling-law tails) plus all 18 ROUND8_NEW operators — making the
catalog 363/363 ever-rowed. The 9 spare slots re-validate
dedup_minhash_lsh under its round-9 capped-default semantics (task 2:
the oracle changed with the plan, so a fresh hash row is load-bearing),
first-ever-row its renamed uncapped diagnostic twin, and re-confirm the
heaviest oracled plans. Everything rotated out stays proven by the
committed full-catalog replays (VERIFY_FULL_r08*/r09*) and the pytest
oracle-parity sweep.
"""

from __future__ import annotations

from automated_data_pipeline_python_spark.queries import QUERIES, _PRIORITY, oracle_sql

# The 23 never-rowed backlog queries VERDICT r8 task 1 names explicitly.
ROUND9_BACKLOG = [
    "events_mad_outliers",
    "events_seasonality_profile",
    "events_forecast_backtest",
    "events_multi_touch_attribution",
    "events_theil_sen_trend",
    "events_winsorized_stats",
    "events_session_bounce_rate",
    "events_peak_concurrency",
    "events_lag_feature_matrix",
    "events_seasonal_anomalies",
    "events_latency_decade_histogram",
    "events_hysteresis_alerts",
    "events_new_vs_returning_dau",
    "text_term_burstiness",
    "text_heaps_vocab_growth",
    "mixture_temperature_weights",
    "orders_pareto_concentration",
    "orders_interpurchase_survival",
    "orders_hhi_concentration",
    "orders_association_rules",
    "orders_ship_latency_percentiles",
    "lineitem_abc_classification",
    "lineitem_price_index_laspeyres",
]

# All 18 round-8 additions (replay+pytest evidence in r8; first driver
# rows this round per the r8 verdict directive).
ROUND8_NEW = [
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

# Spare-slot fills: the cap-default re-validation pair (task 2) + the
# heaviest oracled plans by BENCH_3x_r08 per-query minima.
ROUND9_SPARES = [
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_uncapped",
    "kmeans_lloyd_refine",
    "dedup_simhash_pairs",
    "q21_sole_late_shipper",
    "text_tfidf_top_terms",
    "ann_lsh_topk",
    "q5_region_revenue",
    "q8_market_share",
]

# New catalog queries added in round 9: replay+pytest evidence this
# round; they take round-10 window slots (the r9 window is committed to
# closing the never-rowed ledger).
ROUND9_NEW: list[str] = [
    "lineitem_sbc_demand_classes",   # Syntetos-Boylan ADI x CV2 quadrants
    "events_gumbel_block_maxima",    # EVT return levels, moment fit
    "feature_woe_iv",                # WOE/IV feature screen
    "sketch_hll_portable",           # oracle-checkable HLL registers
    "quality_auc_delong_ci",         # DeLong AUC variance + CI
    "events_ljung_box_acf",          # portmanteau white-noise test
    "events_pettitt_changepoint",    # rank-based changepoint
    "events_var_cvar_daily",         # historical VaR / expected shortfall
    "orders_weibull_interpurchase",  # median-rank Weibull lifetime fit
    "events_interrupted_time_series",  # segmented-regression ITS
    "clustering_davies_bouldin",     # internal cluster-quality index
    "quality_spiegelhalter_z",       # bin-free calibration test
    "events_effect_sizes",           # Cohen d / Hedges g / Glass delta
    "events_slo_burn_rate",          # multiwindow error-budget alerts
    "embedding_mahalanobis_outliers",  # per-label embedding outliers
    "events_erlang_staffing",        # M/M/c Erlang-C staffing table
    "events_spectral_entropy",       # forecastability gate off the DFT
    "orders_bass_diffusion",         # adoption-curve OLS inversion
    "text_yule_k_herdan",            # vocabulary-concentration constants
    "feature_hashing_collisions",    # hashing-trick collision audit
    "quality_fairness_by_source",    # 80%-rule keep-rate audit
    "lineitem_price_elasticity",     # log-log demand elasticity
    "sample_neyman_allocation",      # optimal stratified budget split
    "events_burstiness_memory",      # Goh-Barabasi (B, M) coordinates
    "events_switchback_lift",        # time-block randomized experiment
    "events_forecast_mase_ladder",   # naive/seasonal-naive MASE ladder
    "clustering_label_purity",       # external cluster-quality gate
    "events_seasonal_strength",      # tsfeatures F_s / F_t off STL
    "quality_raters_kendall_tau",    # ordinal rater agreement
    "dq_tukey_fences",               # boxplot IQR outlier screen
]


def test_priority_list_is_first_50():
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY


def test_window_covers_backlog_and_round8_new():
    window = set(_PRIORITY)
    for required in [*ROUND9_BACKLOG, *ROUND8_NEW, *ROUND9_SPARES]:
        assert required in window, required


def test_round9_additions_registered():
    for name in ROUND9_NEW:
        assert name in QUERIES, name


def test_capped_default_is_the_headline_name():
    """VERDICT r8 task 2: the headline dedup query must be the capped
    plan (bucket-size-bounded pair generation), with the uncapped form
    kept only as an explicitly-named diagnostic twin."""
    import automated_data_pipeline_python_spark.queries.dedup as D

    assert QUERIES["dedup_minhash_lsh"].oracle == D._MINHASH_CAPPED_DUCK_SQL
    assert (
        QUERIES["dedup_minhash_lsh_uncapped"].oracle == D._MINHASH_DUCK_SQL
    )
    assert "dedup_minhash_lsh_capped" not in QUERIES  # name retired


# Modules with no round-9 window sentinel: batteries whose every member
# already has a hash-green driver row in the r1-r8 union AND stays
# covered by the committed full-catalog replays + the pytest
# oracle-parity sweep. First driver evidence for never-rowed queries
# outranks a redundant sentinel.
REPLAY_COVERED_MODULES = {
    "curation",
    "curation2",
    "dq",
    "experiments",
    "graph",
    "lm",
    "modern_sql",
    "multimodal",
    "reco",
    "relational2",
    "relational3",
    "relational4",
    "relational5",
    "retrieval",
    "sketches",
    "warehouse",
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
