"""Registry-order contract: the grading driver only records correctness
rows for the first 50 registered queries, so the window must be spent
where it buys new evidence. Round-11 rotation (VERDICT r10 task 1): the
r1-r10 union driver-rowed 393 of 410 queries; this window spends 17
slots on the ONLY remaining never-driver-rowed queries — the full
ROUND10_NEW list (three of which carry this round's ADVICE plan fixes,
so their fresh rows validate the new plans) — closing the ledger at
410/410 ever-rowed. The other 33 slots empty the sentinel-exemption
set: 24 module sentinels (one per query module not already represented
by the ROUND10_NEW block, so a regression in ANY module can surface in
the driver's independent gate), the post-dea6201 Bass plan that never
had a post-fix row, and ALL EIGHT ROUND11_NEW operators — rowed in
their birth round, so the ever-rowed ledger stays complete at 418/418
continuously instead of owing r12 a rotation. Everything rotated out
stays proven by the committed full-catalog replays (VERIFY_FULL_r11*,
418/418 green at sf0.01 AND sf0.1) and the pytest oracle-parity sweep.
"""

from __future__ import annotations

from automated_data_pipeline_python_spark.queries import QUERIES, _PRIORITY, oracle_sql

# All 17 round-10 additions (replay+pytest evidence in r10; first driver
# rows this round per the r10 verdict directive — the only never-rowed
# queries left in the catalog).
ROUND10_NEW = [
    "events_welch_ttest",            # unequal-variance mean test + WS df
    "events_jarque_bera",            # moment normality test
    "events_anderson_darling",       # tail-weighted normality test
    "events_durbin_watson",          # residual serial-correlation test
    "events_hurst_rescaled_range",   # long-memory R/S ladder
    "events_pacf_durbin_levinson",   # AR-order diagnostic off the ACF
    "quality_mcc_confusion",         # MCC/F1/balanced-accuracy battery
    "quality_log_loss",              # proper-score cross-entropy + Brier
    "clustering_adjusted_rand",      # chance-corrected external index
    "clustering_silhouette_simplified",  # centroid-based internal index
    "corpus_source_hellinger_tv",    # metric source-distance matrix
    "reco_slope_one_eval",           # rating-prediction baseline + MAE
    "quality_ks_separation",         # max CDF gap between classes
    "quality_cumulative_gains",      # targeting gains/lift deciles
    "events_poisson_dispersion",     # variance-to-mean Poisson gate
    "orders_repeat_purchase_curve",  # retention depth ladder
    "events_theta_forecast",         # M3-winning theta backtest + MASE
]

# One sentinel per query module not already covered by ROUND10_NEW —
# with these the replay-only exemption set is EMPTY (r10 verdict
# "What's wrong" #2). Sentinels double as headline battery where the
# module has a headline query.
ROUND11_SENTINELS = {
    "corpus_curation_funnel": "curation",
    "quality_naive_bayes_gate": "curation3",
    "dedup_minhash_lsh": "dedup",
    "dq_star_schema_report": "dq",
    "events_sessionization": "events",
    "events_ab_test_lift": "experiments",
    "events_interrupted_time_series": "experiments2",
    "graph_brand_pagerank": "graph",
    "bpe_train_merge_rounds": "lm",
    "lateral_top2_orders_per_customer": "modern_sql",
    "multimodal_media_metadata": "multimodal",
    "rag_mmr_rerank": "rag",
    "q1_pricing_summary": "relational",
    "pivot_status_by_priority": "relational2",
    "q2_cheapest_supplier_per_part": "relational3",
    "agg_corr_regression": "relational4",
    "fuzzy_levenshtein_pairs": "relational5",
    "text_bm25_ranking": "retrieval",
    "ann_ivf_topk": "similarity",
    "sketch_heavy_hitter_terms": "sketches",
    "text_quality_scores": "text",
    "q8_market_share": "tpch2",
    "sample_neyman_allocation": "training",
    "text_tfidf_top_terms": "windows2",
}

# The one load-bearing re-validation slot: orders_bass_diffusion's
# post-dea6201 DECIMAL-promoted normal equations never had a driver
# row. (Heaviest-plan re-validations that held spare slots in earlier
# drafts stay proven by the committed full-catalog replays at both
# SFs — their rows exist in the r1-r10 union.)
ROUND11_SPARES = [
    "orders_bass_diffusion",
]

# New catalog queries added in round 11 — and, unlike previous rounds,
# ALSO in the round-11 window (the remaining 8 slots), so they get
# driver rows in their birth round and the ever-rowed ledger stays
# complete at 418/418 continuously. Seven are the second multimodal
# family (curation over the planned media); the eighth is the
# fine-tuning loader's padding bill.
ROUND11_NEW: list[str] = [
    "multimodal_modality_mix_report",   # per-modality dataset card
    "multimodal_bitrate_outliers",      # Tukey kbit/s fences per fps
    "multimodal_frame_dedup_rate",      # frame-hash dedup histogram
    "multimodal_scene_cut_spans",       # consecutive-frame hamming cuts
    "multimodal_vad_utterances",        # gaps-and-islands VAD profile
    "multimodal_resolution_ladder",     # letterbox resize plan
    "multimodal_shard_packing",         # bucket-local running-total bins
    # plus the fine-tuning loader's padding bill (module training,
    # window-covered by the sample_neyman_allocation sentinel):
    "training_batch_padding_waste",     # length-bucketed dynamic batching
]


def test_priority_list_is_first_50():
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY


def test_window_covers_round10_new_sentinels_and_spares():
    window = set(_PRIORITY)
    for required in [*ROUND10_NEW, *ROUND11_SENTINELS, *ROUND11_SPARES,
                     *ROUND11_NEW]:
        assert required in window, required


def test_round11_additions_registered():
    for name in ROUND11_NEW:
        assert name in QUERIES, name


def test_sentinels_live_in_their_module():
    for name, mod in ROUND11_SENTINELS.items():
        assert QUERIES[name].fn.__module__.rsplit(".", 1)[1] == mod, name


def test_capped_default_is_the_headline_name():
    """VERDICT r8 task 2 (held since r9): the headline dedup query must
    be the capped plan (bucket-size-bounded pair generation), with the
    uncapped form kept only as an explicitly-named diagnostic twin."""
    import automated_data_pipeline_python_spark.queries.dedup as D

    assert QUERIES["dedup_minhash_lsh"].oracle == D._MINHASH_CAPPED_DUCK_SQL
    assert (
        QUERIES["dedup_minhash_lsh_uncapped"].oracle == D._MINHASH_DUCK_SQL
    )
    assert "dedup_minhash_lsh_capped" not in QUERIES  # name retired


# Round 11 empties the exemption set: every query module now has a
# sentinel inside the 50-slot driver window. Keep it empty — a new
# module must ship with a window slot (or a ROUND*_NEW entry that will
# take one next round).
REPLAY_COVERED_MODULES: set[str] = set()


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
        "multimodal_frame_dedup_rate",  # re-registers documents + mm_frames
        "multimodal_vad_utterances",    # re-registers documents + mm_isl
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
