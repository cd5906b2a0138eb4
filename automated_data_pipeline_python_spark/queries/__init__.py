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
# must (re-)prove, (b) remaining slots go to queries with no driver row
# in ANY prior round (the r1-r6 union covers 223 of 332 — this window
# chips away at the 109 whose evidence is replay+pytest only).
# Everything else still registers and is verified by
# tools/verify_driver.py + CI at sf0.001/sf0.01.
_PRIORITY = [
    # (a) semantically touched in round 7 — must re-prove:
    "lm_unigram_em_round",   # E-step: recursive CTE -> aggregate() DP fold
    # (b) rewritten in round 6 (per-step recursion -> single fold,
    # commit 5dcefcb) but never driver-rowed since:
    "events_kleinberg_bursts",
    "events_holt_forecast",
    "events_holt_winters_weekly",
    # (c) NEW in round 7 (first driver evidence):
    "events_cusum_changepoint",
    "events_linear_interpolation",
    "dq_t_closeness",
    "er_levenshtein_blocked",
    "reco_map_mrr_eval",
    "lm_wordpiece_greedy",
    "graph_personalized_pagerank",
    "events_cramer_von_mises",
    "lineitem_croston_demand",
    "quality_platt_scaling",
    "events_mann_kendall_trend",
    "events_kuiper_two_sample",
    "dedup_prefix_filter_join",
    "events_runs_test",
    # (d) round-6 additions with no driver row in the r1-r6 union
    # (VERDICT r6 task 1):
    "mixture_doremi_round",
    "corpus_source_ablation_loo",
    "mlstats_cv_ols_r2",
    "quality_pr_auc",
    "orders_logrank_survival_test",
    "orders_sequential_rules",
    "sketch_ams_f2_moment",
    "events_stl_decomposition",
    "events_haar_wavelet_energy",
    # (e) never driver-rowed in r1-r6 (replay+pytest evidence only),
    # chosen for plan complexity and module spread — first hard rows
    # (six of these ceded their slots to the round-7 additions above;
    # they remain replay+pytest covered):
    "join_asof_nearest",
    "scd2_as_of_snapshot",
    "warehouse_merge_upsert",
    "warehouse_zorder_clustering",
    "graph_weighted_sssp",
    "graph_link_prediction",
    "graph_brand_reachability",
    "text_textrank_keywords",
    "events_cep_absence_pattern",
    "events_three_way_interval_join",
    "events_sprt_ab_trajectory",
    "events_cuped_adjustment",
    "events_cem_matching",
    "ann_lsh_multiprobe_topk",
    "ann_multiprobe_recall_eval",
    "rag_reciprocal_rank_fusion",
    "retrieval_maxsim_colbert",
    "bpe_train_merge_rounds",
    "bpe_compression_curve",
    "lm_heldout_perplexity",
    "mixture_class_balanced_weights",
    "corpus_good_turing_chao1",
    "multimodal_frame_sample_plan",
    # Everything else (including all 223 r1-r6 driver-rowed queries —
    # among them every round-6 addition that got its row in
    # CORRECTNESS_r06) still registers and is replayed by
    # tools/verify_driver.py at sf0.01+sf0.1 per round
    # (VERIFY_FULL_r07*), plus the pytest oracle-parity sweep.
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
