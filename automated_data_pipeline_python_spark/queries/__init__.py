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
# replay-only evidence into hard driver rows. Round 10 (VERDICT r9 task
# 1): the r1-r9 union driver-rowed 363 of 393 queries; this window
# spends 30 slots on the only never-rowed queries left — the ROUND9_NEW
# operators — making the catalog 393/393 ever-rowed for the first time.
# The 20 spare slots re-validate the headline battery: dedup_minhash_lsh
# FIRST because its bucket-cap bookkeeping is being trimmed this round
# (VERDICT r9 task 3 — the plan changes, so a fresh hash row is
# load-bearing), its uncapped twin for the shared-template blast
# radius, then the heaviest oracled plans by BENCH_r09 per-query minima
# and one representative per major family. Everything rotated out stays
# proven by regenerated round-10 full replays committed at round end
# plus the pytest oracle-parity sweep.
_PRIORITY = [
    # -- All 30 ROUND9_NEW operators (replay+pytest in r9; rows now):
    "lineitem_sbc_demand_classes",
    "events_gumbel_block_maxima",
    "feature_woe_iv",
    "sketch_hll_portable",
    "quality_auc_delong_ci",
    "events_ljung_box_acf",
    "events_pettitt_changepoint",
    "events_var_cvar_daily",
    "orders_weibull_interpurchase",
    "events_interrupted_time_series",
    "clustering_davies_bouldin",
    "quality_spiegelhalter_z",
    "events_effect_sizes",
    "events_slo_burn_rate",
    "embedding_mahalanobis_outliers",
    "events_erlang_staffing",
    "events_spectral_entropy",
    "orders_bass_diffusion",
    "text_yule_k_herdan",
    "feature_hashing_collisions",
    "quality_fairness_by_source",
    "lineitem_price_elasticity",
    "sample_neyman_allocation",
    "events_burstiness_memory",
    "events_switchback_lift",
    "events_forecast_mase_ladder",
    "clustering_label_purity",
    "events_seasonal_strength",
    "quality_raters_kendall_tau",
    "dq_tukey_fences",
    # -- 20 spare slots: the cap-trim pair (plan changes this round),
    # then heaviest oracled plans (BENCH_r09 minima) + family
    # representatives.
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_uncapped",
    "dedup_simhash_pairs",
    "kmeans_lloyd_refine",
    "text_tfidf_top_terms",
    "q5_region_revenue",
    "q21_sole_late_shipper",
    "q8_market_share",
    "ann_lsh_topk",
    "contamination_ngram_overlap",
    "ann_ivf_topk",
    "q3_shipping_priority",
    "q1_pricing_summary",
    "corpus_curation_funnel",
    "dq_star_schema_report",
    "join_asof_purchase_click",
    "dedup_exact_documents",
    "events_sessionization",
    "knn_bruteforce_topk",
    "semdedup_cluster_prune",
    # Everything else (all other r1-r9 driver-rowed queries and any
    # round-10 additions) still registers and is replayed by
    # tools/verify_driver.py at sf0.01+sf0.1 per round
    # (VERIFY_FULL_r10*), plus the pytest oracle-parity sweep.
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
