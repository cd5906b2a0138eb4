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
# replay-only evidence into hard driver rows. Round 9 (VERDICT r8 task
# 1): the r1-r8 union driver-rowed 322 of 363 queries; this window
# spends 41 slots on EVERY remaining never-driver-rowed query (the 23
# r7-backlog leftovers + all 18 ROUND8_NEW operators), making the
# catalog 363/363 ever-rowed. The 9 spare slots go to re-validating
# dedup_minhash_lsh under its new capped-default semantics (VERDICT r8
# task 2 — the oracle changed, so a fresh hash row is load-bearing),
# first-ever-rowing its renamed uncapped diagnostic twin, and
# re-confirming the heaviest oracled plans. Everything rotated out
# stays proven by regenerated round-9 full replays committed at round
# end plus the pytest oracle-parity sweep.
_PRIORITY = [
    # -- The 23 r7-backlog never-rowed queries (VERDICT r8 task 1 list):
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
    # -- All 18 ROUND8_NEW operators (replay+pytest in r8; rows now):
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
    # -- 9 spare slots (VERDICT r8 task 1 fill guidance):
    # dedup_minhash_lsh changed semantics this round (bucket cap is now
    # the default, task 2) — its oracle changed with it, so a fresh
    # driver row re-validates the new headline plan; the uncapped
    # diagnostic twin is a new name, never rowed.
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_uncapped",
    # Heaviest oracled plans (BENCH_3x_r08 per-query minima), re-rowed:
    "kmeans_lloyd_refine",
    "dedup_simhash_pairs",
    "q21_sole_late_shipper",
    "text_tfidf_top_terms",
    "ann_lsh_topk",
    "q5_region_revenue",
    "q8_market_share",
    # Everything else (all other r1-r8 driver-rowed queries and any
    # round-9 additions) still registers and is replayed by
    # tools/verify_driver.py at sf0.01+sf0.1 per round
    # (VERIFY_FULL_r09*), plus the pytest oracle-parity sweep.
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
