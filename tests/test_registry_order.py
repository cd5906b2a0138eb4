"""Registry-order contract: the grading driver only records correctness
rows for the first 50 registered queries, so the window must be spent
where it buys new evidence. Round-7 rotation (VERDICT r6 task 1): the
r1-r6 union already driver-rowed 223 of 332 queries; this window spends
every slot on (a) the query semantically touched in round 7 (the
unigram-EM fold rewrite), (b) the three round-6 fold rewrites that never
got a driver row, and (c)/(d) queries with NO driver row in any prior
round — converting replay-only evidence into hard rows. Everything
rotated out stays proven by the committed full-catalog replays
(VERIFY_FULL_r06*/r07*) and the pytest oracle-parity sweep.
"""

from __future__ import annotations

from automated_data_pipeline_python_spark.queries import QUERIES, _PRIORITY, oracle_sql

# Touched in round 7; must re-prove on the driver.
ROUND7_TOUCHED = [
    "lm_unigram_em_round",  # E-step: recursive CTE -> aggregate() DP fold
]

# Rewritten in round 6 (recursion -> fold, commit 5dcefcb) but never
# driver-rowed since the rewrite.
ROUND7_FOLD_REWRITES = [
    "events_kleinberg_bursts",
    "events_holt_forecast",
    "events_holt_winters_weekly",
]

# Round-6 additions that missed the round-6 window (VERDICT r6 task 1).
# New in round 7.
ROUND7_NEW = [
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
    "events_runs_test",
]

ROUND7_R6_BACKFILL = [
    "mixture_doremi_round",
    "corpus_source_ablation_loo",
    "mlstats_cv_ols_r2",
    "quality_pr_auc",
    "orders_logrank_survival_test",
    "orders_sequential_rules",
    "sketch_ams_f2_moment",
    "events_stl_decomposition",
    "events_haar_wavelet_energy",
]


def test_priority_list_is_first_50():
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY


def test_window_covers_touched_and_backfill():
    window = set(_PRIORITY)
    for required in [*ROUND7_TOUCHED, *ROUND7_FOLD_REWRITES,
                     *ROUND7_NEW, *ROUND7_R6_BACKFILL]:
        assert required in window, required


# Modules with no round-7 window sentinel: long-stable batteries whose
# every member already has a hash-green driver row in the r1-r6 union
# AND stays covered by the committed full-catalog replays + the pytest
# oracle-parity sweep. First driver evidence for never-rowed queries
# outranks a redundant sentinel.
REPLAY_COVERED_MODULES = {
    "clustering",
    "curation",
    "dq",
    "drift",
    "modern_sql",
    "rag",
    "relational2",
    "relational3",
    "relational4",
    "relational5",
    "tpch2",
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
