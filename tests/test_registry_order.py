"""Registry-order contract: the grading driver only records correctness
rows for the first 50 registered queries, so the window must be spent
where it buys new evidence. Round-4 rotation: every query that had no
driver row in rounds 1-3 is in the window, plus the 8 events-family rows
that went red in round 3 (their earlier greens predate the corpus
regeneration), plus one green sentinel per family.
"""

from __future__ import annotations

from automated_data_pipeline_python_spark.queries import QUERIES, _PRIORITY, oracle_sql

# Queries with NO driver correctness row in the union of rounds 1-3
# (computed from CORRECTNESS_r0{1,2,3}.json; see queries/__init__.py).
NEVER_VERIFIED_R1_R3 = [
    "join_asof_arrow_cogroup", "fuzzy_levenshtein_pairs",
    "scalar_trig_funcs", "scalar_bit_funcs", "percentiles_discrete",
    "q4_order_priority_check", "q6_forecast_revenue",
    "q9_product_type_profit", "q10_returned_items",
    "q13_customer_distribution", "q16_part_supplier_relation",
    "q17_small_quantity_revenue", "q20_excess_shippers",
    "gapfill_recursive_spine", "udtf_long_words", "window_rank_battery",
    "window_range_frame", "events_locf_forward_fill",
    "text_repetition_scores", "sample_stratified_deterministic",
    "mixture_domain_weights", "sample_per_group_reservoir",
    "dedup_remove_near_duplicates", "ann_ivf_cell_assignment",
    "ann_recall_at_k", "events_hourly_type_matrix",
    "events_funnel_conversion", "multimodal_media_metadata",
    "scd2_customer_segments", "chunk_dedup_rate", "doc_length_histogram",
]

# Red in round 3 via the events-ts corpus regeneration; must re-prove.
R3_REDS = [
    "events_tumbling_10min", "events_sliding_10min_5min",
    "events_sessionization", "events_hierarchical_rollup",
    "events_interval_join", "join_asof_purchase_click",
    "sketch_user_reach_rollup", "sketch_heavy_hitter_terms",
]


def test_priority_list_is_first_50():
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY


def test_window_covers_unverified_and_regressed():
    window = set(_PRIORITY)
    for required in [*NEVER_VERIFIED_R1_R3, *R3_REDS]:
        assert required in window, required


def test_window_is_oracle_dense():
    """Only the by-design rows-only sketch entries may lack oracles."""
    oracles = oracle_sql()
    missing = [n for n in _PRIORITY if n not in oracles]
    assert set(missing) <= {"sketch_user_reach_rollup", "ann_ivf_cell_assignment"}


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
    ]
    built = {n: QUERIES[n].fn(spark, SF_SMOKE) for n in names}  # build all first

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())

    deferred = {n: canon(df) for n, df in built.items()}        # collect after
    fresh = {n: canon(QUERIES[n].fn(spark, SF_SMOKE)) for n in names}
    assert deferred == fresh
