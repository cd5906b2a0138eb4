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
# registered queries. With the ever-rowed ledger closed in r11 (418/418
# catalog queries have at least one driver row), the metric that matters
# is STALENESS (VERDICT r11 task 6): round 12 rotates the window onto
# the least-recently-rowed 50 — derived from max(round rowed) per query
# over CORRECTNESS_r1..r11 — so the oldest driver evidence in the
# catalog refreshes. Composition:
#   - all 39 queries whose last driver row was ROUND 1 (the relational /
#     scalar-battery basics; includes the two rows-only-by-design r1
#     queries agg_approx_distinct and sample_reproducible, whose
#     rows-only evidence refreshes the same way it was recorded in r1);
#   - 11 of the 23 queries last rowed in ROUND 3, chosen to maximize
#     module diversity first (similarity, rag, dedup, training, tpch2,
#     text, windows2), then alphabetically (agg_stats_lineitem +
#     the dedup block).
# After this window lands, no catalog query's newest driver row is
# older than round 3. The 8 ROUND11_NEW operators stay out (they rowed
# in their birth round last round). Modules without a slot this round
# are the ones whose every member rowed recently (r5-r11); their
# regression evidence stays live via the committed full-catalog
# replays at three SFs (VERIFY_FULL_r11*) and the pytest oracle-parity
# sweep, and staleness rotation naturally returns them to the window
# in later rounds (tests/test_registry_order.py documents the set).
_PRIORITY = [
    # -- 39 queries last driver-rowed in ROUND 1:
    "agg_approx_distinct",              # rows-only by design (HLL++)
    "agg_cube_status_priority",
    "agg_grouping_sets",
    "agg_rollup_region_nation",
    "array_agg_functions",
    "case_when_bucketing",
    "cross_join_regions_segments",
    "dedup_keep_first_event",
    "distinct_order_attributes",
    "explode_top_words",
    "filter_in_like_between",
    "in_subquery_hot_parts",
    "join_anti_customers_without_orders",
    "join_full_nation_presence",
    "join_left_order_counts",
    "join_range_acctbal",
    "join_semi_customers_with_orders",
    "json_extract_events",
    "limit_offset_page2",
    "null_handling_funcs",
    "percentiles_price_by_brand",
    "q12_priority_by_status",
    "q14_promo_revenue_ratio",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "sample_reproducible",              # rows-only by design (seeded RNG)
    "scalar_date_funcs",
    "scalar_date_funcs2",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "scalar_string_funcs2",
    "scalar_subquery_above_avg",
    "setops_all_variants",
    "setops_nation_keys",
    "top_customers_by_revenue",
    "unpivot_part_metrics",
    "window_lag_lead_events",
    "window_running_total",
    "window_top3_parts_per_brand",
    # -- 11 of the 23 queries last driver-rowed in ROUND 3 (module
    # diversity first, then alphabetical):
    "ann_lsh_bucket_histogram",         # similarity
    "chunk_documents_overlap",          # rag
    "dedup_clusters",                   # dedup
    "pack_sequences_chunked",           # training
    "q11_important_suppliers",          # tpch2
    "text_corpus_stats",                # text
    "text_redact_patterns",             # windows2
    "agg_stats_lineitem",               # relational
    "dedup_embedding_cosine",           # dedup
    "dedup_ngram_jaccard",              # dedup
    "dedup_ngram_jaccard_capped",       # dedup
    # Everything else (all queries last rowed r4-r11) still registers
    # and is replayed by tools/verify_driver.py at sf0.001+sf0.01+sf0.1
    # per round (VERIFY_FULL_r11*), plus the pytest oracle-parity sweep.
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
