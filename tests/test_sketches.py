"""HLL sketch semantics: accuracy and mergeability (queries/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.queries.sketches import (
    sketch_user_reach_rollup,
    user_reach_sketches,
)
from automated_data_pipeline_python_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_sketch_estimates_close_to_exact(spark):
    got = {
        r.event_type: r.distinct_users
        for r in sketch_user_reach_rollup(spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["TOTAL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(1, 0.02 * exact[k]), (k, est, exact[k])


def test_union_of_sketches_equals_sketch_of_union(spark):
    ev = load(spark, SF_DIR, "events")
    merged = (
        user_reach_sketches(ev)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]
        .est
    )
    # Same sketch family/parameters -> identical estimate, not just close.
    assert merged == direct


def test_heavy_hitters_agree_with_exact_counts(spark):
    from automated_data_pipeline_python_spark.queries.sketches import (
        sketch_heavy_hitter_terms,
    )

    got = {r.term: r.cnt for r in sketch_heavy_hitter_terms(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents")
    exact = dict(
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter("length(t) > 0")
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), "t")
        .limit(30)
        .collect()
    )
    assert len(got) == 10
    for term, cnt in got.items():
        assert term in exact and abs(cnt - exact[term]) <= 0.02 * exact[term]


def test_heavy_hitters_oracle_bounds_hold(spark):
    """The exact-count oracle hash-match relies on two corpus bounds;
    assert them so a future red driver row is diagnosable as a corpus
    change, not an engine bug:
    1. distinct terms stay within the explicit maxItemsTracked (100000)
       — the sketch is exact only within that budget;
    2. the count-tie cluster spanning the rank-10 boundary fits inside
       the over-fetched k=25 — otherwise the (cnt DESC, term) re-rank
       can pick different tie members than the oracle."""
    docs = load(spark, SF_DIR, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter("length(t) > 0")
        .groupBy("t")
        .count()
    )
    assert counts.count() < 100000, "vocabulary outgrew maxItemsTracked"
    top = counts.orderBy(F.desc("count"), "t").limit(25).collect()
    boundary_cnt = top[9]["count"]
    tie_cluster = counts.filter(F.col("count") == boundary_cnt).count()
    above = sum(1 for r in top[:10] if r["count"] > boundary_cnt)
    assert above + tie_cluster <= 25, (
        f"rank-10 tie cluster ({tie_cluster} terms at cnt={boundary_cnt}) "
        "no longer fits in the k=25 over-fetch"
    )


def test_count_min_never_underestimates(spark):
    """CM's one-sided error contract: estimate >= exact for every
    term (collisions only ADD counts)."""
    from automated_data_pipeline_python_spark.queries import QUERIES

    rows = QUERIES["sketch_count_min_terms"].fn(spark, SF_DIR).collect()
    assert rows, "empty CM report"
    for r in rows:
        assert r.cm_estimate >= r.exact_count, r
        assert r.overestimate == r.cm_estimate - r.exact_count, r


def test_bloom_contract_no_false_negatives(spark):
    """Bloom's contract: a member key can never test negative; the
    synthetic unseen cohort keeps the FP column meaningful."""
    from automated_data_pipeline_python_spark.queries import QUERIES

    row = QUERIES["sketch_bloom_prefilter"].fn(spark, SF_DIR).collect()[0]
    assert row.false_negatives == 0
    assert row.bloom_positives >= row.true_members
    assert row.n_batch_keys >= row.bloom_positives


def test_linear_counting_and_kmv_accuracy(spark):
    """The two deterministic distinct sketches stay within their
    theoretical error envelopes against the exact column they carry."""
    from automated_data_pipeline_python_spark.queries.sketches import (
        sketch_kmv_distinct,
        sketch_linear_counting,
    )

    for r in sketch_linear_counting(spark, SF_DIR).collect():
        assert r.lc_estimate is not None
        # load factor ~0.02 here → relative error well under 10%.
        assert abs(r.lc_estimate - r.exact_n) / r.exact_n < 0.1, r

    for r in sketch_kmv_distinct(spark, SF_DIR).collect():
        if r.exact_n < 64:  # under-filled sketch reports exact
            assert r.kmv_estimate == float(r.exact_n), r
        else:
            # KMV relative error ~1/sqrt(k) = 12.5%; allow 4 sigma.
            assert abs(r.kmv_estimate - r.exact_n) / r.exact_n < 0.5, r


def test_histogram_quantiles_bracket_exact(spark):
    """Every histogram-sketch quantile estimate lies inside its bin,
    and the exact quantile lies in the same bin (the sketch's error
    contract: bounded by bin width)."""
    from automated_data_pipeline_python_spark.queries.sketches import (
        sketch_histogram_quantiles,
    )

    rows = {r.ql: r for r in sketch_histogram_quantiles(spark, SF_DIR).collect()}
    assert set(rows) == {"p50", "p90", "p99"}
    li = load(spark, SF_DIR, "lineitem")
    for ql, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
        r = rows[ql]
        assert r.bin_lo <= r.est <= r.bin_hi, r
        exact = li.selectExpr(
            f"percentile(l_extendedprice, {q}) AS v"
        ).collect()[0].v
        assert r.bin_lo - 1e-9 <= exact <= r.bin_hi + 1e-9, (r, exact)
