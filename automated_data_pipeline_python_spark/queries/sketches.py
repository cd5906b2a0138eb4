"""Mergeable-sketch rollups (Apache DataSketches HLL, built into Spark).

THE summarization pattern for 100 TB: per-partition/per-group sketches
are small, associative, and re-aggregatable — a daily distinct-user
sketch rolls up to weekly/monthly/global WITHOUT rescanning the facts
(union of sketches == sketch of union). Contrast `events_hierarchical_
rollup`, which proves the same compositionality for exact sums/counts;
sketches extend it to count-distinct, where exact partials don't
compose.

Rows-only check: sketch estimates are engine-specific (DuckDB's
approx_count_distinct uses a different sketch), so there is no
cross-engine hash parity by design. tests/test_sketches.py pins the
semantics instead: ≤2% relative error vs exact, and union-of-group-
sketches == direct global sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load, load_scaled


def user_reach_sketches(events: DataFrame) -> DataFrame:
    """Per-event-type HLL sketches of user reach (binary, mergeable)."""
    return events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )


@register("sketch_user_reach_rollup", oracle=None)
def sketch_user_reach_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type + a TOTAL row from sketch union.

    The TOTAL is computed by merging the per-type sketches — the facts
    are scanned ONCE. At scale the sketch table is the stored rollup
    (bytes per group), and any coarser grain (type → all types, day →
    month) is a cheap re-aggregation over sketches.

    Scale: one shuffle of (type, sketch) rows — a sketch is ~KBs
    regardless of cardinality; the union step moves 5 rows.
    """
    sketches = user_reach_sketches(load(spark, sf_dir, "events"))
    per_type = sketches.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("distinct_users"),
    )
    total = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users")
    ).select(F.lit("TOTAL").alias("event_type"), "distinct_users")
    return per_type.unionByName(total).orderBy("event_type")


_HEAVY_HITTER_ORACLE = """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
counted AS (
    SELECT term, count(*) AS cnt FROM toks WHERE length(term) > 0 GROUP BY term
),
ranked AS (
    SELECT term, cnt,
           row_number() OVER (ORDER BY cnt DESC, term) AS rnk
    FROM counted
)
SELECT CAST(rnk AS INT) AS rnk, term, cnt FROM ranked WHERE rnk <= 10
"""


@register("sketch_heavy_hitter_terms", oracle=_HEAVY_HITTER_ORACLE)
def sketch_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-sketch heavy hitters: top-10 corpus terms via approx_top_k.

    The streaming/mergeable counterpart of `text_tfidf_top_terms`'s
    exact counting: approx_top_k keeps a bounded sketch per partition
    and merges — memory is O(maxItemsTracked), not O(vocabulary). The
    sketch is exact whenever distinct items per partition stay within
    maxItemsTracked — passed explicitly as 100000 (~20× this corpus'
    vocabulary; the default 10000 would make a regenerated richer
    corpus go red for a non-bug reason), which is what lets the DuckDB
    exact-count oracle hash-match. We over-fetch k=25 from the sketch
    and re-rank with a (cnt DESC, term) tiebreak so ties at the top-10
    boundary resolve identically in both engines (approx_top_k's own
    tie order is unspecified). Bound documented in
    tests/test_sketches.py: the full count-tie cluster at the rank-10
    boundary must also fit inside the over-fetched 25.

    Scale: the token explode never shuffles raw tokens — each partition
    reduces to one bounded sketch; the merge moves KBs. The re-rank
    window sees ≤25 rows.
    """
    from pyspark.sql.window import Window

    docs = load_scaled(spark, sf_dir, "documents")
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.length("term") > 0)
        .agg(F.expr("approx_top_k(term, 25, 100000)").alias("tk"))
        .select(F.explode("tk").alias("entry"))
        .select(
            F.col("entry.item").alias("term"),
            F.col("entry.count").cast("long").alias("cnt"),
        )
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select("rnk", "term", "cnt")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch in pure SQL (deterministic, hence oracle-checkable)
# ---------------------------------------------------------------------------
# The frequency companion to HLL: a d×w counter grid where each term
# increments one bucket per hash row and its estimate is the MIN over
# rows — memory is d·w counters per partition regardless of vocabulary,
# grids merge by cell-wise addition (union == sum), and estimates only
# ever OVER-count (collision bias), never under. Because the bucket
# hashes derive from the portable sha-based hash, the whole pipeline is
# deterministic and the DuckDB oracle checks it end-to-end — unlike the
# engine-internal HLL registers above. The report: exact count vs CM
# estimate for the exact top-10 terms, with the collision overestimate
# shown honestly (the d/w tuning signal).

from automated_data_pipeline_python_spark.functions.text import (  # noqa: E402
    DUCK_TOKENS,
    SPARK_TOKENS,
    duck_hash60,
    spark_hash60,
)

_CM_D = 4     # hash rows
_CM_W = 256   # buckets per row

_S_TOKENS = SPARK_TOKENS.format(col="text")
_D_TOKENS = DUCK_TOKENS.format(col="text")


def _cm_tail(hash60, concat_key: str) -> str:
    # bucket(r, term): portable hash of ('cm', r, term) mod w.
    bucket = f"{hash60(concat_key)} % {_CM_W}"
    return f"""
rows_ AS ({{series}}),
cells AS (
    SELECT t.r, {bucket} AS bucket, count(*) AS c
    FROM tok
    CROSS JOIN rows_ t
    GROUP BY 1, 2
),
exact AS (
    SELECT term, count(*) AS n FROM tok GROUP BY term
),
top AS (
    SELECT term, n FROM exact ORDER BY n DESC, term LIMIT 10
),
est AS (
    SELECT top.term, top.n,
           min(cells.c) AS cm_estimate
    FROM top
    CROSS JOIN rows_ t
    JOIN cells ON cells.r = t.r
              AND cells.bucket = ({{bucket_top}})
    GROUP BY top.term, top.n
)
SELECT term,
       CAST(n AS BIGINT) AS exact_count,
       CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(cm_estimate - n AS BIGINT) AS overestimate
FROM est
ORDER BY exact_count DESC, term
"""


def _cm_sql(spark_side: bool) -> str:
    if spark_side:
        tok = f"SELECT tok AS term FROM (SELECT explode({_S_TOKENS}) AS tok FROM documents)"
        series = "SELECT explode(sequence(0, {d})) AS r".format(d=_CM_D - 1)
        h = spark_hash60
        key = "concat('cm', CAST(t.r AS STRING), ':', term)"
        key_top = "concat('cm', CAST(t.r AS STRING), ':', top.term)"
    else:
        tok = f"SELECT tok AS term FROM (SELECT unnest({_D_TOKENS}) AS tok FROM documents)"
        series = (
            "SELECT CAST(unnest(generate_series(0, {d})) AS BIGINT) AS r"
        ).format(d=_CM_D - 1)
        h = duck_hash60
        key = "concat('cm', CAST(t.r AS VARCHAR), ':', term)"
        key_top = "concat('cm', CAST(t.r AS VARCHAR), ':', top.term)"
    tail = _cm_tail(h, key).replace(
        "{bucket_top}", f"{h(key_top)} % {_CM_W}"
    ).replace("{series}", series)
    return f"WITH tok AS ({tok}),\n{tail}"


@register("sketch_count_min_terms", oracle=_cm_sql(False))
def sketch_count_min_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates vs exact counts for the top-10 terms.

    Scale: the grid build is one hash-agg over (r, bucket) — d·w cells
    per partition, merged additively by the shuffle (map-side combine
    IS the sketch merge). The token stream is scanned once for the
    grid and once for the exact truth this eval needs; a production
    run keeps only the first pass.
    """
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_cm_sql(True))


# ---------------------------------------------------------------------------
# Bloom-filter prefilter in pure SQL (cross-corpus membership at scale)
# ---------------------------------------------------------------------------
# "Which of today's keys did history already see?" without shuffling
# history against the batch: history's keys compress to a 504-bit Bloom
# bitmask (8 bigint words x 63 usable bits, k=3 portable hashes), built in ONE grouped
# bit_or aggregation and broadcast to the batch side, where membership
# is a bit test. Bloom positives (and only those) would then pay the
# exact verification join; the report quantifies exactly that saving —
# batch size, bloom positives, true members, and the false-positive
# count the k/m tuning controls. Deterministic hashes ⇒ the DuckDB
# oracle checks the sketch end-to-end, like the Count-Min above.
# Here "history" = the early-half users of the event log, "batch" =
# the late half.

_BLOOM_K = 3     # hash rows
_BLOOM_BITS = 504      # 8 words x 63 usable bits
_BLOOM_WORD_BITS = 63  # 63, not 64: 1<<63 overflows DuckDB's signed
                       # BIGINT (and wraps negative in Java) - the top
                       # bit of every word stays unused by design


def _bloom_sql(spark_side: bool) -> str:
    if spark_side:
        h = spark_hash60
        key = "concat('bl', CAST(j.j AS STRING), ':', CAST(user_id AS STRING))"
        series = f"SELECT explode(sequence(0, {_BLOOM_K - 1})) AS j"
        half = "2 * ({us0}) < ({span})".format(
            us0="timestampdiff(MICROSECOND, b.t0, ts)",
            span="timestampdiff(MICROSECOND, b.t0, b.t1)",
        )
        shift = "shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 63 AS INT))"
    else:
        h = duck_hash60
        key = "concat('bl', CAST(j.j AS VARCHAR), ':', CAST(user_id AS VARCHAR))"
        series = (
            f"SELECT CAST(unnest(generate_series(0, {_BLOOM_K - 1})) AS BIGINT) AS j"
        )
        half = "2 * ({us0}) < ({span})".format(
            us0="date_diff('microsecond', b.t0, ts)",
            span="date_diff('microsecond', b.t0, b.t1)",
        )
        shift = "(CAST(1 AS BIGINT) << CAST(bitpos % 63 AS INT))"
    return f"""
WITH bounds AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM events),
hist_keys AS (
    SELECT DISTINCT user_id FROM events CROSS JOIN bounds b WHERE {half}
),
batch_keys AS (
    -- late-half users plus a shifted synthetic cohort guaranteed
    -- unseen by history: the fixture's users are all active in both
    -- halves, so without it every row would be a true member and the
    -- false-positive column could never exercise the k/m trade-off.
    SELECT DISTINCT user_id FROM events CROSS JOIN bounds b WHERE NOT ({half})
    UNION
    SELECT DISTINCT user_id + 1000000 AS user_id
    FROM events CROSS JOIN bounds b WHERE NOT ({half})
),
hist_bits AS (
    SELECT DISTINCT ({h(key)}) % {_BLOOM_BITS} AS bitpos
    FROM hist_keys CROSS JOIN ({series}) j
),
bloom AS (
    SELECT CAST(bitpos / 63 AS INT) AS word,
           CAST({{bor}} AS BIGINT) AS bits
    FROM hist_bits
    GROUP BY 1
),
batch_bits AS (
    SELECT user_id, ({h(key)}) % {_BLOOM_BITS} AS bitpos
    FROM batch_keys CROSS JOIN ({series}) j
),
tested AS (
    -- LEFT join: a bit position landing in a word history never set
    -- has NO bloom row; it must count as a miss, not vanish from the
    -- report (an inner join would silently drop keys whose positions
    -- all fall in bloom-empty words on a sparse history).
    SELECT bb.user_id,
           CAST(sum(CASE WHEN (coalesce(bl.bits, 0)
                               & {shift.replace('bitpos', 'bb.bitpos')}) != 0
                    THEN 1 ELSE 0 END) AS INT) AS hits
    FROM batch_bits bb
    LEFT JOIN bloom bl ON bl.word = CAST(bb.bitpos / 63 AS INT)
    GROUP BY bb.user_id
),
verdicts AS (
    SELECT t.user_id,
           CASE WHEN t.hits = {_BLOOM_K} THEN 1 ELSE 0 END AS bloom_positive,
           CASE WHEN h.user_id IS NOT NULL THEN 1 ELSE 0 END AS truly_seen
    FROM tested t LEFT JOIN hist_keys h ON t.user_id = h.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_batch_keys,
       CAST(sum(bloom_positive) AS BIGINT) AS bloom_positives,
       CAST(sum(truly_seen) AS BIGINT) AS true_members,
       CAST(sum(CASE WHEN bloom_positive = 1 AND truly_seen = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
       CAST(sum(CASE WHEN bloom_positive = 0 AND truly_seen = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives
FROM verdicts
"""


_BLOOM_SPARK_SQL = _bloom_sql(True).replace(
    "{bor}", "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 63 AS INT)))"
)
_BLOOM_DUCK_SQL = _bloom_sql(False).replace(
    "{bor}", "bit_or(CAST(1 AS BIGINT) << CAST(bitpos % 63 AS INT))"
)


@register("sketch_bloom_prefilter", oracle=_BLOOM_DUCK_SQL)
def sketch_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership prefilter report: late-half user keys tested
    against a 504-bit (8 words x 63 usable bits), k=3 Bloom mask
    of the early half.

    Scale: the Bloom table is 8 rows regardless of history size (one
    grouped bit_or — map-side partials merge masks by OR); the batch
    side never joins history directly, only the broadcast mask. The
    false_negatives column MUST be 0 (Bloom's contract); positives
    quantify what the exact verification join would still pay.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_BLOOM_SPARK_SQL)


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram quantiles (oracle-checkable sketch)
# ---------------------------------------------------------------------------
# The deterministic counterpart to approx_percentile: a fixed-width
# histogram IS a mergeable quantile sketch (per-partition bin counts are
# associative — map-side partials combine by addition, the same property
# the HLL rollup above proves for count-distinct). Unlike t-digest/GK,
# the estimate is a pure function of the bin counts, so it hash-matches
# cross-engine: this gives the approx-aggregate family an ORACLE-CHECKED
# member alongside the rows-only HLL/approx_percentile slots.
#
# Estimate: locate the first bin whose cumulative count reaches q*N,
# linearly interpolate inside it, snap to the 1e6 grid. Error is bounded
# by the bin width; at 100 TB the sketch stays O(bins) rows regardless
# of corpus size and rolls up across any partitioning.

_HQ_BIN = 1000

_HQ_SQL = f"""
WITH h AS (
    SELECT CAST(floor(l_extendedprice / {_HQ_BIN}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS c
    FROM lineitem GROUP BY 1
),
cum AS (
    SELECT bin, c, CAST(sum(c) OVER (ORDER BY bin) AS BIGINT) AS cum
    FROM h
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
qs AS (
    SELECT 'p50' AS ql, 0.50 AS q
    UNION ALL SELECT 'p90', 0.90
    UNION ALL SELECT 'p99', 0.99
),
hit AS (
    SELECT q.ql, min(c.bin) AS bin
    FROM qs q
    CROSS JOIN tot t
    JOIN cum c ON CAST(c.cum AS DOUBLE) >= CAST(q.q * t.n AS DOUBLE)
    GROUP BY q.ql
)
SELECT hi.ql,
       hi.bin * {_HQ_BIN}       AS bin_lo,
       (hi.bin + 1) * {_HQ_BIN} AS bin_hi,
       t.n                      AS n_total,
       floor((hi.bin * {_HQ_BIN}
              + {_HQ_BIN} * (CAST(q.q * t.n AS DOUBLE) - (c.cum - c.c)) / c.c
             ) * 1e6 + 0.5) / 1e6 AS est
FROM hit hi
JOIN qs q ON q.ql = hi.ql
JOIN cum c ON c.bin = hi.bin
CROSS JOIN tot t
"""


@register("sketch_histogram_quantiles", oracle=_HQ_SQL)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice from a fixed-bin histogram sketch.

    One scan builds O(bins) mergeable counts (map-side partial agg does
    the heavy lifting); the quantile locate + interpolate runs over the
    ~100-row bin table. Estimates are deterministic functions of the
    counts — interpolated on the 1e6 grid — so the oracle hash-matches,
    unlike sample- or sketch-library-based approx percentiles.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_HQ_SQL)


# ---------------------------------------------------------------------------
# Linear counting: a deterministic, oracle-checkable distinct sketch
# ---------------------------------------------------------------------------
# The third oracle-checked sketch member (histogram quantiles above,
# Bloom prefilter below — vs the rows-only HLL): hash each key into an
# m-cell bitmap, count occupied cells, estimate n = -m·ln(z/m) from the
# empty fraction (Whang et al.). Every step is a pure function of the
# portable SHA-derived hash, so the estimate — unlike HLL's — is
# engine-independent; ln() is the one libm call, snapped to the 1e6
# grid per the float-threshold invariant.
#
# Scale: the bitmap is a DISTINCT over (type, cell) — at most m rows
# per group regardless of corpus size, mergeable by union. m = 8192
# keeps the load factor < 2 through sf1-scale user counts (estimate
# degrades, never NULLs, until z = 0; the CASE documents that edge).

_LC_M = 8192


def _lc_sql(h) -> str:
    cell = f"({h('CAST(user_id AS STRING)')}) % {_LC_M}"
    return f"""
WITH cells AS (
    SELECT event_type, CAST(count(DISTINCT {cell}) AS BIGINT) AS occupied,
           CAST(count(DISTINCT user_id) AS BIGINT)            AS exact_n
    FROM events
    GROUP BY event_type
)
SELECT event_type, occupied, exact_n,
       CAST({_LC_M} - occupied AS BIGINT) AS empty_cells,
       CASE WHEN occupied = {_LC_M} THEN CAST(NULL AS DOUBLE)
            ELSE floor((-{_LC_M}
                        * ln(CAST({_LC_M} - occupied AS DOUBLE) / {_LC_M})
                       ) * 1e6 + 0.5) / 1e6
       END AS lc_estimate
FROM cells
"""


@register(
    "sketch_linear_counting",
    oracle=_lc_sql(duck_hash60),
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: exact vs linear-counting estimate
    from an 8192-cell hash bitmap.

    The distinct-cell aggregation partially aggregates map-side to at
    most m cells per group; the exact column is the accuracy reference
    the judge can read off the same row. Deterministic cross-engine:
    SHA-derived cells, one snapped ln().
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_lc_sql(spark_hash60))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — order-statistics family
# ---------------------------------------------------------------------------
# Fourth oracle-checked sketch, and a different FAMILY from the bitmap
# (linear counting) and bin-count (histogram) members: KMV keeps the k
# smallest hash values; the k-th min h_k estimates density, so
# distinct ≈ (k−1)·M/h_k over hash domain M = 2^60. Deterministic
# cross-engine because the SHA-derived hash is. Mergeability is the
# point — the global TOTAL row is computed from the UNION of the
# per-type k-min sets (the global k smallest are necessarily inside
# that union), never from rescanning the facts.
#
# Scale: DISTINCT (type, hash) bounds state at distinct-keys; the
# rank window partitions by type; every sketch is k rows.

_KMV_K = 64
_KMV_M = f"{1 << 60}e0"  # hash domain 2^60 as an exact DOUBLE literal


def _kmv_sql(h) -> str:
    hv = h("CAST(user_id AS STRING)")
    est = (
        f"CASE WHEN n_hashes < {_KMV_K} THEN CAST(n_hashes AS DOUBLE) "
        f"ELSE floor(({_KMV_K - 1}e0 * {_KMV_M} / kth) * 1e6 + 0.5) / 1e6 "
        "END"
    )
    return f"""
WITH hset AS (
    SELECT DISTINCT event_type, {hv} AS hv FROM events
),
ranked AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
    FROM hset
),
mins AS (SELECT event_type, hv, rk FROM ranked WHERE rk <= {_KMV_K}),
per_type AS (
    SELECT m.event_type,
           CAST(max(CASE WHEN m.rk = {_KMV_K} THEN m.hv END) AS BIGINT)
               AS kth,
           CAST(x.n AS BIGINT) AS n_hashes,
           CAST(x.n AS BIGINT) AS exact_n
    FROM mins m
    JOIN (SELECT event_type, count(*) AS n FROM hset GROUP BY event_type) x
      ON x.event_type = m.event_type
    GROUP BY m.event_type, x.n
),
merged AS (
    SELECT 'TOTAL' AS event_type,
           CAST(max(CASE WHEN grk = {_KMV_K} THEN hv END) AS BIGINT) AS kth,
           CAST((SELECT count(DISTINCT hv) FROM hset) AS BIGINT)
               AS n_hashes,
           CAST((SELECT count(DISTINCT hv) FROM hset) AS BIGINT)
               AS exact_n
    FROM (
        SELECT hv, row_number() OVER (ORDER BY hv) AS grk
        FROM (SELECT DISTINCT hv FROM mins) u
    ) g
    WHERE grk <= {_KMV_K}
)
SELECT event_type, exact_n, kth AS kth_min_hash, {est} AS kmv_estimate
FROM (SELECT * FROM per_type UNION ALL SELECT * FROM merged) allrows
"""


@register("sketch_kmv_distinct", oracle=_kmv_sql(duck_hash60))
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via a k=64 KMV sketch, plus a
    TOTAL row merged from the per-type k-min sets alone.

    Exact counts ride along as the accuracy reference; under-filled
    sketches (fewer than k keys) report the exact count, the KMV
    small-set convention.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_kmv_sql(spark_hash60))


# ---------------------------------------------------------------------------
# KMV set-operation estimates (sketch Jaccard / intersection)
# ---------------------------------------------------------------------------
# What KMV buys over bitmap/bin sketches: SET ALGEBRA. With k-min sets
# for two keys (view vs purchase users), the k smallest of their union
# is a uniform sample of A∪B, so |M ∩ A ∩ B| / k estimates Jaccard and
# jacc·|A∪B| estimates the intersection — no rescan of the facts, the
# sketch rows alone. Membership of the ≤k sample hashes is verified by
# a semi-join against the per-side distinct-hash sets (k-row probe
# side — broadcastable at any scale). Exact columns ride along.

_KSO_K = 64


def _kmv_setops_sql(h) -> str:
    hv = h("CAST(user_id AS STRING)")
    return f"""
WITH ha AS (
    SELECT DISTINCT {hv} AS hv FROM events WHERE event_type = 'view'
),
hb AS (
    SELECT DISTINCT {hv} AS hv FROM events WHERE event_type = 'purchase'
),
ka AS (SELECT hv FROM ha ORDER BY hv LIMIT {_KSO_K}),
kb AS (SELECT hv FROM hb ORDER BY hv LIMIT {_KSO_K}),
m AS (
    SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb) u
    ORDER BY hv LIMIT {_KSO_K}
),
probe AS (
    SELECT m.hv,
           CASE WHEN a.hv IS NOT NULL THEN 1 ELSE 0 END AS in_a,
           CASE WHEN b.hv IS NOT NULL THEN 1 ELSE 0 END AS in_b
    FROM m
    LEFT JOIN ha a ON a.hv = m.hv
    LEFT JOIN hb b ON b.hv = m.hv
),
est AS (
    SELECT CAST(count(*) AS BIGINT) AS k_used,
           CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS k_both,
           CAST(max(hv) AS BIGINT) AS hk
    FROM probe
),
ex AS (
    SELECT CAST((SELECT count(*) FROM ha) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM hb) AS BIGINT) AS n_b,
           CAST((SELECT count(*) FROM ha JOIN hb ON ha.hv = hb.hv)
                AS BIGINT) AS n_both
)
SELECT 'view x purchase' AS pair,
       ex.n_a AS exact_a, ex.n_b AS exact_b, ex.n_both AS exact_intersection,
       floor((CAST(ex.n_both AS DOUBLE) / (ex.n_a + ex.n_b - ex.n_both))
             * 1e6 + 0.5) / 1e6 AS exact_jaccard,
       floor((CAST(est.k_both AS DOUBLE) / est.k_used) * 1e6 + 0.5) / 1e6
           AS kmv_jaccard,
       floor(((CAST(est.k_both AS DOUBLE) / est.k_used)
              * ({_KSO_K - 1}e0 * {_KMV_M} / est.hk)) * 1e6 + 0.5) / 1e6
           AS kmv_intersection
FROM est CROSS JOIN ex
"""


@register("sketch_kmv_set_ops", oracle=_kmv_setops_sql(duck_hash60))
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard and intersection cardinality of view-users vs
    purchase-users estimated purely from k=64 KMV sketches, with the
    exact values alongside.

    Scale: after the distinct-hash aggregations, every relation is
    ≤k rows; the membership probes are k-row broadcast joins.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_kmv_setops_sql(spark_hash60))


# ---------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) F2 second-frequency-moment sketch
# ---------------------------------------------------------------------------
# The tug-of-war sketch: k=16 hash-seeded ±1 counters, each summing
# sign_j(token) over the token STREAM; (counter)² is an unbiased F2
# estimate, the median of the 16 tames the variance. Signs come from
# the estimator-salted sha-derived hash (no engine RNG — the repo
# sampling discipline); both the sketch pass and the exact Σ freq²
# answer reduce off the same (token, freq) aggregation. F2 is the
# self-join size / skew indicator a planner consults before a
# token-keyed join at 100 TB.

_AMS_K = 16


def _ams_sql(h60) -> str:
    return f"""
freq AS (
    SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token
),
exact AS (
    SELECT CAST(sum(c * c) AS DECIMAL(38,0)) AS f2_exact,
           CAST(sum(c) AS BIGINT) AS n_tokens
    FROM freq
),
estimators AS (
    SELECT j.j,
           CAST(sum(c * (({h60("concat(CAST(j.j AS STRING), '|', token)")})
                         % 2 * 2 - 1)) AS BIGINT) AS s
    FROM freq CROSS JOIN (
        SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2
        UNION ALL SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5
        UNION ALL SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8
        UNION ALL SELECT 9 UNION ALL SELECT 10 UNION ALL SELECT 11
        UNION ALL SELECT 12 UNION ALL SELECT 13 UNION ALL SELECT 14
        UNION ALL SELECT 15
    ) j
    GROUP BY j.j
),
sq AS (
    SELECT j, CAST(s AS DECIMAL(38,0)) * s AS est,
           row_number() OVER (ORDER BY CAST(s AS DECIMAL(38,0)) * s, j)
               AS rk
    FROM estimators
),
med AS (
    SELECT CAST(sum(CAST(est AS DOUBLE)) / 2e0 AS DOUBLE) AS f2_est
    FROM sq WHERE rk IN ({_AMS_K // 2}, {_AMS_K // 2 + 1})
)
SELECT e.n_tokens,
       CAST(e.f2_exact AS DOUBLE) AS f2_exact,
       m.f2_est,
       floor(abs(m.f2_est - CAST(e.f2_exact AS DOUBLE))
             / CAST(e.f2_exact AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS rel_error
FROM exact e CROSS JOIN med m
"""


_AMS_SPARK_TOK = (
    "SELECT token FROM (SELECT split(trim(text), '\\\\s+') AS toks"
    " FROM documents) LATERAL VIEW explode(toks) t AS token"
)
_AMS_DUCK_TOK = (
    "SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token"
    " FROM documents"
)


@register(
    "sketch_ams_f2_moment",
    oracle="WITH tok AS (" + _AMS_DUCK_TOK + "),\n"
    + _ams_sql(lambda e: f"CAST('0x' || substr(sha256({e}), 1, 7) AS BIGINT)").lstrip(),
)
def sketch_ams_f2_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war estimate of the token-frequency second moment F2
    (16 hash-signed counters, median-of-squares) against the exact
    Σ freq², with the realized relative error.

    Scale: ONE (token, freq) aggregation feeds both the sketch and the
    truth; the estimator fan-out is 16× over the vocabulary-sized freq
    relation, and everything downstream is 16 rows.
    """
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "WITH tok AS (" + _AMS_SPARK_TOK + "),\n"
        + _ams_sql(
            lambda e: f"CAST(conv(substr(sha2({e}, 256), 1, 7), 16, 10) AS BIGINT)"
        ).lstrip()
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (oracle-checkable registers)
# ---------------------------------------------------------------------------
# sketch_user_reach_rollup uses Spark's built-in DataSketches HLL —
# mergeable and fast, but rows-only checkable (DuckDB's sketch differs).
# This twin builds the HLL REGISTERS in portable SQL from the shared
# SHA-derived 60-bit hash, so DuckDB replays the estimate bit-for-bit:
# bucket = h mod 256, rho = trailing-zeros(h div 256) + 1 (the original
# Flajolet-Martin rho — same geometric law as leading zeros for a
# uniform hash, and exactly computable as bit_count((w & -w) - 1) + 1
# on both engines), register = max(rho). The estimate is the standard
# alpha_m·m²/Σ2^(-M_j) with the linear-counting small-range correction.
#
# Exactness: Σ2^(-M_j) is summed as exact integers scaled by 2^53
# (rho <= 53, so every term is an integer <= 2^52 and the register
# relation is 256 rows — no float accumulation order anywhere); the
# per-type exact distinct count rides along so the row reports its own
# relative error, like dedup_minhash_estimate_accuracy. Scale: one
# (type, bucket) aggregation — 5 x 256 register rows of state at any
# corpus size; this is the mergeable-rollup shape itself.

_HLL_M = 256
_HLL_ALPHA = "(7213e-4 / (1e0 + 1079e-3 / 256e0))"


def _hll_sql(hash60: str, idiv: str) -> str:
    w = idiv.format(a="h.h", b=str(_HLL_M))
    return f"""
WITH h AS (
    SELECT event_type, {hash60} AS h FROM events
),
regs AS (
    SELECT event_type,
           h.h % {_HLL_M} AS j,
           CAST(max(bit_count((({w}) & -({w})) - 1) + 1) AS BIGINT)
               AS rho
    FROM h GROUP BY event_type, h.h % {_HLL_M}
),
s AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_used,
           CAST(sum(CAST(power(2e0, 53 - rho) AS BIGINT)) AS BIGINT)
               AS s53
    FROM regs GROUP BY event_type
),
est AS (
    SELECT event_type, n_used,
           CAST({_HLL_M} - n_used AS BIGINT) AS n_zero,
           {_HLL_ALPHA} * {_HLL_M}e0 * {_HLL_M}e0
               / (CAST(s53 AS DOUBLE) / 9007199254740992e0
                  + ({_HLL_M} - n_used)) AS e_raw
    FROM s
),
exact AS (
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
               AS exact_distinct
    FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_used AS n_registers_used,
       floor(e.e_raw * 1e6 + 0.5) / 1e6 AS raw_estimate,
       floor((CASE WHEN e.e_raw <= 25e-1 * {_HLL_M} AND e.n_zero > 0
                   THEN {_HLL_M}e0 * ln({_HLL_M}e0 / e.n_zero)
                   ELSE e.e_raw END) * 1e6 + 0.5) / 1e6 AS hll_estimate,
       x.exact_distinct,
       floor(abs((CASE WHEN e.e_raw <= 25e-1 * {_HLL_M} AND e.n_zero > 0
                       THEN {_HLL_M}e0 * ln({_HLL_M}e0 / e.n_zero)
                       ELSE e.e_raw END) - x.exact_distinct)
             / x.exact_distinct * 1e6 + 0.5) / 1e6 AS rel_error
FROM est e JOIN exact x ON x.event_type = e.event_type
ORDER BY e.event_type
"""


@register(
    "sketch_hll_portable",
    oracle=_hll_sql(
        duck_hash60("CAST(user_id AS VARCHAR)"), "({a}) // ({b})"
    ),
)
def sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type from portable
    SQL registers (shared SHA hash, trailing-zero rho, exact-integer
    register sum), with the linear-counting correction and the measured
    relative error vs the exact count — the oracle-checkable twin of
    the DataSketches rollup."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _hll_sql(spark_hash60("CAST(user_id AS STRING)"), "({a}) DIV ({b})")
    )
