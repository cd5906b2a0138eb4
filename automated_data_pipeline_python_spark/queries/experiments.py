"""Online-experimentation analytics: deterministic A/B assignment and
two-proportion lift testing over the event log.

The assignment is a content hash of the user id (the same portable
sha256-prefix hash the sampling/split family uses), so both engines —
and any rerun at any scale — put every user in the same arm with no
stored assignment table. The analysis is one user_id aggregation over
the corpus plus a two-row arm rollup; conversion counts are exact
integers, so the lift and the pooled two-proportion z-score are single
float expressions evaluated identically on both engines, snapped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from automated_data_pipeline_python_spark.functions.text import (
    duck_hash28,
    spark_hash28,
)
from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load


def _ab_sql(hash28: str) -> str:
    # hash28 yields a non-negative 28-bit int on both engines, so % 2 is
    # portable (no negative-modulo divergence).
    return f"""
WITH per_user AS (
    -- "converted" = heavy purchaser (>= 14 purchases, roughly the
    -- per-user median at every scale factor — purchases-per-user is
    -- scale-invariant in this corpus, and a ~50% base rate keeps the
    -- pooled variance away from 0, where the z-score is undefined).
    SELECT user_id,
           CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END)
                     >= 14 THEN 1 ELSE 0 END AS converted
    FROM events
    GROUP BY user_id
),
assigned AS (
    SELECT CASE WHEN {hash28} % 2 = 0 THEN 'control' ELSE 'treatment' END
               AS arm,
           converted
    FROM per_user
),
arms AS (
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted
    FROM assigned
    GROUP BY arm
),
wide AS (
    SELECT
        max(CASE WHEN arm = 'control' THEN n_users END) AS n_c,
        max(CASE WHEN arm = 'control' THEN n_converted END) AS conv_c,
        max(CASE WHEN arm = 'treatment' THEN n_users END) AS n_t,
        max(CASE WHEN arm = 'treatment' THEN n_converted END) AS conv_t
    FROM arms
)
SELECT n_c AS n_control, conv_c AS conv_control,
       n_t AS n_treatment, conv_t AS conv_treatment,
       floor((CAST(conv_c AS DOUBLE) / n_c) * 1e6 + 0.5) / 1e6 AS p_control,
       floor((CAST(conv_t AS DOUBLE) / n_t) * 1e6 + 0.5) / 1e6 AS p_treatment,
       floor((CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c)
             * 1e6 + 0.5) / 1e6 AS lift_abs,
       floor(((CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c)
              / sqrt((CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
                     * (1e0 - CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
                     * (1e0 / n_c + 1e0 / n_t)))
             * 1e4 + 0.5) / 1e4 AS z_score
FROM wide
"""


@register(
    "events_ab_test_lift",
    oracle=_ab_sql(duck_hash28("CAST(user_id AS VARCHAR)")),
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assigned A/B split with conversion lift and pooled
    two-proportion z-score."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ab_sql(spark_hash28("CAST(user_id AS STRING)")))


# ---------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)
# ---------------------------------------------------------------------------
# The standard industry fix for underpowered experiments: adjust each
# user's post-period metric by their own pre-period behavior,
# Y' = Y − θ(X − E[X]) with θ = cov(X,Y)/var(X), shrinking metric
# variance by exactly corr(X,Y)² without biasing the treatment
# contrast. EVERY statistic here derives from exact integer moment
# sums (Σx, Σy, Σxy, Σx², Σy², per arm and pooled) — never from
# engine-internal covar_pop/var_pop, whose float accumulation order
# differs between engines — so θ, the variance-reduction factor, and
# both lift estimates are single deterministic float expressions over
# integers, snapped at output. One user_id aggregation over the
# corpus; everything after is a handful of scalar rows.


def _cuped_sql(hash28: str, us0: str, span: str) -> str:
    return f"""
WITH bounds AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM events),
per_user AS (
    SELECT user_id,
           sum(CASE WHEN 2 * ({us0}) < ({span})
                     AND event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
           sum(CASE WHEN 2 * ({us0}) >= ({span})
                     AND event_type = 'purchase' THEN 1 ELSE 0 END) AS y
    FROM events CROSS JOIN bounds b
    GROUP BY user_id
),
assigned AS (
    SELECT CASE WHEN {hash28} % 2 = 0 THEN 'control' ELSE 'treatment' END
               AS arm,
           x, y
    FROM per_user
),
mom AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * y) AS DOUBLE) AS sxy,
           CAST(sum(x * x) AS DOUBLE) AS sx2,
           CAST(sum(y * y) AS DOUBLE) AS sy2
    FROM assigned
),
arm_mom AS (
    SELECT arm, CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy
    FROM assigned GROUP BY arm
),
wide AS (
    SELECT
        max(CASE WHEN arm = 'control' THEN n END) AS n_c,
        max(CASE WHEN arm = 'control' THEN sx END) AS sx_c,
        max(CASE WHEN arm = 'control' THEN sy END) AS sy_c,
        max(CASE WHEN arm = 'treatment' THEN n END) AS n_t,
        max(CASE WHEN arm = 'treatment' THEN sx END) AS sx_t,
        max(CASE WHEN arm = 'treatment' THEN sy END) AS sy_t
    FROM arm_mom
),
theta AS (
    SELECT (m.n * m.sxy - m.sx * m.sy) / (m.n * m.sx2 - m.sx * m.sx) AS th,
           ((m.n * m.sxy - m.sx * m.sy) * (m.n * m.sxy - m.sx * m.sy))
           / ((m.n * m.sx2 - m.sx * m.sx) * (m.n * m.sy2 - m.sy * m.sy))
               AS corr2
    FROM mom m
)
SELECT CAST(w.n_c AS BIGINT) AS n_control,
       CAST(w.n_t AS BIGINT) AS n_treatment,
       floor((t.th) * 1e6 + 0.5) / 1e6 AS theta,
       floor((t.corr2) * 1e6 + 0.5) / 1e6 AS variance_reduction,
       floor((w.sy_t / w.n_t - w.sy_c / w.n_c) * 1e6 + 0.5) / 1e6
           AS raw_lift,
       floor(((w.sy_t / w.n_t - t.th * (w.sx_t / w.n_t))
              - (w.sy_c / w.n_c - t.th * (w.sx_c / w.n_c)))
             * 1e6 + 0.5) / 1e6 AS cuped_lift
FROM wide w CROSS JOIN theta t
"""


@register(
    "events_cuped_adjustment",
    oracle=_cuped_sql(
        duck_hash28("CAST(user_id AS VARCHAR)"),
        "date_diff('microsecond', b.t0, ts)",
        "date_diff('microsecond', b.t0, b.t1)",
    ),
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted lift: pre-period purchase counts as the covariate,
    variance reduction = corr², all from exact integer moment sums."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _cuped_sql(
            spark_hash28("CAST(user_id AS STRING)"),
            "timestampdiff(MICROSECOND, b.t0, ts)",
            "timestampdiff(MICROSECOND, b.t0, b.t1)",
        )
    )
