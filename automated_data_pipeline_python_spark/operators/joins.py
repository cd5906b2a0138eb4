"""Join operators beyond Spark's built-in surface (SURVEY.md §2.3 J3).

Spark SQL has no native AS OF join; two implementations live here.

``asof_join_union_window`` (preferred, pure JVM): union both sides
with a side marker, one running window per ``by`` key ordered by
(time, marker), and ``last(right_struct, ignorenulls)`` carries the
most recent right row forward onto each left row. One shuffle + one
sort on the key, everything inside whole-stage codegen / WindowExec's
O(n) running frame — no Python anywhere. The right row travels as ONE
struct so its fields can never be mixed across rows (two independent
``last`` calls could pair a ts from one row with a value from another
when the value is genuinely null).

``asof_join`` (Arrow cogroup): the ``pandas.merge_asof`` formulation —
kept as the escape hatch for semantics the window can't express
(e.g. ``direction='nearest'``) and as the documented Pandas-boundary
example. Buckets instead of per-key groups: each cogroup group costs a
Python round trip, so millions of tiny per-key groups are pure
overhead (measured ~8s for 1,500 no-op groups on local[32]); with
``num_buckets ≈ 2×parallelism`` the per-call overhead amortizes over
thousands of rows, and executor memory is bounded by bucket size
(~N/num_buckets), not table size — the property that holds at 100 TB.
Skewed keys spread across buckets only if you salt the key upstream; a
single pathological key still lands in one bucket (same limit as any
hash-partitioned stateful op).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET = "__asof_bucket"


def asof_join_union_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: Sequence[str],
    left_prefix: str = "",
    right_prefix: str = "right_",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join, pure JVM (union + running window).

    ``direction='backward'`` matches the latest right row with
    ``right[on] <= left[on]`` per ``by`` key (DuckDB ``ASOF LEFT JOIN``
    semantics, ties inclusive); ``'forward'`` the earliest with
    ``right[on] >= left[on]``. Unmatched left rows survive with nulls.
    ``tolerance`` is a SQL interval body (e.g. ``'10 minutes'``)
    bounding ``|left[on] - right[on]|``.

    Among right rows tied on (by, on), the one greatest under the
    carried-struct field order wins — deterministic across runs and
    partitionings (pandas ``merge_asof`` keeps whichever sorted last;
    an engine must pick *stably*, so we define the pick).

    Scale: ONE shuffle + sort on ``by`` for both sides together;
    ``last(ignorenulls)`` over the running frame is O(n) streaming
    state in WindowExec — no pair materialization, no Python. Key skew
    lands on one task, as for any per-key window; salt upstream for a
    pathological key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    right_schema = {f.name: f.dataType for f in right.schema.fields}
    carry = list(dict.fromkeys([on, *right_cols]))  # on first, for tolerance
    rs_type = T.StructType(
        [T.StructField(c, right_schema[c], True) for c in carry]
    )
    left_fields = list(left.schema.fields)
    out_names = [left_prefix + f.name for f in left_fields] + [
        right_prefix + c for c in right_cols
    ]
    if len(set(out_names)) != len(out_names):
        raise ValueError(f"asof_join output columns collide: {out_names}")

    l_u = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rs_type).alias("__rs"),
        *[F.col(f.name).alias(f"__l_{f.name}") for f in left_fields],
    )
    r_u = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("__rs"),
        *[
            F.lit(None).cast(f.dataType).alias(f"__l_{f.name}")
            for f in left_fields
        ],
    )
    on_ord = F.col("__on").asc() if direction == "backward" else F.col("__on").desc()
    w = (
        Window.partitionBy("__by")
        # right rows (0) sort before left at equal __on → ties inclusive;
        # __rs asc makes the duplicate-right pick deterministic.
        .orderBy(on_ord, F.col("__is_left").asc(), F.col("__rs").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_u.unionByName(r_u)
        .withColumn("__m", F.last("__rs", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance is not None:
        gap_ok = (
            F.col("__m")[on] >= F.col("__on") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__m")[on] <= F.col("__on") + F.expr(f"INTERVAL {tolerance}")
        )
        matched = matched.withColumn(
            "__m", F.when(gap_ok, F.col("__m")).otherwise(F.lit(None).cast(rs_type))
        )
    return matched.select(
        *[
            F.col(f"__l_{f.name}").alias(left_prefix + f.name)
            for f in left_fields
        ],
        *[F.col("__m")[c].alias(right_prefix + c) for c in right_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: Sequence[str],
    left_prefix: str = "",
    right_prefix: str = "right_",
    direction: str = "backward",
    tolerance: pd.Timedelta | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the closest right row per key.

    ``direction='backward'`` matches the latest right row with
    ``right[on] <= left[on]`` (DuckDB ``ASOF LEFT JOIN`` semantics).
    Unmatched left rows survive with nulls (left-join semantics).

    WARNING: ``left`` and ``right`` must have independent lineages (e.g.
    two separate ``spark.read`` calls). When both derive from the same
    DataFrame, Spark's cogroup pairs the right side incorrectly (observed
    empirically: every right group arrives empty) — a silent-wrong-result
    footgun we cannot detect here cheaply.

    Args:
        on: ordering column (typically event time), present in both sides.
        by: equality key; matching happens per distinct ``by`` value.
        right_cols: right columns to carry (may include ``on``), emitted
            as ``right_prefix + name``; the prefix must make them
            distinct from every left column.
        num_buckets: shuffle width; defaults to 2× default parallelism.
    """
    if num_buckets is None:
        num_buckets = max(2 * left.sparkSession.sparkContext.defaultParallelism, 8)

    left_fields = list(left.schema.fields)
    right_schema = {f.name: f.dataType for f in right.schema.fields}
    out_fields = [
        T.StructField(left_prefix + f.name, f.dataType, True) for f in left_fields
    ] + [
        T.StructField(right_prefix + c, right_schema[c], True) for c in right_cols
    ]
    out_names = [f.name for f in out_fields]
    if len(set(out_names)) != len(out_names):
        raise ValueError(f"asof_join output columns collide: {out_names}")
    out_schema = T.StructType(out_fields)
    left_names = [f.name for f in left_fields]
    right_keep = [by] + [c for c in dict.fromkeys([on, *right_cols]) if c != by]
    r_on, r_by = right_prefix + on, right_prefix + by

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame({name: [] for name in out_names})
        lpdf = lpdf.sort_values(on, kind="mergesort")
        if rpdf.empty or not set(right_keep).issubset(rpdf.columns):
            # Buckets absent on the right can arrive as empty (even
            # column-less) frames; rebuild with merge_asof-compatible
            # dtypes (the on/by dtypes must match the left's).
            rpdf = pd.DataFrame(
                {
                    r_by: pd.Series(dtype=lpdf[by].dtype),
                    r_on: pd.Series(dtype=lpdf[on].dtype),
                    **{
                        right_prefix + c: pd.Series(
                            dtype=lpdf[c].dtype if c in lpdf.columns else "object"
                        )
                        for c in right_keep
                        if c not in (by, on)
                    },
                }
            )
        else:
            rpdf = rpdf[right_keep].rename(
                columns={c: right_prefix + c for c in right_keep}
            ).sort_values(r_on, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=on,
            right_on=r_on,
            left_by=by,
            right_by=r_by,
            direction=direction,
            tolerance=tolerance,
        )
        out = pd.DataFrame()
        for name in left_names:
            out[left_prefix + name] = merged[name]
        for c in right_cols:
            out[right_prefix + c] = merged[right_prefix + c]
        return out

    bucket = F.pmod(F.hash(F.col(by)), F.lit(num_buckets))
    lb = left.withColumn(_BUCKET, bucket)
    rb = right.withColumn(_BUCKET, bucket)
    return (
        lb.groupBy(_BUCKET)
        .cogroup(rb.groupBy(_BUCKET))
        .applyInPandas(merge, schema=out_schema)
    )
