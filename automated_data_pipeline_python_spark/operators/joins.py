"""Join operators beyond Spark's built-in surface (SURVEY.md §2.3 J3).

As-of join: Spark SQL has no native AS OF join, so we implement the
standard distributed recipe — shuffle both sides once on the ``by`` key,
then a per-group Arrow-batched ``pandas.merge_asof`` via cogrouped
``applyInPandas``. At scale this is one shuffle per side plus an in-memory
sort per group; group size (not table size) bounds executor memory, so it
holds at 100 TB as long as a single key's history fits an executor (salt
the key by time-range if not).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


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
) -> DataFrame:
    """Left as-of join: for each left row, the closest right row per key.

    ``direction='backward'`` matches the latest right row with
    ``right[on] <= left[on]`` (DuckDB ``ASOF LEFT JOIN`` semantics).
    Unmatched left rows survive with nulls (left-join semantics).

    WARNING: ``left`` and ``right`` must have independent lineages (e.g.
    two separate ``spark.read`` calls). When both derive from the same
    DataFrame, Spark's cogroup pairs the right side incorrectly (observed
    empirically: every right group arrives empty) — a silent-wrong-result
    footgun, so we cannot detect it here cheaply.

    Args:
        on: ordering column (typically event time), present in both sides.
        by: equality key both sides are shuffled on.
        right_cols: right columns to carry (may include ``on``), emitted
            as ``right_prefix + name``; the prefix must make them
            distinct from every left column.
    """
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
    r_on = right_prefix + on

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame({name: [] for name in out_names})
        lpdf = lpdf.sort_values(on, kind="mergesort")
        if rpdf.empty or not set(right_keep).issubset(rpdf.columns):
            # Keys absent on the right arrive as empty (even column-less)
            # frames; rebuild with merge_asof-compatible dtypes.
            rpdf = pd.DataFrame(
                {
                    by: pd.Series(dtype=lpdf[by].dtype),
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
                columns={c: right_prefix + c for c in right_keep if c != by}
            ).sort_values(r_on, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=on,
            right_on=r_on,
            by=by,
            direction=direction,
            tolerance=tolerance,
        )
        out = pd.DataFrame()
        for name in left_names:
            out[left_prefix + name] = merged[name]
        for c in right_cols:
            out[right_prefix + c] = merged[by if c == by else right_prefix + c]
        return out

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )
