"""Run metrics: the engine's answer to the reference's live counters.

The reference tracks responses/cache-hits/errors in a process-global
``collections.Counter`` with a 1 Hz console loop (reference
pipeline/utils/api.py:22,80-108). In Spark, metrics must travel with
the distributed plan, so we use ``df.observe`` — accumulated on
executors during the action, collected on the driver with zero extra
passes over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count observation to a DataFrame.

    Returns (df, observation); read ``observation.get`` after an action.
    """
    obs = Observation(name)
    first_col = df.columns[0]
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.when(F.col(first_col).isNull(), 1).otherwise(0)
            ).alias(f"null_{first_col}"),
        ),
        obs,
    )


def observe_counters(df: DataFrame, name: str, **exprs) -> tuple[DataFrame, Observation]:
    """Attach arbitrary named aggregate counters (kwargs of Columns)."""
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in exprs.items()]), obs
