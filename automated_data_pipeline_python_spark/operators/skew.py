"""Skew-mitigation join: explicit key salting (SURVEY §4.3 hard parts).

AQE's skew-join handles most runtime skew (enabled in session.py), but
it only splits *sort-merge* join partitions. When a broadcast is
impossible (both sides large) and a handful of keys dominate, explicit
salting is the standard fix:

- fact side: add ``salt = pmod(hash(row-unique), n)``
- dim-ish side: replicate each row n times (one per salt value)
- join on (key, salt) — hot keys now spread over n partitions.

Cost: the replicated side grows ×n, so choose the *smaller* side to
replicate and keep n modest (2-3× the skew factor). This helper exists
for the planner-can't-save-you cases; prefer broadcast or AQE first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    num_salts: int = 8,
) -> DataFrame:
    """Equi-join on ``on`` with ``skewed``'s hot keys spread over
    ``num_salts`` partitions; ``other`` is replicated ×num_salts.

    Semantically identical to ``skewed.join(other, on, how)`` for
    inner/left joins (verified in tests); the salt column never escapes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = salted.join(replicated, on=[on, _SALT], how=how)
    return joined.drop(_SALT)
