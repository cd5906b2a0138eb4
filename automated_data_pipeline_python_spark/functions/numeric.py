"""Cross-engine-stable numeric helpers.

``round(double, d)`` is NOT portable: on the exact same double
(e.g. 102.16499999999999) DuckDB rounds to 102.17 while Spark rounds to
102.16 — their implementations disagree about values near a .xx5
boundary. ``floor(x * 10^d + 0.5) / 10^d`` is built from IEEE-exact
primitives that behave identically in both engines, so the engine's
query results stay hash-comparable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column | str, digits: int) -> Column:
    """Deterministic cross-engine rounding for DataFrame code."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.floor(c * scale + F.lit(0.5)) / F.lit(scale)


def sql_stable_round(expr: str, digits: int) -> str:
    """Same rounding as a SQL fragment — valid in Spark SQL *and* DuckDB."""
    # e-notation: both engines parse 1e6 as DOUBLE, while 1000000.0 is a
    # DECIMAL literal in DuckDB (decimal arithmetic would diverge from
    # Spark's IEEE doubles and return Decimal-typed columns).
    return f"floor(({expr}) * 1e{digits} + 0.5) / 1e{digits}"
