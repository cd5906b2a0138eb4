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


# ---------------------------------------------------------------------------
# Order-independent aggregation of fractional doubles
# ---------------------------------------------------------------------------
#
# ``sum(double)`` is order-dependent: Spark and DuckDB accumulate partial
# sums in different partition/thread orders, and when the true total sits
# within ~1e-9 of a rounding boundary the two engines round in opposite
# directions (the round-1 q7 failure: 2 of 899 groups off by one cent).
# Worse, a borderline sum feeding a comparison (HAVING, top-k ORDER BY,
# scalar-subquery threshold) can flip row membership, not just a digit.
#
# The fix: snap each ROW to an integer grid before summing. Integer sums
# are associative/commutative — any accumulation order yields the same
# total. The scaled values are summed as DECIMAL(38,0) (exact in Spark;
# DuckDB sums BIGINT/DECIMAL into HUGEINT/DECIMAL — exact far beyond any
# realistic 100 TB total, where a BIGINT sum could overflow), then
# converted back to double: one deterministic conversion of one exact
# integer, bit-identical on both engines.
#
# Grid choice = the decimal granularity of the data: money columns are
# 2dp (grid 1e2), price*(1-disc) is 4dp (1e4), price*(1-disc)*(1+tax) is
# 6dp (1e6). On-grid data makes the snapped sum EXACTLY the true sum;
# off-grid data is quantized identically on both sides, which keeps
# parity (the query simply *defines* its result on the grid).


def snap_scaled(col: Column | str, grid_digits: int) -> Column:
    """Row-level snap: ``col`` → exact integer (DECIMAL) on a 10^-g grid.

    decimal(18,0) rows keep Spark's compact long-backed Decimal
    representation (measured ~17% faster than decimal(38,0) on the Q1
    agg); the SUM buffer widens to decimal(28,0) — exact to 1e28, far
    beyond any 100 TB total on a 1e6 grid. Per-row magnitude is bounded
    at 1e18/grid, which any money/measure column satisfies.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**grid_digits)
    return F.floor(c * F.lit(scale) + F.lit(0.5)).cast("decimal(18,0)")


def exact_sum(col: Column | str, grid_digits: int) -> Column:
    """Order-independent SUM of a fractional double column (→ double)."""
    scale = float(10**grid_digits)
    return F.sum(snap_scaled(col, grid_digits)).cast("double") / F.lit(scale)


def exact_avg(col: Column | str, grid_digits: int) -> Column:
    """Order-independent AVG (exact snapped sum / non-null count)."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, grid_digits) / F.count(c)


def sql_snap_scaled(expr: str, grid_digits: int) -> str:
    """SQL form of :func:`snap_scaled` — valid in Spark SQL *and* DuckDB."""
    return f"CAST(floor(({expr}) * 1e{grid_digits} + 0.5) AS DECIMAL(38,0))"


def sql_exact_sum(expr: str, grid_digits: int) -> str:
    """SQL form of :func:`exact_sum` — valid in Spark SQL *and* DuckDB."""
    return (
        f"CAST(sum({sql_snap_scaled(expr, grid_digits)}) AS DOUBLE)"
        f" / 1e{grid_digits}"
    )


def sql_exact_avg(expr: str, grid_digits: int) -> str:
    """SQL form of :func:`exact_avg` — valid in Spark SQL *and* DuckDB."""
    return f"{sql_exact_sum(expr, grid_digits)} / count({expr})"


def sql_normal_two_sided_p(absz: str) -> str:
    """Two-sided normal p-value ``2·(1 − Φ(|z|))`` as portable SQL.

    Neither Spark SQL nor DuckDB ships ``erf``, so this is the
    Abramowitz–Stegun 26.2.17 polynomial (|err| < 7.5e-8) written as one
    arithmetic expression over ``exp``/``*``/``+`` — both engines
    evaluate the identical text, and callers snap the result to the
    1e-6 grid, so the sub-grid approximation error and any libm ulp
    drift both vanish. ``absz`` must be a non-negative expression
    (pass ``abs(z)``), itself already snapped per the float-boundary
    discipline.
    """
    k = f"(1e0 / (1e0 + 0.2316419e0 * ({absz})))"
    poly = (
        f"{k} * (0.31938153e0 + {k} * (-0.356563782e0 + {k} * "
        f"(1.781477937e0 + {k} * (-1.821255978e0 + {k} * 1.330274429e0))))"
    )
    return (
        f"(2e0 * 0.3989422804014327e0 * exp(-(({absz}) * ({absz})) / 2e0)"
        f" * {poly})"
    )
