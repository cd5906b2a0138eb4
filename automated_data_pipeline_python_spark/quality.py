"""Declarative data-quality expectations.

The reference lists "Data Quality" checks as a planned-but-unbuilt
feature (reference README.md:152); this module implements that surface
Spark-first:

- Row-level expectations (not-null, accepted values, ranges) compile to
  ONE conditional-aggregation pass over the table — a single scan and a
  one-row shuffle regardless of how many checks are attached.
- Set-level expectations (uniqueness) ride the same pass as
  ``count(*) - count(DISTINCT col)``.
- Referential expectations (FK → PK) are broadcast anti joins counting
  orphans.

Every report has the same two-column shape ``(check_name, violations)``
so reports from many tables union into one dataset — the pattern a
100 TB pipeline needs: quality metrics as data, written next to the
data they describe, not driver-side assertions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """Row-level check: ``violation`` is True on rows that FAIL."""

    name: str
    violation: Column


def not_null(name: str, col: str) -> Expectation:
    return Expectation(name, F.col(col).isNull())


def accepted_values(name: str, col: str, values: list) -> Expectation:
    return Expectation(name, ~F.col(col).isin(values))


def in_range(name: str, col: str, lo: float, hi: float) -> Expectation:
    return Expectation(name, (F.col(col) < lo) | (F.col(col) > hi))


@dataclass(frozen=True)
class AggExpectation:
    """Set-level check: ``violations`` is a full aggregate expression."""

    name: str
    violations: Column


def unique(name: str, col: str) -> AggExpectation:
    return AggExpectation(
        name, (F.count(F.col(col)) - F.count_distinct(F.col(col))).cast("long")
    )


def violation_report(
    df: DataFrame, checks: list[Expectation | AggExpectation]
) -> DataFrame:
    """All checks against one table in a single aggregation pass.

    Returns ``(check_name, violations)`` rows. Scale: one scan, map-side
    partial aggregation, a one-row-per-partition shuffle; the stack to
    long form happens on a single row.
    """
    aggs = []
    for c in checks:
        if isinstance(c, Expectation):
            aggs.append(
                F.sum(F.when(c.violation, 1).otherwise(0)).cast("long").alias(c.name)
            )
        else:
            aggs.append(c.violations.alias(c.name))
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, violations)"
    )


def referential_report(
    name: str, child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Count child rows whose FK has no matching parent PK (orphans).

    NULL FKs are not orphans (matches SQL ``NOT IN`` / the DuckDB
    oracle in queries/dq.py, which never counts NULL keys) — a bare
    left-anti join would count them.

    Scale: no broadcast hint — callers pass facts as parents too
    (lineitem→orders), and a forced broadcast of a fact OOMs at scale.
    AQE broadcasts dimension-sized parents on its own; fact-to-fact
    references shuffle on the key like any equi-join.
    """
    orphans = child.filter(F.col(fk).isNotNull()).join(
        parent.select(pk), child[fk] == parent[pk], "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(name).alias("check_name"), "violations"
    )
