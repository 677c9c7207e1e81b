"""Declarative data-quality expectations — a Deequ-style constraint
report computed in ONE pass over the table.

An expectation is (name, predicate Column): rows violating the
predicate count against it. ``check_report`` evaluates every
expectation as a conditional count inside a single aggregate — no per
constraint scan, no collect — and appends the row total, so the report
is one row regardless of table size and constraint count: the shape a
100 TB nightly quality gate needs. ``violating_rows`` pulls sample rows
for one failing expectation (bounded by limit) for triage.

Constraint helpers cover the reference pipeline's recurring checks
(SURVEY §2.4's completeness/uniqueness profiling recast as gates):
not-null, value range, regex form, set membership. Uniqueness needs a
groupBy (it is not a per-row predicate) and is provided separately as
``uniqueness_violations``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"{col}_not_null", F.col(col).isNotNull()


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    """NULLs pass (compose with not_null to also require presence)."""
    c = F.col(col)
    return f"{col}_in_range", c.isNull() | ((c >= lo) & (c <= hi))


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Full-string regex form check; NULLs pass."""
    c = F.col(col)
    return f"{col}_matches", c.isNull() | c.rlike(f"^(?:{pattern})$")


def isin(col: str, values: Sequence) -> tuple[str, Column]:
    c = F.col(col)
    return f"{col}_isin", c.isNull() | c.isin(list(values))


def check_report(
    df: DataFrame, expectations: Sequence[tuple[str, Column]]
) -> DataFrame:
    """One row: n_rows plus a violation count per expectation — a
    single aggregate, map-side partial, constant-size output."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in expectations:
        aggs.append(
            F.count(F.when(~pred, 1)).alias(f"viol_{name}")
        )
    return df.agg(*aggs)


def violating_rows(
    df: DataFrame, expectation: tuple[str, Column], limit: int = 100
) -> DataFrame:
    """Sample rows violating one expectation (triage; bounded)."""
    _, pred = expectation
    return df.filter(~pred).limit(limit)


def uniqueness_violations(
    df: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """(keys..., n) for key combinations appearing more than once — the
    uniqueness gate as a groupBy (uniqueness is a set property, not a
    per-row predicate). Empty result = constraint holds."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
