"""Slowly-changing-dimension (SCD2) operators — CDC without a lakehouse
format (no Delta/Iceberg in this environment): MERGE emulated with
anti-join + union + window, per the classic recipe.

Use case in the reference's domain: the patient/encounter dimension
changes over time (corrected ids, updated demographics); an auditable
research database keeps every version with validity intervals.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changes: DataFrame, key: str, ts_col: str, attrs: Sequence[str]
) -> DataFrame:
    """Rebuild full SCD2 history from a change log: one row per version
    with [valid_from, valid_to) and is_current. Pure window op — one
    shuffle on the key."""
    w = Window.partitionBy(key).orderBy(ts_col)
    return changes.select(
        key,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Apply an updates batch (key, attrs, ts) to an existing SCD2
    history: closed rows pass through untouched; each key's current row
    and its updates are re-windowed together (current rows close at the
    first update's timestamp; the last update becomes current).

    No MERGE INTO needed: closed = pass-through, open ∪ updates =
    changelog rebuild — two scans, one shuffle on the key."""
    closed = history.filter(~F.col("is_current"))
    open_rows = history.filter(F.col("is_current")).select(
        key, *attrs, F.col("valid_from").alias(ts_col)
    )
    merged_log = open_rows.unionByName(
        updates.select(key, *attrs, F.col(ts_col))
    )
    reopened = scd2_from_changelog(merged_log, key, ts_col, attrs)
    return closed.unionByName(reopened)
