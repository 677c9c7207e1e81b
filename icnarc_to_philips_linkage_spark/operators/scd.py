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


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    op_col: str | None = None,
    broadcast_keys: bool = True,
) -> DataFrame:
    """Type-1 MERGE INTO emulation on plain parquet frames: source rows
    REPLACE matched target rows (update), unmatched source rows insert,
    and — when ``op_col`` is given — source rows carrying ``'D'``
    delete their match. The lakehouse-free sibling of ``scd2_merge``
    (which keeps history; this overwrites in place).

    Shape: ONE anti-join of the target against the source key set plus
    a union — the source is the CDC batch and is typically dimension-
    sized, so the anti-join broadcasts and the 100 TB target never
    shuffles; rewriting only touched partitions is the storage layer's
    job (partitioned overwrite), not this operator's.

    Precondition (documented, not silently fixed): the source carries
    at most ONE row per key — a CDC batch with multiple versions per
    key should be collapsed first (e.g. ``dedup.keep_latest``);
    duplicate keys here would insert duplicates, exactly as MERGE INTO
    raises on multiple matches.

    Output: the merged relation with the target's columns.
    """
    keys = list(keys)
    if op_col is not None:
        upserts = source.filter(
            (F.col(op_col).isNull()) | (F.col(op_col) != "D")
        ).drop(op_col)
        all_keys = source.select(*keys)
    else:
        upserts = source
        all_keys = source.select(*keys)
    if broadcast_keys:
        # the CDC batch is dimension-sized in the intended use; pass
        # broadcast_keys=False for backfill-sized batches and let
        # AQE pick the join strategy
        all_keys = F.broadcast(all_keys)
    untouched = target.join(all_keys, keys, "left_anti")
    return untouched.unionByName(upserts)
