"""Streaming CDC apply: maintain an SCD2 dimension table from a change
stream — the lakehouse upsert pattern without a lakehouse format.

``foreachBatch`` is the bridge: inside the callback each micro-batch is
a plain DataFrame, so the BATCH ``scd2_merge`` (anti-join + union +
window) applies verbatim — one merge implementation serving batch
backfills and the live stream, the same batch/stream unification policy
as the windowed aggregates. The maintained table lives as parquet,
rewritten atomically per micro-batch into a versioned directory with a
pointer file (no Delta/Iceberg in this environment; at production scale
the same callback body targets MERGE INTO on a lakehouse table).

Exactly-once: foreachBatch may retry a batch after failure. The write
is idempotent-by-construction — the output path is keyed by batch id,
and the pointer flips only after a successful write, so a retried batch
overwrites its own directory and re-flips the pointer to the identical
state.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from icnarc_to_philips_linkage_spark.operators.scd import (
    scd2_from_changelog,
    scd2_merge,
)

_POINTER = "_CURRENT"


def read_scd2_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Current SCD2 state, or None before the first batch."""
    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(table_dir, version))


def apply_cdc_stream(
    changes: DataFrame,
    table_dir: str,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
    checkpoint_dir: str,
):
    """Start a stream that folds each change micro-batch into the SCD2
    table at ``table_dir``. Returns the StreamingQuery."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current = read_scd2_table(spark, table_dir)
        if current is None:
            merged = scd2_from_changelog(batch, key, ts_col, attrs)
        else:
            merged = scd2_merge(current, batch, key, ts_col, attrs)
        version = f"v{batch_id}"
        out = os.path.join(table_dir, version)
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(table_dir, _POINTER))

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
