"""Incremental materialized-rollup maintenance: keep a per-key
aggregate table up to date as batches arrive, WITHOUT rescanning
history — the production shape of every "daily metrics" table at scale.

The state table stores MERGEABLE partial aggregates (count, sum, min,
max per measure), so folding a new batch is:

    state' = (state ∪ partial(batch)).groupBy(keys).merge

— one aggregation over |keys| + |batch-keys| rows; the historical raw
data is never touched again. avg (and anything else derivable from the
partials) is computed at READ time by ``rollup_values``. This is the
same partial/merge algebra Spark's own hash aggregation uses between
map and reduce sides, persisted across batches; lakehouse engines call
the pattern an incrementally-maintained materialized view.

Storage is a versioned parquet directory with a pointer file (the
cdc_apply pattern — no lakehouse format in this environment).
Exactly-once: each apply is keyed by ``batch_id`` against a durable
``_APPLIED`` log of EVERY batch id ever folded in (sums are not
idempotent, so unlike the SCD2 merge the guard is load-bearing). The
log — not just the current pointer — is what makes the guard hold for
out-of-order redeliveries and for a stream restarted with a fresh
checkpoint dir against an existing table (batch ids restart at 0; the
replay of already-applied ids is skipped). A retry after a FAILED
write is safe the other way round: the id only enters the log after
the pointer flip, so the retry overwrites its own version directory
and completes the flip. Corollary: one table_dir belongs to one
logical stream — feeding it genuinely new data under recycled batch
ids requires a new table_dir (or migrating the state forward).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_CURRENT"
_APPLIED = "_APPLIED"


def _applied_versions(table_dir: str) -> set[str]:
    """Every version ever successfully applied: the _APPLIED log plus
    the current pointer (tables written before the log existed have
    only the pointer — their history re-seeds the log lazily as new
    batches arrive)."""
    out: set[str] = set()
    log = os.path.join(table_dir, _APPLIED)
    if os.path.exists(log):
        with open(log) as f:
            out.update(line.strip() for line in f if line.strip())
    ptr = os.path.join(table_dir, _POINTER)
    if os.path.exists(ptr):
        with open(ptr) as f:
            out.add(f.read().strip())
    return out


def _record_applied(table_dir: str, versions: set[str]) -> None:
    tmp = os.path.join(table_dir, f"{_APPLIED}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(sorted(versions, key=lambda v: int(v[1:]))) + "\n")
    os.replace(tmp, os.path.join(table_dir, _APPLIED))


def partial_state(
    batch: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Per-key mergeable partials of one batch: __n plus
    __sum/__min/__max per measure (sum as decimal(38,6) — exact, so
    merge order across batches can never perturb it)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for m in measures:
        aggs += [
            F.sum(F.col(m).cast("decimal(38,6)")).alias(f"__sum_{m}"),
            # non-null count per measure: avg must divide by the values
            # the sum actually saw, not by row count — otherwise NULLs
            # bias avg low
            F.count(m).alias(f"__cnt_{m}"),
            F.min(m).alias(f"__min_{m}"),
            F.max(m).alias(f"__max_{m}"),
        ]
    return batch.groupBy(*keys).agg(*aggs)


def _merge(
    state: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    aggs = [F.sum("__n").alias("__n")]
    for m in measures:
        aggs += [
            F.sum(f"__sum_{m}").cast("decimal(38,6)").alias(f"__sum_{m}"),
            F.sum(f"__cnt_{m}").alias(f"__cnt_{m}"),
            F.min(f"__min_{m}").alias(f"__min_{m}"),
            F.max(f"__max_{m}").alias(f"__max_{m}"),
        ]
    return state.groupBy(*keys).agg(*aggs)


def read_rollup_state(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Current partial-state table, or None before the first batch."""
    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(table_dir, version))


def rollup_apply(
    batch: DataFrame,
    table_dir: str,
    keys: Sequence[str],
    measures: Sequence[str],
    batch_id: int,
) -> bool:
    """Fold one batch into the rollup state. Returns False (no-op) when
    ``batch_id`` was EVER applied — the _APPLIED log catches in-place
    retries, out-of-order redeliveries, and fresh-checkpoint replays
    alike, not just a retry of the currently-pointed batch."""
    spark = batch.sparkSession
    version = f"v{batch_id}"
    ptr = os.path.join(table_dir, _POINTER)
    applied = _applied_versions(table_dir)
    if version in applied:
        return False
    current = read_rollup_state(spark, table_dir)
    fresh = partial_state(batch, keys, measures)
    if current is not None:
        # schema migration: state written before the per-measure
        # non-null counts existed gets __cnt_<m> backfilled from __n —
        # exact when the old batches had no NULL measures, an upper
        # bound otherwise (avg over migrated history can read low until
        # the state is rebuilt; new batches are exact either way)
        for m in measures:
            if f"__cnt_{m}" not in current.columns:
                current = current.withColumn(f"__cnt_{m}", F.col("__n"))
        merged = _merge(current.unionByName(fresh), keys, measures)
    else:
        merged = fresh
    out = os.path.join(table_dir, version)
    merged.write.mode("overwrite").parquet(out)
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, ptr)
    # log AFTER the flip: a crash between write and flip leaves the id
    # un-logged so the retry re-runs; a crash between flip and log is
    # covered by _applied_versions folding the pointer in
    _record_applied(table_dir, applied | {version})
    return True


def rollup_values(
    state: DataFrame, measures: Sequence[str]
) -> DataFrame:
    """Finalize partials into user-facing aggregates: n plus
    sum/min/max/avg per measure (sum and avg back as doubles)."""
    cols = [F.col("__n").alias("n")]
    for m in measures:
        s = F.col(f"__sum_{m}")
        c = F.col(f"__cnt_{m}")
        cols += [
            s.cast("double").alias(f"sum_{m}"),
            F.col(f"__min_{m}").alias(f"min_{m}"),
            F.col(f"__max_{m}").alias(f"max_{m}"),
            F.when(c > 0, F.round((s / c).cast("double"), 6)).alias(
                f"avg_{m}"
            ),
        ]
    keys = [c for c in state.columns if not c.startswith("__")]
    return state.select(*keys, *cols)


def start_rollup_stream(
    source: DataFrame,
    table_dir: str,
    keys: Sequence[str],
    measures: Sequence[str],
    checkpoint_dir: str,
):
    """Streaming twin: foreachBatch folds each micro-batch through
    ``rollup_apply`` — the batch-id retry guard makes redeliveries
    exactly-once on the maintained table."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        rollup_apply(batch, table_dir, keys, measures, batch_id)

    return (
        source.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def prune_versions(table_dir: str, keep_last: int = 3) -> list[str]:
    """Vacuum old state versions: the pointer pattern leaves one
    directory per applied batch; retention caps storage at
    ``keep_last`` versions while NEVER touching the currently-pointed
    one (or newer — a concurrent apply may be about to flip to it).
    Returns the removed version names."""
    import re
    import shutil

    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        return []
    with open(ptr) as f:
        current = f.read().strip()
    cur_id = int(current[1:])
    versions = sorted(
        (
            d
            for d in os.listdir(table_dir)
            if re.fullmatch(r"v\d+", d) and int(d[1:]) < cur_id
        ),
        key=lambda d: int(d[1:]),
    )
    doomed = versions[: max(0, len(versions) - (keep_last - 1))]
    for d in doomed:
        shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)
    return doomed
