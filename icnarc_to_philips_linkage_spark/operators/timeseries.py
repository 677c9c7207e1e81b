"""Time-series operators Spark lacks natively: as-of join and
regular-grid resampling with forward fill.

Both are implemented as *compositions of built-in operators* (SURVEY §7
custom-operator policy: composition > pandas UDF > mapPartitions), so
they stay in whole-stage codegen and scale as single-shuffle plans:

- **As-of join** (match each left row to the latest right row at-or-
  before it — lab result to nearest prior vital, trade to quote): the
  union-and-window trick. Tag both streams, union, sort within each key
  by (ts, side), and carry the last right-side value forward. ONE
  shuffle on the key — no range-join explosion, no per-row probing; at
  100 TB this is the plan you want (a naive theta-join l.ts >= r.ts is
  quadratic per key).
- **Resample + ffill** (hypertable-rollup-style): per-key time grid via
  ``sequence`` explode, bucket aggregation (deterministic last-by-time),
  and ``last(..., ignorenulls)`` forward fill over the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For every left row: the right row's ``value_col`` with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``key`` (NULL
    when no prior right row). Equal timestamps match (at-or-before).

    Implementation: union with a side tag; window ordered by
    (ts, side) where right sorts before left at ties; forward-carry the
    last non-null right value; keep left rows."""
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    ).withColumn("__rv", F.lit(None).cast(
        dict(right.dtypes)[value_col]
    ))
    r_tagged = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            F.col(value_col).alias("__rv"),
        )
        .withColumn("__side", F.lit(0))
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__ts", "__side", "__rv")
    )


def resample_ffill(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key regular time grid from floor(min ts) to floor(max ts),
    one row per step, carrying the last observed value forward (grid
    points before the first observation in a bucket stay NULL until the
    first bucket with data — standard ffill semantics).

    Scale: the grid explode is proportional to key-count × span/step
    (not to raw event count); both aggregations hash-shuffle on the key
    once each."""
    return _resample(events, key, ts_col, value_col, step, tiebreak, "ffill")


def ewma_smooth(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially-weighted moving average per key — the engine's
    grouped-map ``applyInPandas`` exemplar (SURVEY §2.10 UD2 policy:
    native first; this recursion s_t = α·x_t + (1−α)·s_{t−1} has no
    bounded-window native form, so it earns the Arrow escape hatch).

    Each group arrives as ONE pandas DataFrame (Arrow-batched); groups
    distribute across executors by the groupBy shuffle, so scale-out is
    by key cardinality. Output: (key, ts, value, ewma)."""
    import pandas as pd

    out_schema = ", ".join(
        [
            f"`{key}` long",
            f"`{ts_col}` timestamp",
            f"`{value_col}` double",
            "ewma double",
        ]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[[key, ts_col, value_col, "ewma"]]

    return events.select(key, ts_col, value_col).groupBy(key).applyInPandas(
        smooth, schema=out_schema
    )


def resample_interpolate(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key regular grid with LINEAR interpolation between the
    nearest observed buckets (vitals-style gap filling): grid points
    between two observations get the time-weighted blend; points before
    the first / after the last observation carry the edge value.

    Native composition — two IGNORE NULLS window passes (last-before
    looking back, first-after looking forward) plus arithmetic; no
    pandas, no per-group collect."""
    return _resample(events, key, ts_col, value_col, step, tiebreak, "interpolate")


def _resample(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str,
    tiebreak: str | None,
    mode: str,
) -> DataFrame:
    n, unit = step.split()
    if n != "1":
        raise ValueError(
            f"resample_ffill supports single-unit steps ('1 hour', "
            f"'1 day', ...), got {step!r}"
        )
    unit = unit.rstrip("s")
    bucket = F.date_trunc(unit, F.col(ts_col))
    order = F.struct(F.col(ts_col), F.col(tiebreak)) if tiebreak else F.col(ts_col)
    per_bucket = (
        events.withColumn("__bucket", bucket)
        .groupBy(key, "__bucket")
        .agg(F.max_by(value_col, order).alias("__obs"))
    )
    spans = events.groupBy(key).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__start"),
        F.date_trunc(unit, F.max(ts_col)).alias("__end"),
    )
    grid = spans.select(
        F.col(key),
        F.explode(
            F.sequence("__start", "__end", F.expr(f"INTERVAL {step}"))
        ).alias("grid_ts"),
    )
    joined = grid.join(
        per_bucket,
        on=[
            grid[key] == per_bucket[key],
            grid["grid_ts"] == per_bucket["__bucket"],
        ],
        how="left",
    ).select(grid[key], "grid_ts", "__obs")
    w_back = (
        Window.partitionBy(key)
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if mode == "ffill":
        return joined.withColumn(
            "value_ffill", F.last("__obs", ignorenulls=True).over(w_back)
        ).select(key, "grid_ts", "value_ffill")

    # forward fill expressed as a BACKWARD running frame over descending
    # order: Spark evaluates (currentRow, unboundedFollowing) frames by
    # re-scanning the tail for every row — O(n²) per partition (measured
    # 17× slower at sf0.1) — while running unboundedPreceding frames are
    # incremental O(n)
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.desc("grid_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_us = F.unix_micros(F.col("grid_ts"))
    obs_ts = F.when(F.col("__obs").isNotNull(), ts_us)
    prev_v = F.last("__obs", ignorenulls=True).over(w_back)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_back)
    next_v = F.last("__obs", ignorenulls=True).over(w_fwd)
    next_t = F.last(obs_ts, ignorenulls=True).over(w_fwd)
    frac = (ts_us - F.col("__pt")) / (F.col("__nt") - F.col("__pt"))
    # NOT rounded: the op sequence (sub, div, sub, mul, add) is fully
    # deterministic, so the raw doubles are bit-identical across engines
    # and partitionings — while ROUND itself is NOT portable (Spark
    # rounds the binary expansion, DuckDB the shortest decimal repr;
    # they disagree at half-point values, which 2-decimal inputs ×
    # dyadic time fractions hit systematically)
    interp = F.when(
        F.col("__pv").isNull(), F.col("__nv")  # before first obs
    ).when(
        F.col("__nv").isNull(), F.col("__pv")  # after last obs
    ).when(
        F.col("__nt") == F.col("__pt"), F.col("__pv")  # on an observation
    ).otherwise(
        F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac
    )
    return (
        joined.withColumn("__pv", prev_v)
        .withColumn("__pt", prev_t)
        .withColumn("__nv", next_v)
        .withColumn("__nt", next_t)
        .withColumn("value_interp", interp)
        .select(key, "grid_ts", "value_interp")
    )
