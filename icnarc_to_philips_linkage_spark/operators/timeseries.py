"""Time-series operators Spark lacks natively: as-of join,
point-in-interval (range) join, and regular-grid resampling with
forward fill.

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
- **Resample + ffill / interpolate** (hypertable-rollup-style): bucket
  aggregation (deterministic last-by-time), then one ``lead()`` pass
  gives each observed bucket its successor, and exploding
  ``sequence(bucket, next_bucket - step)`` emits that bucket's grid
  segment with the fill/interpolation neighbors already on the row —
  no grid-to-observation join, no second pass over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators.scale import (
    bounded_global_partition,
    bounded_global_window,
)

from ..functions.expressions import ts_micros

_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _bucket_us(bucket: str) -> int:
    try:
        n, unit = bucket.split()
        return int(n) * _UNIT_US[unit.rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"bucket must look like '<n> {'|'.join(_UNIT_US)}[s]', "
            f"got {bucket!r}"
        ) from None


def derive_bucket_us(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    max_fanout: int = 64,
) -> int:
    """Data-aware bucket width for ``interval_join``: one aggregate over
    the interval table returns median and max span, and the bucket is

        ``max(median_span, max_span / max_fanout)``

    which provably bounds the per-interval explode rows at
    ``max_fanout + 1`` (rows = floor((e-1)/b) - floor(s/b) + 1
    <= span/b + 1 <= max_fanout + 1) while keeping the typical interval
    at ~1-2 buckets (median-span sizing). The single collected row is a
    2-value aggregate — broadcast-sized by construction.

    The trade-off is explicit: a pathological giant interval no longer
    explodes proportionally to its span; instead buckets get coarser, so
    each *point* meets a few more candidate intervals in its bucket and
    the exact containment filter discards them — bounded blow-up on the
    build side instead of unbounded blow-up on the probe side.
    """
    if max_fanout < 1:
        raise ValueError(f"max_fanout must be >= 1, got {max_fanout}")
    span = ts_micros(end_col) - ts_micros(start_col)
    row = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .agg(
            F.percentile_approx(span, F.lit(0.5)).alias("med"),
            F.max(span).alias("mx"),
        )
        .collect()[0]
    )
    if row.med is None:  # no valid intervals
        return _UNIT_US["day"]
    return int(max(row.med, row.mx / max_fanout, 1))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    bucket: str | int = "1 day",
    bucket_max_fanout: int = 64,
) -> DataFrame:
    """Point-in-interval (range) join: every (point, interval) pair with
    ``start <= point_ts < end`` (half-open), optionally also matching on
    an equality ``key`` — chartevents-within-stay time-window linkage,
    the range-predicate sibling of the reference's key-based cohort join
    (SURVEY §2.3 J4; `dataset_curation.ipynb` cell 49 restricts by
    encounterId — this is the [inTime, outTime) containment variant).

    Scale design: a raw theta-join ``s <= t < e`` plans as a broadcast
    nested loop (quadratic probe; dies at 100 TB). Instead both sides are
    mapped to coarse integer time buckets — each point to ONE bucket,
    each interval EXPLODED to the buckets it covers (fan-out bounded by
    interval span / bucket width; pick ``bucket`` near the typical span)
    — turning it into an *equi*-join on (bucket [, key]) that
    shuffle-partitions/broadcasts like any other, followed by the exact
    containment filter. Since a point owns exactly one bucket and an
    interval covers it at most once, no dedup pass is needed.

    Invalid (end <= start) and NULL-bounded intervals match nothing and
    are dropped up front. Column names must be disjoint apart from
    ``key``. Returns point ⨝ interval columns for matched pairs (inner);
    re-attach empty intervals with a left join on the interval key.

    ``bucket`` accepts '<n> <unit>', a raw microsecond int, or
    ``"auto"`` — the data-aware width from ``derive_bucket_us`` (median
    interval span, clamped so no interval explodes to more than
    ``bucket_max_fanout + 1`` bucket rows; ``bucket_max_fanout`` is
    ignored for non-auto buckets). NOTE: ``"auto"`` runs a driver-side
    2-value aggregate (``derive_bucket_us``'s ``collect``) EAGERLY at
    plan-construction time — the call triggers a Spark job before any
    action on the returned DataFrame, so keep it out of per-row loops
    and analysis-only contexts.
    """
    if bucket == "auto":
        us = derive_bucket_us(
            intervals, start_col, end_col, max_fanout=bucket_max_fanout
        )
    elif isinstance(bucket, int):
        if bucket < 1:
            raise ValueError(f"bucket micros must be >= 1, got {bucket}")
        us = bucket
    else:
        us = _bucket_us(bucket)
    # end is exclusive: a degenerate [s, s) interval covers nothing
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(ts_micros(start_col) / F.lit(us)),
                F.floor((ts_micros(end_col) - F.lit(1)) / F.lit(us)),
            )
        ),
    )
    pt = points.withColumn(
        "__b", F.floor(ts_micros(point_ts) / F.lit(us))
    )
    on = ["__b"] + ([key] if key else [])
    return (
        iv.join(pt, on=on, how="inner")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__b")
    )


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
    # Segment formulation: each observed bucket owns the grid points
    # from itself up to (excluding) the NEXT observed bucket, known via
    # one lead() pass; the final bucket owns just itself. Because the
    # grid spans exactly [first observed bucket, last observed bucket],
    # this explode emits the identical grid to a spans×sequence cross
    # — but with the carried/neighboring observations already on the
    # row. Plan: ONE scan of events, one (key,bucket) hash aggregate,
    # one window sort on key — no second events aggregate for spans, no
    # grid-to-buckets join, no descending re-sort. 5 shuffles → 2.
    w = Window.partitionBy(key).orderBy("__bucket")
    step_expr = F.expr(f"INTERVAL {step}")
    seg = per_bucket.select(
        key,
        "__bucket",
        "__obs",
        F.lead("__bucket").over(w).alias("__nb"),
        F.lead("__obs").over(w).alias("__nv"),
    )
    exploded = seg.select(
        key,
        "__bucket",
        "__obs",
        "__nb",
        "__nv",
        F.explode(
            F.sequence(
                F.col("__bucket"),
                F.coalesce(F.col("__nb") - step_expr, F.col("__bucket")),
                step_expr,
            )
        ).alias("grid_ts"),
    )
    if mode == "ffill":
        # the owning bucket's observation IS the forward-filled value
        return exploded.select(
            key, "grid_ts", F.col("__obs").alias("value_ffill")
        )

    ts_us = ts_micros("grid_ts")
    pt = ts_micros("__bucket")
    nt = ts_micros("__nb")
    frac = (ts_us - pt) / (nt - pt)
    # NOT rounded: the op sequence (sub, div, sub, mul, add) is fully
    # deterministic, so the raw doubles are bit-identical across engines
    # and partitionings — while ROUND itself is NOT portable (Spark
    # rounds the binary expansion, DuckDB the shortest decimal repr;
    # they disagree at half-point values, which 2-decimal inputs ×
    # dyadic time fractions hit systematically). On-observation points
    # return __obs directly (not obs + 0·Δ) so a -0.0 observation
    # survives bit-exactly.
    interp = (
        F.when(F.col("__nv").isNull(), F.col("__obs"))  # tail bucket
        .when(ts_us == pt, F.col("__obs"))  # on an observation
        .otherwise(
            F.col("__obs") + (F.col("__nv") - F.col("__obs")) * frac
        )
    )
    return exploded.select(key, "grid_ts", interp.alias("value_interp"))


def rolling_zscore_anomalies(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    z_threshold: float = 2.0,
    min_points: int = 5,
) -> DataFrame:
    """Rolling-window z-score anomaly detection: each observation is
    scored against the trailing ``window_seconds`` of ITS OWN key's
    values (inclusive of itself) and flagged when |z| exceeds the
    threshold with at least ``min_points`` in the window — the standard
    self-calibrating spike detector for telemetry/vitals streams.

    One exchange on the key; the trailing statistics are a time-RANGE
    window frame (no self-join, no per-key collect). The z-score is
    rounded to 6dp BEFORE thresholding so a differential oracle
    compares post-round values (ulp-level engine differences in the
    rolling mean/std cannot flip the flag unless the rounded value sits
    exactly on the threshold).

    Returns flagged rows only: (key, event_id?, ts, value, n_window,
    z) — all original columns pass through.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(ts_micros(ts_col))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    v = F.col(value_col)
    out = (
        events.withColumn("__avg", F.avg(v).over(w))
        .withColumn("__std", F.stddev_samp(v).over(w))
        .withColumn("n_window", F.count(v).over(w))
        .withColumn(
            "z",
            F.round((v - F.col("__avg")) / F.col("__std"), 6),
        )
    )
    return out.filter(
        (F.col("n_window") >= min_points)
        & F.col("__std").isNotNull()
        & (F.col("__std") > 1e-12)
        & (F.abs(F.col("z")) > F.lit(z_threshold))
    ).drop("__avg", "__std")


def ewma_window(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    window: int = 20,
    tiebreak: str | None = None,
) -> DataFrame:
    """Truncated exponentially-weighted moving average as a PURE window
    expression — the oracle-checkable sibling of ``ewma_smooth``.

    The exact EWMA recursion (s_t = α·x_t + (1−α)·s_{t−1}) needs
    unbounded history, which forces the Arrow escape hatch
    (``ewma_smooth``). Truncating the weight tail at ``window`` terms —
    standard practice, the dropped tail mass is (1−α)^window ≈ 0.08%
    for the defaults — turns it into a fixed linear combination of the
    last W observations:

        ewma_t = Σ_{j<W} (1−α)^j · x_{t−j}  /  Σ_{j<W, x exists} (1−α)^j

    expressed as W ``lag`` terms over ONE window spec, so Catalyst
    plans a single sort-based window pass (one shuffle on the key, no
    Python). NULL values drop out of numerator AND denominator (pandas
    ``ewm(ignore_na=False)``-adjacent but re-normalized, deterministic
    both sides).

    Ordering is pinned by (ts, tiebreak) so ties can't reorder weights.
    Output: (key, tiebreak?, ts, value, ewma) — ewma NULL when no
    non-NULL observation is in reach.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    x = F.col(value_col).cast("double")
    cols = [key] + ([tiebreak] if tiebreak else []) + [ts_col, value_col]
    # two-step on purpose: WindowExec is NOT whole-stage-codegen'd, so
    # every expression left inside it is interpreted per row. Step 1
    # materializes each lag exactly ONCE (W−1 window functions — not
    # 2(W−1), which is what inlining each lag into both the numerator
    # and denominator terms costs); step 2 is a plain projection that
    # DOES codegen. Measured 230s → (see SCALE.md) on the 100M smoke.
    lagged = events.select(
        *cols,
        x.alias("__l0"),
        *[F.lag(x, j).over(w).alias(f"__l{j}") for j in range(1, window)],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(window):
        lj = F.col(f"__l{j}")
        wt = (1.0 - alpha) ** j
        num = num + F.when(lj.isNotNull(), F.lit(wt) * lj).otherwise(F.lit(0.0))
        den = den + F.when(lj.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return lagged.select(
        *cols,
        F.when(den > 0, F.round(num / den, 6)).alias("ewma"),
    )


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    direction: str = "backward",
    out_col: str = "asof_value",
) -> DataFrame:
    """``asof_join`` with the pandas ``merge_asof`` direction surface:
    'backward' (latest right at-or-before — delegates to asof_join),
    'forward' (earliest right at-or-after), 'nearest' (whichever side
    is closer in time; backward wins exact ties, matching pandas).

    Same union+window shape — ONE shuffle on the key; forward is the
    mirrored window (following frame, ``first`` ignorenulls, right
    sorted AFTER left at equal timestamps so at-or-after includes
    ties); nearest evaluates both carries and picks by absolute time
    distance. The carried struct is (ts, value) so the distance math
    needs no join-back."""
    if direction == "backward":
        return asof_join(
            left, right, key, left_ts, right_ts, value_col, out_col
        )
    if direction not in ("forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    vtype = dict(right.dtypes)[value_col]
    # the null-struct literal mirrors the RIGHT frame's actual ts type:
    # parquet timestamp[us] loads as TIMESTAMP_NTZ, and a hardcoded
    # `timestamp` would make the union's struct types incompatible
    tstype = dict(right.dtypes)[right_ts]
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn(
            "__r",
            F.lit(None).cast(f"struct<ts:{tstype},v:{vtype}>"),
        )
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("ts"), F.col(value_col).alias("v")
        ).alias("__r"),
    ).withColumn("__side", F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # backward carry: right sorts BEFORE left at ties (side 0 < 1)
    wb = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward carry: right sorts AFTER left at ties via NEGATED side,
    # then first following non-null — at-or-after includes equal ts
    wf = (
        Window.partitionBy(key)
        .orderBy("__ts", (-F.col("__side")).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = F.last("__r", ignorenulls=True).over(wb)
    fwd = F.first("__r", ignorenulls=True).over(wf)
    if direction == "forward":
        picked = fwd
    else:
        db = F.abs(ts_micros(F.col("__ts")) - ts_micros(back["ts"]))
        df_ = F.abs(ts_micros(fwd["ts"]) - ts_micros(F.col("__ts")))
        picked = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(db <= df_, back)  # backward wins exact ties
            .otherwise(fwd)
        )
    # NULL left timestamps sort nulls-first, where the forward frame
    # would hand them the partition's earliest right row — match the
    # backward direction's NULL-in → NULL-out contract instead
    return (
        u.withColumn(
            out_col,
            F.when(F.col("__ts").isNotNull(), picked["v"]),
        )
        .filter(F.col("__side") == 1)
        .drop("__ts", "__side", "__r")
    )


def ohlc_bars(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    bucket: str = "1 hour",
) -> DataFrame:
    """Open/high/low/close downsampling — the financial-bars form of
    resampling: per (key, time bucket), the first/last value by event
    time plus min/max/count. ONE aggregation with min_by/max_by over a
    zero-padded (time, tiebreak) composite — no window sort, no
    first()/last() order dependence; at 100 TB this is a single
    map-combined shuffle on (key, bucket).

    The composite order key is ``lpad(epoch_us)||':'||lpad(tiebreak)``
    so lexicographic comparison equals (time, id) ordering in any
    engine — min_by needs one orderable argument that DuckDB's
    arg_min mirrors exactly. Precondition: epoch and tiebreak must be
    NONNEGATIVE (a '-' sign breaks zero-padded lexicographic order);
    post-1970 timestamps and surrogate ids satisfy this."""
    ok = F.concat(
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lit(":"),
        F.lpad(F.col(tiebreak).cast("string"), 20, "0"),
    )
    w = F.window(ts_col, bucket)
    return (
        df.select(
            F.col(key),
            w["start"].alias("bucket_start"),
            F.col(value_col).alias("__v"),
            ok.alias("__ok"),
        )
        .groupBy(key, "bucket_start")
        .agg(
            F.min_by("__v", "__ok").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", "__ok").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def cusum_alarms(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    drift_k: float = 0.5,
    threshold_h: float = 5.0,
    calibration_frac: float = 0.25,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per key — the standard
    mean-shift alarm (complements the distributional drift reports:
    PSI/KS/Wasserstein compare snapshots; CUSUM watches a SEQUENCE).
    Values standardize against an IN-CONTROL estimate — mean/std of
    the first ``calibration_frac`` of each key's sequence — not the
    whole series (a late shift would drag a global mean toward itself
    and fire backwards alarms on the healthy prefix). Then
    S⁺_t = max(0, S⁺_{t−1} + z_t − k) and the mirrored S⁻ accumulate;
    an alarm fires when either exceeds h, and the statistic resets.

    The recursion has a max() in it, so — like the EWMA smoother — it
    has no bounded-window native form and earns the grouped-map
    ``applyInPandas`` escape hatch (SURVEY §2.10 UD2 policy). One
    shuffle on key; per-key state is two floats. Output: (key, ts,
    value, z, cusum_pos, cusum_neg, alarm).

    Oracle parity: rows order by (ts, value) — a deterministic
    tiebreak under duplicate timestamps — and z quantizes to 6dp
    (half away from zero) BEFORE the fold, so the recursion runs on
    engine-identical doubles and the whole alarm trajectory is
    hash-matchable against the DuckDB list_reduce replay
    (plans/relational.py ``_cusum_sql``)."""
    import numpy as np
    import pandas as pd

    out_schema = ", ".join(
        [
            f"`{key}` long",
            f"`{ts_col}` timestamp",
            f"`{value_col}` double",
            "z double",
            "cusum_pos double",
            "cusum_neg double",
            "alarm boolean",
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col]).reset_index(drop=True)
        n_cal = max(2, int(len(pdf) * calibration_frac))
        cal = pdf[value_col].iloc[:n_cal]
        mu = cal.mean()
        sd = cal.std(ddof=0)
        if sd and sd > 0:
            z = (pdf[value_col] - mu) / sd
            # 6dp half-away-from-zero quantization (matches DuckDB
            # ROUND semantics) — the fold below then runs on values
            # both engines agree on bit-for-bit
            z = np.trunc(z * 1e6 + np.copysign(0.5, z)) / 1e6
        else:
            z = pd.Series(0.0, index=pdf.index)
        sp = sn = 0.0
        pos, neg, alarms = [], [], []
        for zt in z:
            sp = max(0.0, sp + zt - drift_k)
            sn = max(0.0, sn - zt - drift_k)
            fired = sp > threshold_h or sn > threshold_h
            pos.append(sp)
            neg.append(sn)
            alarms.append(bool(fired))
            if fired:
                sp = sn = 0.0
        out = pdf[[key, ts_col, value_col]].copy()
        out["z"] = z
        out["cusum_pos"] = pos
        out["cusum_neg"] = neg
        out["alarm"] = alarms
        return out

    return events.select(key, ts_col, value_col).groupBy(key).applyInPandas(
        fold, out_schema
    )


def holt_linear(
    df,
    key_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    forecast_steps: int = 3,
):
    """Holt's linear-trend (double exponential) smoothing per key —
    the level+trend forecaster one notch above EWMA, the standard
    short-horizon capacity/throughput projection:

        l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}

    initialized l₁ = y₁, b₁ = y₂ − y₁. The recursion is a NATIVE
    ``aggregate()`` struct fold over each key's time-ordered value
    array — no UDF, no per-key window scan per step. Both state
    components QUANTIZE to the 1e-6 grid after every step (the CUSUM
    recipe), so the data-dependent recursion is bit-identical in any
    engine and the DuckDB oracle can replay it with ``list_reduce``.

    Scale shape: one groupBy collects each key's series (bounded by
    the key's own observation count — hourly rollups per type/tenant,
    not raw events; pre-aggregate first, as the registered query
    does), then the fold is a map-side expression. Keys with fewer
    than 2 observations return NULL level/trend/forecast.

    Output per key: ``(key, n_obs, level, trend, forecast)`` with
    ``forecast = level + forecast_steps·trend`` rounded to 6dp.
    """
    from pyspark.sql import functions as F

    a_n, a_d = _exact_decimal(alpha)
    b_n, b_d = _exact_decimal(beta)

    def q6(c):
        # 1e-6 quantization in PURE binary double arithmetic —
        # sign·floor(|x|·1e6 + 0.5)/1e6 — identical in every engine.
        # ROUND(x, 6) is NOT: Spark rounds the decimal repr HALF_UP,
        # DuckDB rounds the binary double, and a recursion hits the
        # half boundary eventually (measured at sf0.01).
        return (
            F.signum(c)
            * F.floor(F.abs(c) * F.lit(1e6) + F.lit(0.5))
            / F.lit(1e6)
        )

    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(time_col).alias("t"),
                F.col(value_col).cast("double").alias("y"),
            )
        )
    )
    grouped = (
        df.filter(
            F.col(time_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(key_col))
        .agg(arr.alias("__arr"))
        .select(
            key_col,
            F.expr("transform(__arr, x -> x.y)").alias("__ys"),
        )
    )
    ys = F.col("__ys")
    n = F.size(ys)
    init = F.struct(
        q6(ys[0]).alias("l"),
        q6(ys[1] - ys[0]).alias("b"),
    )

    def step(acc, y):
        new_l = q6(
            F.lit(a_n / a_d) * y
            + F.lit((a_d - a_n) / a_d) * (acc["l"] + acc["b"])
        )
        new_b = q6(
            F.lit(b_n / b_d) * (new_l - acc["l"])
            + F.lit((b_d - b_n) / b_d) * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    # the recursion consumes y_2..y_n: init carries (l1=y1, b1=y2-y1)
    # and t=2 must still UPDATE the level with y2 (starting at y3
    # silently skips the second observation - caught in review, the
    # mirrored oracle replay could not see it)
    folded = F.aggregate(
        F.slice(ys, 2, F.greatest(n - 1, F.lit(0))), init, step
    )
    return grouped.select(
        key_col,
        n.alias("n_obs"),
        F.when(n >= 2, folded["l"]).alias("level"),
        F.when(n >= 2, folded["b"]).alias("trend"),
        F.when(
            n >= 2,
            q6(folded["l"] + F.lit(float(forecast_steps)) * folded["b"]),
        ).alias("forecast"),
    )


def _exact_decimal(x: float) -> tuple[int, int]:
    from fractions import Fraction

    frac = Fraction(str(x))
    if frac.denominator > 1_000_000:
        raise ValueError(f"{x} must be an exact short decimal")
    return frac.numerator, frac.denominator


def forecast_eval(
    df,
    key_col: str,
    time_col: str,
    value_col: str,
    season: int = 7,
    densify: str | None = None,
    fill_value: int = 0,
):
    """Backtest accuracy of the two standard reference forecasters —
    naive (ŷ_t = y_{t−1}) and seasonal-naive (ŷ_t = y_{t−season}) —
    per key, with ENGINE-EXACT metrics: the series values are integer
    counts (callers pre-aggregate to a grid; the registered query uses
    daily counts), so Σ|error| and Σ|y| accumulate as exact longs and
    only the final MAE / WAPE / MASE divisions are doubles with one
    shared expression tree.

    MASE here is the seasonal-naive MAE over the naive MAE — the
    standard 'is seasonality worth modeling' screen (<1 ⇒ the seasonal
    forecaster beats persistence).

    The lags are ROW lags, so the grid must be gap-free for the
    seasonal comparison to align on calendar periods. Pass
    ``densify`` (an interval string, e.g. ``"1 day"``) to have the
    operator build the gap-free grid itself: per key, a
    ``sequence(min(t), max(t), interval)`` grid left-joins the input
    and missing periods take ``fill_value`` (0 — the right identity
    for a count series). With ``densify=None`` the CALLER owns the
    gap-free-grid contract and sparse series silently misalign the
    season lag.

    Scale shape: both lags ride ONE per-key window spec (one
    sort+exchange over the already-aggregated grid table, never raw
    events); densification adds one key-grain span aggregation and
    one key+time equi-join, both on the grid table, never raw
    events; the metric aggregation is map-combined. Output per key:
    ``(key, n_naive, n_seasonal, mae_naive, wape_naive, mae_seasonal,
    mase)`` with NULLs where a denominator is empty/zero.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if densify is not None:
        span = df.groupBy(key_col).agg(
            F.min(time_col).alias("__t0"), F.max(time_col).alias("__t1")
        )
        grid = span.select(
            key_col,
            F.explode(
                F.sequence("__t0", "__t1", F.expr(f"interval {densify}"))
            ).alias(time_col),
        )
        df = grid.join(
            df.select(key_col, time_col, value_col),
            [key_col, time_col],
            "left",
        ).withColumn(
            value_col, F.coalesce(F.col(value_col), F.lit(fill_value))
        )

    w = Window.partitionBy(key_col).orderBy(time_col)
    lagged = df.select(
        key_col,
        F.col(value_col).cast("long").alias("__y"),
        F.lag(F.col(value_col).cast("long"), 1).over(w).alias("__f1"),
        F.lag(F.col(value_col).cast("long"), season).over(w).alias("__fs"),
    )
    agg = lagged.groupBy(key_col).agg(
        F.count("__f1").alias("n_naive"),
        F.count("__fs").alias("n_seasonal"),
        F.sum(F.abs(F.col("__y") - F.col("__f1"))).alias("__e1"),
        F.sum(F.when(F.col("__f1").isNotNull(), F.abs("__y"))).alias("__a1"),
        F.sum(F.abs(F.col("__y") - F.col("__fs"))).alias("__es"),
    )
    n1 = F.col("n_naive").cast("double")
    ns = F.col("n_seasonal").cast("double")
    mae1 = F.col("__e1").cast("double") / n1
    maes = F.col("__es").cast("double") / ns
    return agg.select(
        key_col,
        "n_naive",
        "n_seasonal",
        F.round(F.when(F.col("n_naive") > 0, mae1), 6).alias("mae_naive"),
        F.round(
            F.when(
                (F.col("n_naive") > 0) & (F.col("__a1") > 0),
                F.col("__e1").cast("double") / F.col("__a1").cast("double"),
            ),
            6,
        ).alias("wape_naive"),
        F.round(F.when(F.col("n_seasonal") > 0, maes), 6).alias(
            "mae_seasonal"
        ),
        F.round(
            F.when(
                (F.col("n_seasonal") > 0) & (F.col("__e1") > 0), maes / mae1
            ),
            6,
        ).alias("mase"),
    )


def kaplan_meier(
    df,
    duration_col: str,
    event_col: str,
):
    """Kaplan–Meier survival estimator with right censoring over a
    BOUNDED-grain duration column (the registered query uses whole
    days — callers own the grain; the risk table is |distinct
    durations| rows by construction, the classic published-curve
    shape).

    Survival S(t) = Π_{s≤t} (n_s − d_s)/n_s is the one genuinely
    order-dependent piece; both engines compute it as the SAME
    sequential left fold over the same ordered double factors
    (multiplication/division are exactly-rounded IEEE ops, so the fold
    is bit-identical — the Holt/list_reduce determinism argument, no
    quantization needed). Spark: `aggregate(slice(factors, 1, rn))`;
    DuckDB: `list_reduce(ff[1:rn])`. The O(k²) slice work is over the
    risk table, not the corpus.

    Scale shape: ONE corpus aggregation to the duration grain; the
    running at-risk counts ride an unpartitioned window over that tiny
    table (never the corpus), and the ordered factor array is a
    1-row broadcast joined back. Output per distinct duration:
    ``(duration, n_risk, n_events, n_censored, survival)``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    risk = (
        df.filter(F.col(duration_col).isNotNull())
        .groupBy(F.col(duration_col).alias("duration"))
        .agg(
            F.sum(F.when(F.col(event_col).cast("int") == 1, 1).otherwise(0))
            .alias("n_events"),
            F.sum(F.when(F.col(event_col).cast("int") == 1, 0).otherwise(1))
            .alias("n_censored"),
        )
    )
    w = bounded_global_window("duration")
    # at-risk at t = subjects whose duration is >= t: one reverse
    # running sum over the tiny risk table
    staged = risk.select(
        "duration",
        "n_events",
        "n_censored",
        F.sum(F.col("n_events") + F.col("n_censored"))
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("n_risk"),
        F.row_number().over(w).alias("__rn"),
    )
    factors = staged.select(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "duration",
                    (
                        (F.col("n_risk") - F.col("n_events")).cast("double")
                        / F.col("n_risk").cast("double")
                    ).alias("f"),
                )
            )
        ).alias("__fs")
    ).select(F.expr("transform(__fs, x -> x.f)").alias("__ff"))
    return (
        staged.join(F.broadcast(factors))
        .select(
            "duration",
            "n_risk",
            "n_events",
            "n_censored",
            F.aggregate(
                F.slice(F.col("__ff"), 1, F.col("__rn")),
                F.lit(1.0),
                lambda a, x: a * x,
            ).alias("survival"),
        )
    )


def nelson_aalen(
    df,
    duration_col: str,
    event_col: str,
):
    """Nelson–Aalen cumulative-hazard estimator with right censoring
    — ``kaplan_meier``'s additive sibling: ``H(t) = Σ_{s≤t} d_s/n_s``
    with the standard variance ``Var(t) = Σ_{s≤t} d_s/n_s²``. H is
    preferred when curves must be AGGREGATED or differenced (hazards
    add; survival products don't), and exp(−H) ≈ S without ever
    computing exp (which this estimator deliberately does not — libm
    exp is not engine-portable; callers wanting S use
    ``kaplan_meier``).

    Same exactness argument and scale shape as KM: one corpus
    aggregation to the bounded duration grain, reverse running
    at-risk sums over the tiny risk table, and BOTH running sums
    computed as sequential slice-folds over the duration-ordered
    array (Spark ``aggregate(slice)``, DuckDB ``list_reduce`` — NOT
    window running sums, whose segment-tree accumulation order in
    DuckDB differs from Spark's sequential one).

    Output per distinct duration: ``(duration, n_risk, n_events,
    n_censored, cum_hazard, var_hazard)``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    risk = (
        df.filter(F.col(duration_col).isNotNull())
        .groupBy(F.col(duration_col).alias("duration"))
        .agg(
            F.sum(F.when(F.col(event_col).cast("int") == 1, 1).otherwise(0))
            .alias("n_events"),
            F.sum(F.when(F.col(event_col).cast("int") == 1, 0).otherwise(1))
            .alias("n_censored"),
        )
    )
    w = bounded_global_window("duration")
    staged = risk.select(
        "duration",
        "n_events",
        "n_censored",
        F.sum(F.col("n_events") + F.col("n_censored"))
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("n_risk"),
        F.row_number().over(w).alias("__rn"),
    )
    terms = staged.select(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "duration",
                    (
                        F.col("n_events").cast("double")
                        / F.col("n_risk").cast("double")
                    ).alias("h"),
                    (
                        F.col("n_events").cast("double")
                        / (
                            F.col("n_risk").cast("double")
                            * F.col("n_risk").cast("double")
                        )
                    ).alias("vh"),
                )
            )
        ).alias("__ts")
    ).select(
        F.expr("transform(__ts, x -> x.h)").alias("__hh"),
        F.expr("transform(__ts, x -> x.vh)").alias("__vv"),
    )
    return staged.join(F.broadcast(terms)).select(
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        F.aggregate(
            F.slice(F.col("__hh"), 1, F.col("__rn")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("cum_hazard"),
        F.aggregate(
            F.slice(F.col("__vv"), 1, F.col("__rn")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("var_hazard"),
    )


def logrank_test(
    df,
    duration_col: str,
    event_col: str,
    group_col,
    weight: str = "logrank",
):
    """Two-cohort log-rank test — the hypothesis-test companion of
    ``kaplan_meier`` (is cohort A's survival curve different?).
    ``group_col`` is a boolean column/expression marking cohort A.

    Per distinct duration t: d_t events (d1_t in A), n_t at risk
    (n1_t in A; both via the same reverse running sums as KM). The
    statistic accumulates O = Σ d1 (exact long) and
    E = Σ d·n1/n, V = Σ d·(n1/n)(1−n1/n)(n−d)/(n−1) as a SINGLE
    sequential struct fold over the duration-ordered risk array —
    bit-identical in DuckDB's list_reduce replay (the KM/Holt IEEE
    determinism argument). z = (O−E)/√V in one final expression.

    ``weight="gehan"`` selects the Gehan–Breslow–Wilcoxon variant:
    each time's contribution is weighted by the at-risk count n_t,
    emphasizing EARLY differences (the plain log-rank weights all
    times equally, so late-hazard differences dominate). The weighted
    numerator U = Σ n·d1 − d·n1 is integer-exact (every factor is a
    count); V picks up n² per term. Output columns become
    ``(n_subjects, n_times, u_g, v_g, z)``.

    Scale shape: one corpus aggregation to the duration grain, one
    tiny window, one bounded fold. Default output: one row
    ``(n_subjects, n_times, o_a, e_a, v_a, z)``; NULL z when V = 0.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    risk = (
        df.filter(F.col(duration_col).isNotNull())
        .select(
            F.col(duration_col).alias("t"),
            F.col(event_col).cast("int").alias("ev"),
            group_col.cast("int").alias("in_a"),
        )
        .groupBy("t")
        .agg(
            F.sum("ev").alias("d"),
            F.sum(F.col("ev") * F.col("in_a")).alias("d1"),
            F.count(F.lit(1)).alias("tot"),
            F.sum("in_a").alias("tot1"),
        )
    )
    w = bounded_global_window("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    staged = risk.select(
        "t",
        "d",
        "d1",
        F.sum("tot").over(w).alias("n"),
        F.sum("tot1").over(w).alias("n1"),
    )
    if weight not in ("logrank", "gehan"):
        raise ValueError("weight must be 'logrank' or 'gehan'")
    if weight == "gehan":
        garr = F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("t").cast("long").alias("t"),
                    F.col("d").cast("double").alias("d"),
                    F.col("d1").cast("double").alias("d1"),
                    F.col("n").cast("double").alias("n"),
                    F.col("n1").cast("double").alias("n1"),
                )
            )
        )
        gagg = staged.agg(
            F.max("n").alias("n_subjects"),
            F.count(F.lit(1)).alias("n_times"),
            garr.alias("__arr"),
        )
        # U term n·d1 − d·n1 is a product/difference of exact counts;
        # V term = n²·v_t = d·n1·(n−n1)·(n−d)/(n−1)
        gterms = F.expr(
            "transform(__arr, x -> struct("
            "  (x.n * x.d1) - (x.d * x.n1) AS u,"
            "  CASE WHEN x.n > 1.0 THEN"
            "    ((x.d * x.n1) * (x.n - x.n1))"
            "    * ((x.n - x.d) / (x.n - 1.0))"
            "  ELSE 0.0 END AS v))"
        )
        gfold = F.aggregate(
            gterms,
            F.struct(F.lit(0.0).alias("u"), F.lit(0.0).alias("v")),
            lambda a, x: F.struct(
                (a["u"] + x["u"]).alias("u"),
                (a["v"] + x["v"]).alias("v"),
            ),
        )
        gz = gfold["u"] / F.sqrt(gfold["v"])
        return gagg.select(
            "n_subjects",
            "n_times",
            F.round(gfold["u"], 6).alias("u_g"),
            F.round(gfold["v"], 6).alias("v_g"),
            F.round(F.when(gfold["v"] > 0, gz), 6).alias("z"),
        )
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("t").cast("long").alias("t"),
                F.col("d").cast("double").alias("d"),
                F.col("n").cast("double").alias("n"),
                F.col("n1").cast("double").alias("n1"),
            )
        )
    )
    agg = staged.agg(
        F.max("n").alias("n_subjects"),
        F.count(F.lit(1)).alias("n_times"),
        F.sum("d1").alias("o_a"),
        arr.alias("__arr"),
    )
    terms = F.expr(
        "transform(__arr, x -> struct("
        "  x.d * x.n1 / x.n AS e,"
        "  CASE WHEN x.n > 1.0 THEN"
        "    ((x.d * (x.n1 / x.n)) * (1.0 - x.n1 / x.n))"
        "    * ((x.n - x.d) / (x.n - 1.0))"
        "  ELSE 0.0 END AS v))"
    )
    folded = F.aggregate(
        terms,
        F.struct(F.lit(0.0).alias("e"), F.lit(0.0).alias("v")),
        lambda a, x: F.struct(
            (a["e"] + x["e"]).alias("e"), (a["v"] + x["v"]).alias("v")
        ),
    )
    z = (F.col("o_a").cast("double") - folded["e"]) / F.sqrt(folded["v"])
    return agg.select(
        "n_subjects",
        "n_times",
        "o_a",
        F.round(folded["e"], 6).alias("e_a"),
        F.round(folded["v"], 6).alias("v_a"),
        F.round(F.when(folded["v"] > 0, z), 6).alias("z"),
    )


def km_rmst(
    df,
    duration_col: str,
    event_col: str,
):
    """Restricted mean survival time — the area under the
    ``kaplan_meier`` step curve up to the last observed duration
    (the standard single-number survival summary when median survival
    is undefined). A pure composition: the KM frame's (duration,
    survival) pairs collect once (risk-table-sized by the same
    bounded-grain argument) and ONE sequential struct fold walks the
    step function, accumulating (t_i − t_{i−1})·S_{i−1} with
    (t_0, S_0) = (0, 1) — all exactly-rounded IEEE ops in a fixed
    order, so DuckDB's list_reduce replays the area bit-identically.

    Output: one row ``(n_times, tau, rmst)`` where tau = the last
    observed duration (the restriction horizon). Empty input → one
    row of NULLs (the monitoring contract).
    """
    from pyspark.sql import functions as F

    km = kaplan_meier(df, duration_col, event_col)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("duration").cast("double").alias("t"),
                F.col("survival").alias("s"),
            )
        )
    )
    agg = km.agg(
        F.count(F.lit(1)).alias("n_times"),
        F.max(F.col("duration").cast("double")).alias("tau"),
        arr.alias("__arr"),
    )
    folded = F.aggregate(
        F.col("__arr"),
        F.struct(
            F.lit(0.0).alias("pt"),
            F.lit(1.0).alias("ps"),
            F.lit(0.0).alias("area"),
        ),
        lambda a, x: F.struct(
            x["t"].alias("pt"),
            x["s"].alias("ps"),
            (a["area"] + (x["t"] - a["pt"]) * a["ps"]).alias("area"),
        ),
    )
    return agg.select(
        "n_times",
        "tau",
        F.when(F.col("n_times") > 0, folded["area"]).alias("rmst"),
    )


def mann_kendall(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per series (Mann 1945;
    Kendall 1975) — the nonparametric "is this metric drifting?"
    companion to ``cusum_alarms``: ``S = Σ_{i<j} sign(x_j − x_i)``
    over time order, with the tie-corrected normal approximation
    ``Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18`` and the
    continuity-corrected ``z``.

    The caller supplies the SERIES frame (one row per (key, time) —
    e.g. a daily pre-aggregation), so the pairwise self-join is
    grid-bounded: pairs per key = days², independent of corpus row
    count; the corpus-sized work happened in the caller's one
    aggregation. S and 18·Var(S) stay exact INTEGERS until the final
    division (``sign`` of an integer difference and tie-group counts
    are engine-exact); ``sqrt`` is IEEE-correctly-rounded everywhere,
    so z is bit-reproducible after one quantized round.

    Output per key: ``(key, n_obs, s_stat, var_s, z)`` — z NULL when
    Var(S) = 0 (all values tied or n < 2).
    """
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(time_col).alias("__t"),
        F.col(value_col).alias("__x"),
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__k") == F.col("b.__k"))
        & (F.col("a.__t") < F.col("b.__t")),
    ).groupBy(F.col("a.__k").alias("__k")).agg(
        F.sum(
            F.signum(F.col("b.__x") - F.col("a.__x")).cast("long")
        ).alias("s_stat")
    )
    n_per = base.groupBy("__k").agg(F.count(F.lit(1)).alias("n_obs"))
    ties = (
        base.groupBy("__k", "__x")
        .agg(F.count(F.lit(1)).alias("__t_g"))
        .groupBy("__k")
        .agg(
            F.sum(
                F.col("__t_g")
                * (F.col("__t_g") - 1)
                * (2 * F.col("__t_g") + 5)
            ).alias("__tie_term")
        )
    )
    n = F.col("n_obs")
    var18 = (
        n * (n - 1) * (2 * n + 5) - F.col("__tie_term")
    )  # 18·Var(S), exact integer
    s = F.col("s_stat")
    zraw = F.when(
        s > 0, (s - 1).cast("double") / F.sqrt(var18.cast("double") / 18.0)
    ).when(
        s < 0, (s + 1).cast("double") / F.sqrt(var18.cast("double") / 18.0)
    ).otherwise(F.lit(0.0))
    return (
        n_per.join(ties, "__k")
        .join(pairs, "__k", "left")
        .select(
            F.col("__k").alias(key_col),
            "n_obs",
            F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
            F.round(var18.cast("double") / 18.0, round_dp).alias("var_s"),
            F.when(var18 > 0, F.round(zraw, round_dp)).alias("z"),
        )
    )


def ljung_box(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col,
    lags: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Ljung–Box portmanteau test per series (Ljung & Box 1978): is
    there ANY autocorrelation in the first ``lags`` lags —
    ``Q = n(n+2)·Σ_k r_k²/(n−k)`` with the classical fixed-mean
    sample autocorrelations — the residual-whiteness check behind
    every forecasting/STL fit.

    Exactness: values quantize to integer cents; each ``r_k`` is an
    EXACT integer ratio via the n²-scaled identity

        n²·c_k = n²·Σx_t·x_{t+k} − n·Sx·(H_k + T_k) + (n−k)·Sx²

    (H/T = head/tail sums of the overlap window), so Q is ``lags``
    float terms folded in lag order — no mean-centered accumulation
    anywhere. Series contract as ``mann_kendall``: one row per
    (key, time), the caller owns the grid; the single window pass is
    partitioned by key (corpus-parallel) and adds all ``lags`` lag
    columns at once.

    Output per key: ``(key, n, n_lags, q_stat)`` — NULL when
    n ≤ lags or the series is constant (c₀ = 0).
    """
    if lags < 1:
        raise ValueError("lags must be >= 1")
    v = (
        F.col(value_col)
        if isinstance(value_col, str)
        else value_col
    )
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(time_col).isNotNull()
        & v.isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(time_col).alias("__t"),
        F.round(v * 100).cast("long").alias("__x"),
    )
    w = Window.partitionBy("__k").orderBy("__t")
    lagged = base.select(
        "__k",
        "__x",
        *[
            F.lag("__x", j).over(w).alias(f"__l{j}")
            for j in range(1, lags + 1)
        ],
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(dec(F.col("__x"))).alias("__sx"),
        F.sum(dec(F.col("__x")) * dec(F.col("__x"))).alias("__sxx"),
    ]
    for j in range(1, lags + 1):
        lj = F.col(f"__l{j}")
        aggs.append(
            F.sum(F.when(lj.isNotNull(), dec(F.col("__x")) * dec(lj)))
            .alias(f"__sxy{j}")
        )
        aggs.append(
            F.sum(F.when(lj.isNotNull(), dec(F.col("__x"))))
            .alias(f"__h{j}")
        )
        aggs.append(
            F.sum(F.when(lj.isNotNull(), dec(lj))).alias(f"__t{j}")
        )
    agg = lagged.groupBy("__k").agg(*aggs)
    nD = dec(F.col("__n"))
    c0n2 = nD * nD * F.col("__sxx") - nD * F.col("__sx") * F.col("__sx")
    q = None
    n_d = F.col("__n").cast("double")
    for j in range(1, lags + 1):
        ckn2 = (
            nD * nD * F.coalesce(F.col(f"__sxy{j}"), F.lit(0).cast("decimal(38,0)"))
            - nD
            * F.col("__sx")
            * (
                F.coalesce(F.col(f"__h{j}"), F.lit(0).cast("decimal(38,0)"))
                + F.coalesce(F.col(f"__t{j}"), F.lit(0).cast("decimal(38,0)"))
            )
            + (nD - j) * F.col("__sx") * F.col("__sx")
        )
        rj = ckn2.cast("double") / c0n2.cast("double")
        term = rj * rj / (n_d - float(j))
        q = term if q is None else q + term
    q_stat = n_d * (n_d + 2.0) * q
    ok = (F.col("__n") > lags) & (c0n2.cast("double") > 0)
    return agg.select(
        F.col("__k").alias(key_col),
        F.col("__n").cast("long").alias("n"),
        F.lit(lags).cast("long").alias("n_lags"),
        F.round(F.when(ok, q_stat), round_dp).alias("q_stat"),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    key_col: str,
    season_col: str,
    time_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984,
    independent-seasons form): ``mann_kendall`` comparing only
    LIKE seasons — Mondays with Mondays, Januaries with Januaries —
    so a strong weekly/monthly cycle can't masquerade as (or mask) a
    real monotone drift. ``S = Σ_seasons S_s`` and
    ``Var(S) = Σ_seasons Var_s`` (seasons independent under H₀), then
    the same continuity-corrected z.

    Same contract and scale shape as ``mann_kendall``: the caller
    supplies the series frame (one row per (key, season, time)), the
    pairwise join runs within (key, season) — grid-bounded, and
    |season| times cheaper than unstratified MK on the same grid —
    and S / 18·Var(S) stay exact integers to the final division.

    Output per key: ``(key, n_obs, n_seasons, s_stat, var_s, z)`` —
    z NULL when Var(S) = 0.
    """
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(season_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(season_col).alias("__s"),
        F.col(time_col).alias("__t"),
        F.col(value_col).alias("__x"),
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__t") < F.col("b.__t")),
        )
        .groupBy(F.col("a.__k").alias("__k"))
        .agg(
            F.sum(
                F.signum(F.col("b.__x") - F.col("a.__x")).cast("long")
            ).alias("s_stat")
        )
    )
    n_per = base.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.countDistinct("__s").alias("n_seasons"),
    )
    # per-(key, season) tie-corrected 18·Var, summed over seasons
    per_season = base.groupBy("__k", "__s").agg(
        F.count(F.lit(1)).alias("__ns")
    )
    ties = (
        base.groupBy("__k", "__s", "__x")
        .agg(F.count(F.lit(1)).alias("__t_g"))
        .groupBy("__k", "__s")
        .agg(
            F.sum(
                F.col("__t_g")
                * (F.col("__t_g") - 1)
                * (2 * F.col("__t_g") + 5)
            ).alias("__tie_term")
        )
    )
    var18 = (
        per_season.join(ties, ["__k", "__s"])
        .select(
            "__k",
            (
                F.col("__ns")
                * (F.col("__ns") - 1)
                * (2 * F.col("__ns") + 5)
                - F.col("__tie_term")
            ).alias("__v18s"),
        )
        .groupBy("__k")
        .agg(F.sum("__v18s").alias("__v18"))
    )
    s = F.coalesce(F.col("s_stat"), F.lit(0))
    v18 = F.col("__v18")
    zraw = (
        F.when(
            s > 0,
            (s - 1).cast("double") / F.sqrt(v18.cast("double") / 18.0),
        )
        .when(
            s < 0,
            (s + 1).cast("double") / F.sqrt(v18.cast("double") / 18.0),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        n_per.join(var18, "__k")
        .join(pairs, "__k", "left")
        .select(
            F.col("__k").alias(key_col),
            "n_obs",
            "n_seasons",
            s.alias("s_stat"),
            F.round(v18.cast("double") / 18.0, round_dp).alias(
                "var_s"
            ),
            F.when(v18 > 0, F.round(zraw, round_dp)).alias("z"),
        )
    )


def theil_sen_slope(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Theil-Sen slope per series (Theil 1950; Sen 1968) — the robust
    trend MAGNITUDE that pairs with ``mann_kendall``'s significance
    (the standard nonparametric pair: MK says "is it drifting", Sen
    says "how fast"): the median of all pairwise slopes
    ``(x_j − x_i) / (t_j − t_i)`` over time order, immune to up to
    ~29% outliers where the OLS slope (``group_linreg``) is not.

    Same contract and scale shape as ``mann_kendall``: the caller
    supplies the SERIES frame (one row per (key, time) — a daily
    pre-aggregation with distinct times per key), so the pairwise
    self-join is GRID-bounded (pairs per key = days², independent of
    corpus row count), and the per-key slope-order window runs on
    that same bounded grain. Slopes are one exact-integer-difference
    division each (dates diff to integer days), so every slope double
    is bit-identical across engines; the median interpolates the two
    middle order statistics for even pair counts (their average —
    one more IEEE-exact op).

    Output per key: ``(key, n_obs, n_pairs, sen_slope)`` — NULL slope
    when n_obs < 2.
    """
    from pyspark.sql.types import DateType, TimestampType

    t_type = df.schema[time_col].dataType
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(time_col).alias("__t"),
        F.col(value_col).alias("__x"),
    )
    a, b = base.alias("a"), base.alias("b")
    if isinstance(t_type, DateType):
        gap = F.datediff(F.col("b.__t"), F.col("a.__t")).cast("double")
    elif isinstance(t_type, TimestampType):
        raise ValueError(
            "pass an integer/date time grid (e.g. to_date or an epoch "
            "index), not raw timestamps — the slope unit must be exact"
        )
    else:
        gap = (F.col("b.__t") - F.col("a.__t")).cast("double")
    slopes = a.join(
        b,
        (F.col("a.__k") == F.col("b.__k"))
        & (F.col("a.__t") < F.col("b.__t")),
    ).select(
        F.col("a.__k").alias("__k"),
        (
            (F.col("b.__x") - F.col("a.__x")).cast("double") / gap
        ).alias("__s"),
    )
    word = Window.partitionBy("__k").orderBy("__s")
    wall = Window.partitionBy("__k")
    staged = slopes.select(
        "__k",
        "__s",
        F.row_number().over(word).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__m"),
    )
    lo = F.expr("(__m + 1) div 2")
    hi = F.expr("__m div 2 + 1")
    med = (
        staged.filter((F.col("__rn") == lo) | (F.col("__rn") == hi))
        .groupBy("__k")
        .agg(
            F.avg("__s").alias("__med"),
            F.max("__m").alias("n_pairs"),
        )
    )
    n_per = base.groupBy("__k").agg(F.count(F.lit(1)).alias("n_obs"))
    return n_per.join(med, "__k", "left").select(
        F.col("__k").alias(key_col),
        "n_obs",
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        F.round("__med", round_dp).alias("sen_slope"),
    )


def stl_decompose(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    season_col: str,
    trend_window: int = 7,
    round_dp: int = 6,
) -> DataFrame:
    """Additive seasonal-trend decomposition (the classical
    moving-average decomposition STL descends from): per series,
    ``trend`` = centered ``trend_window``-row moving average (NULL
    until the window is FULL — no edge extrapolation), ``seasonal`` =
    the mean detrended value of the row's season index (broadcast
    back), ``resid`` = value − trend − seasonal. The monitoring
    decomposition that separates "weekly rhythm" from "actual drift"
    before alerting on either.

    The caller supplies a GAP-FREE series grid (densify first — a
    missing row silently mis-centers the row-window average, the
    ``forecast_eval`` lesson) and a precomputed ``season_col``
    (e.g. ``datediff(day, epoch) % 7`` — engine-portable, unlike
    native day-of-week numbering). Exactness: values are integers (a
    count grid), the trend is one int-sum / window double division,
    and seasonal means quantize detrended values to exact 1e-6
    integers before averaging — every output is a fixed expression
    over exact sums, bit-reproducible in the oracle. Per-series
    windows run on the calendar grid — bounded by the date span,
    never by event count (the corpus-sized work is the caller's one
    daily aggregation).
    """
    if trend_window % 2 == 0:
        raise ValueError("trend_window must be odd (centered MA)")
    half = trend_window // 2
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(-half, half)
    )
    v = F.col(value_col).cast("long")
    trend = F.when(
        F.count(v).over(w) == trend_window,
        F.sum(v).over(w) / F.lit(float(trend_window)),
    )
    base = df.select(
        F.col(key_col),
        F.col(time_col),
        F.col(season_col).alias("__season"),
        v.alias("__v"),
        trend.alias("__trend"),
    )
    det = F.col("__v") - F.col("__trend")
    detq = (
        F.signum(det) * F.floor(F.abs(det) * F.lit(1e6) + F.lit(0.5))
    ).cast("long")
    seasonal_means = (
        base.filter(F.col("__trend").isNotNull())
        .groupBy(F.col(key_col), "__season")
        .agg(
            F.sum(detq).alias("__sdq"),
            F.count(F.lit(1)).alias("__cnt"),
        )
        .select(
            F.col(key_col),
            "__season",
            (
                F.col("__sdq").cast("double")
                / F.col("__cnt")
                / F.lit(1e6)
            ).alias("__seasonal"),
        )
    )
    out = base.join(
        F.broadcast(seasonal_means), [key_col, "__season"], "left"
    )

    # binary-exact output quantizer (the Holt lesson): seasonal means
    # land EXACTLY on 1e-7 half-boundaries (integer/count grids), where
    # decimal-repr ROUND and binary ROUND disagree; sign·floor is pure
    # double arithmetic on identical inputs in both engines
    def q(col):
        scale = F.lit(float(10**round_dp))
        return (
            F.signum(col) * F.floor(F.abs(col) * scale + F.lit(0.5))
        ) / scale

    return out.select(
        F.col(key_col),
        F.col(time_col),
        F.col("__season").alias(season_col),
        F.col("__v").alias(value_col),
        q(F.col("__trend")).alias("trend"),
        q(F.col("__seasonal")).alias("seasonal"),
        q(
            F.col("__v") - F.col("__trend") - F.col("__seasonal")
        ).alias("resid"),
    )


def _cox_link(z: float) -> float:
    """The engine-portable Cox link: exp(z) via the compound-interest
    limit (1 + z/1024)^1024 computed as TEN squarings — every op is
    exactly-rounded IEEE, so the value is bit-identical in Python,
    Spark and DuckDB (the fast-sigmoid discipline applied to the Cox
    partial likelihood; relative error < z²·e^z/2048, ~0.05% at
    |z| = 1, far below the fit's statistical noise)."""
    b = 1.0 + z / 1024.0
    for _ in range(10):
        b = b * b
    return b


def cox_ph_single(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    x_col: str,
    iters: int = 8,
    round_dp: int = 6,
    max_cells: int = 10_000,
) -> DataFrame:
    """Cox proportional-hazards regression with ONE covariate
    (Cox 1972; Breslow tie handling) — the missing member of the
    survival family next to ``kaplan_meier`` / ``logrank_test`` /
    ``km_rmst``: "how much does this covariate scale the hazard",
    e.g. does activity level predict conversion risk.

    Scale shape (the FS-EM / gd_train discipline): the corpus
    collapses ONCE to the bounded (duration, x) CELL GRID — subjects
    ``m`` and events ``d`` per cell; both grids are caller-owned
    (whole days × a quantized covariate), and ``max_cells`` ENFORCES
    the contract with a pre-collect LIMIT probe (the
    ``bradley_terry_strengths``/``plackett_luce_strengths``
    ``max_items``/``max_patterns`` precedent): an unquantized
    continuous covariate raises instead of silently collecting a
    corpus-sized cell table on the driver. ``iters`` Newton steps on
    the Breslow partial likelihood then run on the driver over that
    bounded frame:

        w(x)    = link(x·β)        (link = (1+z/1024)^1024 — see
                                    _cox_link: bit-exact everywhere)
        SE(t)   = Σ_{t'≥t} m·w     (suffix sums over the time grid)
        g       = Σ d·x − Σ_t d_t·SXE(t)/SE(t)
        h       = Σ_t d_t·(SX2E(t)/SE(t) − (SXE(t)/SE(t))²)
        β'      = β + g/h          (h = 0 → carry)

    Every cell/time contribution quantizes to the 1e-12 integer grid
    before summing, so all sums are order-free exact integers and the
    whole fit replays bit-identically in an iteration-unrolled SQL
    oracle operating on the same cell table.

    Output: one row ``(n_subjects, n_events, beta, hazard_ratio)``
    with ``hazard_ratio = link(β)``; NULL β when no events or the
    information is 0 (constant covariate).
    """
    import math

    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        _probe_driver_bounded,
    )

    grid = (
        df.filter(
            F.col(duration_col).isNotNull()
            & F.col(event_col).isNotNull()
            & F.col(x_col).isNotNull()
        )
        .groupBy(
            F.col(duration_col).alias("__t"),
            F.col(x_col).cast("double").alias("__x"),
        )
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.sum(F.col(event_col).cast("long")).alias("__d"),
        )
    )
    _probe_driver_bounded(
        grid, max_cells, f"(duration, x) cells (max_cells={max_cells})"
    )
    cells = grid.collect()
    rows = sorted(
        ((r["__t"], float(r["__x"]), int(r["__m"]), int(r["__d"]))
         for r in cells),
        key=lambda c: (c[0], c[1]),
    )
    n_subjects = sum(m for _, _, m, _ in rows)
    n_events = sum(dd for _, _, _, dd in rows)
    S = 1e12

    def q(v: float) -> int:
        return math.floor(v * S + 0.5)

    sdx_q = 0
    for _, x, _, dd in rows:
        sdx_q += dd * q(x)
    times = sorted({t for t, _, _, _ in rows})
    beta: float | None = 0.0
    if n_events == 0:
        beta = None
    else:
        for _ in range(iters):
            per_t: dict = {t: [0, 0, 0, 0] for t in times}
            for t, x, m, dd in rows:
                w = _cox_link(x * beta)
                rec = per_t[t]
                rec[0] += m * q(w)
                rec[1] += m * q(x * w)
                rec[2] += m * q((x * x) * w)
                rec[3] += dd
            se = sxe = sx2e = 0
            sfx: dict = {}
            for t in reversed(times):
                se += per_t[t][0]
                sxe += per_t[t][1]
                sx2e += per_t[t][2]
                sfx[t] = (se, sxe, sx2e)
            g_q = 0
            h_q = 0
            for t in times:
                dt = per_t[t][3]
                if dt and sfx[t][0]:
                    r1 = float(sfx[t][1]) / float(sfx[t][0])
                    r2 = float(sfx[t][2]) / float(sfx[t][0])
                    g_q += q(dt * r1)
                    h_q += q(dt * (r2 - r1 * r1))
            if h_q != 0:
                g = (sdx_q - g_q) / S
                h = h_q / S
                beta = beta + g / h
    grid = 10.0**round_dp
    spark = df.sparkSession
    out = [
        (
            n_subjects,
            n_events,
            None
            if beta is None
            else math.floor(beta * grid + 0.5) / grid,
            None
            if beta is None
            else math.floor(_cox_link(beta) * grid + 0.5) / grid,
        )
    ]
    return spark.createDataFrame(
        out,
        "n_subjects long, n_events long, beta double,"
        " hazard_ratio double",
    )


def durbin_watson(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key Durbin-Watson statistic (Durbin & Watson 1950) for
    lag-1 serial correlation in a time-ordered series — the
    autocorrelation DIAGNOSTIC next to ``ljung_box``'s portmanteau
    test: DW = sum (x_t - x_{t-1})^2 / sum (x_t - xbar)^2, ~2 when
    successive deviations are uncorrelated, ->0 under positive and
    ->4 under negative serial correlation. Computed on the mean-
    centered series, for which the textbook OLS-residual form (a
    regression on a constant) reduces exactly.

    Exactness: integer-grid contract; both quadratic forms ride the
    n-scaled integer identity — numerator sum of squared integer
    lag diffs, denominator n*S2 - S1^2 — so DW = n*num/(n*S2 - S1^2)
    divides exact decimals once (never accumulates centered floats,
    the ``ljung_box`` discipline).

    Scale shape: ONE per-key window (lag over the caller's total
    order) + ONE hash aggregation. Output per key: ``(key, n,
    dw_stat)`` — NULL when n < 2 or the series is constant.
    """
    from icnarc_to_philips_linkage_spark.operators.profile import (
        _require_integer_valued,
    )

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    _require_integer_valued(df, v, "value")
    # alias the key BEFORE the window so the downstream groupBy sees
    # the window's hash partitioning on the same attribute and reuses
    # it (one exchange total, the pettitt_test shape)
    base = df.filter(v.isNotNull()).select(
        F.col(key_col).alias("__k"),
        v.cast("decimal(18,0)").alias("__c"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("__k").orderBy(
        *[F.col(c) for c in order_cols]
    )
    staged = base.select(
        "__k",
        "__c",
        (F.col("__c") - F.lag("__c").over(w)).alias("__d"),
    )
    agg = staged.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("__d") * F.col("__d")).cast("decimal(38,0)")).alias(
            "__num"
        ),
        F.sum("__c").alias("__s1"),
        F.sum((F.col("__c") * F.col("__c")).cast("decimal(38,0)")).alias(
            "__s2"
        ),
    )
    n = F.col("n").cast("decimal(38,0)")
    den = (n * F.col("__s2") - F.col("__s1") * F.col("__s1")).cast(
        "double"
    )
    ok = (F.col("n") >= 2) & (den > 0)
    dw = (
        F.col("n").cast("double") * F.col("__num").cast("double") / den
    )
    return agg.select(
        F.col("__k").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.round(F.when(ok, dw), round_dp).alias("dw_stat"),
    )


def pettitt_test(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key Pettitt change-point test (Pettitt 1979) — the
    nonparametric "WHERE did the level shift" companion of
    ``mann_kendall``'s "is there a trend": U_t = sum_{i<=t, j>t}
    sgn(x_i - x_j), K = max_t |U_t| over the split points t=1..n-1,
    with the closed-form approximate significance p = 2 exp(-6K^2 /
    (n^3 + n^2)) (capped at 1 — no CDF table needed).

    Rank identity (what makes one pass suffice): with tie-averaged
    midranks r_i over the key's values, U_t = 2*sum_{i<=t} r_i -
    t*(n+1). Midranks ride exact integer doubles (2r = 2*rank +
    ties - 1), so every U_t is an exact integer; the argmax
    tie-breaks to the EARLIEST split (min struct(-|U|, t) — a
    deterministic single aggregation).

    Scale shape: two windows on the SAME per-key partitioning (rank
    by value, running sum by time) + one hash aggregation; values
    need not be integers (only ranks enter the statistic).

    Output per key: ``(key, n, k_stat, t_split, p_value)`` — the
    split index t in 1..n-1 (change AFTER the t-th observation in
    the caller's order); NULLs when n < 2.
    """
    wv = Window.partitionBy("__k").orderBy(F.col(value_col))
    wt = (
        Window.partitionBy("__k")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("__k", value_col)
    staged = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("__k"),
            F.col(value_col),
            *[F.col(c) for c in order_cols],
        )
        .withColumn(
            "__r2",
            (
                2 * F.rank().over(wv)
                + F.count(F.lit(1)).over(wn)
                - 1
            ).cast("long"),
        )
        .withColumn("__cum2", F.sum("__r2").over(wt))
        .withColumn(
            "__t",
            F.row_number().over(
                Window.partitionBy("__k").orderBy(
                    *[F.col(c) for c in order_cols]
                )
            ),
        )
    )
    nw = Window.partitionBy("__k")
    staged = staged.withColumn("__n", F.count(F.lit(1)).over(nw))
    u2 = F.col("__cum2") - F.col("__t").cast("long") * (
        F.col("__n").cast("long") + 1
    )
    cand = staged.filter(F.col("__t") < F.col("__n")).select(
        "__k",
        "__n",
        F.abs(u2).alias("__au2"),
        F.col("__t").cast("long").alias("__ti"),
    )
    agg = cand.groupBy("__k").agg(
        F.max("__n").alias("n"),
        F.min(
            F.struct(
                (-F.col("__au2")).alias("nu"), F.col("__ti").alias("ti")
            )
        ).alias("__best"),
    )
    n = F.col("n").cast("double")
    k2 = (-F.col("__best.nu")).cast("double")
    p = F.least(
        F.lit(1.0), 2.0 * F.exp(-6.0 * k2 * k2 / (n * n * n + n * n))
    )
    return agg.select(
        F.col("__k").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.round(k2, round_dp).alias("k_stat"),
        F.col("__best.ti").alias("t_split"),
        F.round(p, round_dp).alias("p_value"),
    )


def harrell_c_index(
    df: DataFrame,
    time_col: str,
    event_col: str,
    score_col: str,
    round_dp: int = 9,
) -> DataFrame:
    """Harrell's concordance index (Harrell et al. 1982) for a risk
    score against censored survival times — the survival-analysis
    AUC, and the discrimination companion of ``cox_ph_single``
    (whose linear predictor is the canonical score): over textbook
    comparable pairs (t_i < t_j AND the earlier subject's event was
    OBSERVED — tied times are not comparable), a pair is concordant
    when the earlier-failing subject has the HIGHER risk score; score
    ties count 1/2:

        C = (n_conc + 0.5 * n_tied) / (n_conc + n_disc + n_tied)

    Scale shape: the ``kendall_tau_b`` cell-grid contract — the
    corpus collapses to the (time, event, score) CELL GRID in one
    aggregation (bounded: day-grain durations x binary event x the
    caller's score grid), and every pair count comes from ONE
    broadcast self-join over that bounded grid (cell_a strictly
    earlier AND observed vs cell_b later counts c_a*c_b pairs
    exactly once) — never a corpus pair join. Counts are exact
    decimals; one final division.

    Output one row: ``(n_comparable, n_concordant, n_discordant,
    n_tied_score, c_index)`` — NULL C when no pair is comparable.
    """
    cells = (
        df.filter(
            F.col(time_col).isNotNull()
            & F.col(event_col).isNotNull()
            & F.col(score_col).isNotNull()
        )
        .groupBy(
            F.col(time_col).alias("__t"),
            F.col(event_col).cast("int").alias("__e"),
            F.col(score_col).alias("__s"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    a = cells.filter(F.col("__e") == 1).select(
        F.col("__t").alias("__ta"),
        F.col("__s").alias("__sa"),
        F.col("__c").alias("__ca"),
    )
    b = cells.select(
        F.col("__t").alias("__tb"),
        F.col("__s").alias("__sb"),
        F.col("__c").alias("__cb"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pairs = a.join(F.broadcast(b), F.col("__ta") < F.col("__tb")).agg(
        F.sum(
            F.when(F.col("__sa") > F.col("__sb"), d("__ca") * d("__cb"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("__conc"),
        F.sum(
            F.when(F.col("__sa") < F.col("__sb"), d("__ca") * d("__cb"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("__disc"),
        F.sum(
            F.when(F.col("__sa") == F.col("__sb"), d("__ca") * d("__cb"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("__tied"),
    )
    z = F.lit(0).cast("decimal(38,0)")
    conc = F.coalesce(F.col("__conc"), z)
    disc = F.coalesce(F.col("__disc"), z)
    tied = F.coalesce(F.col("__tied"), z)
    tot = conc + disc + tied
    return pairs.select(
        tot.cast("long").alias("n_comparable"),
        conc.cast("long").alias("n_concordant"),
        disc.cast("long").alias("n_discordant"),
        tied.cast("long").alias("n_tied_score"),
        F.round(
            F.when(
                tot > 0,
                (2 * conc + tied).cast("double")
                / (2 * tot).cast("double"),
            ),
            round_dp,
        ).alias("c_index"),
    )


def granger_lag1(
    df: DataFrame,
    time_col: str,
    y_col,
    x_col,
    round_dp: int = 6,
) -> DataFrame:
    """Lag-1 Granger causality F-test (Granger 1969): does x's past
    improve the prediction of y beyond y's own past? Unrestricted
    OLS y_t ~ (1, y_{t-1}, x_{t-1}) against restricted y_t ~
    (1, y_{t-1}); F = (RSS_r - RSS_u) / (RSS_u / (n - 3)) with 1
    restriction. The statistic and dfs are emitted, not a p-value
    (no closed-form F tail — the ``a24_chi_square`` convention).

    The input frame is ONE ROW PER TIME STEP on a DRIVER-BOUNDED
    grain (hourly/daily rollups — the ``roc_auc`` bounded-window
    precedent), so the lag rides ``bounded_global_window``; gaps in
    the observed grain lag across (observed-grain contract, the
    caller owns regularization via ``resample_ffill``).

    Exactness: integer-grid contract on y and x; BOTH regressions
    solve their normal equations in CLOSED FORM (Cramer's rule for
    the 3x3, the ``a20_group_linreg`` 2x2 identity for the nested
    model) off ONE aggregation of exact decimal cross-moments; every
    determinant/RSS is a fixed double expression shared with the SQL
    oracle. RSS via the normal-equation identity RSS = Syy - b'X'y.

    Output one row: ``(n, b_y1, b_x1, rss_r, rss_u, f_stat, df2)``
    — NULLs when n < 4, a determinant is 0, or RSS_u <= 0.
    """
    from icnarc_to_philips_linkage_spark.operators.profile import (
        _require_integer_valued,
    )
    from icnarc_to_philips_linkage_spark.operators.scale import (
        bounded_global_window,
    )

    y = F.col(y_col) if isinstance(y_col, str) else y_col
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    _require_integer_valued(df, y, "y")
    _require_integer_valued(df, x, "x")
    w = bounded_global_window(time_col, time_col)
    d = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    staged = (
        df.select(
            F.col(time_col),
            d(y).alias("__y"),
            d(x).alias("__x"),
        )
        .select(
            "__y",
            F.lag("__y").over(w).alias("__y1"),
            F.lag("__x").over(w).alias("__x1"),
        )
        .filter(F.col("__y1").isNotNull() & F.col("__x1").isNotNull())
    )
    c = lambda a, b: F.sum(d38(F.col(a) * F.col(b)))  # noqa: E731
    agg = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").cast("double").alias("sy"),
        F.sum("__y1").cast("double").alias("sy1"),
        F.sum("__x1").cast("double").alias("sx1"),
        c("__y", "__y").cast("double").alias("syy"),
        c("__y1", "__y1").cast("double").alias("sy1y1"),
        c("__x1", "__x1").cast("double").alias("sx1x1"),
        c("__y", "__y1").cast("double").alias("syy1"),
        c("__y", "__x1").cast("double").alias("syx1"),
        c("__y1", "__x1").cast("double").alias("sy1x1"),
    )
    n = F.col("n").cast("double")
    sy, sy1, sx1 = F.col("sy"), F.col("sy1"), F.col("sx1")
    syy, syy1, syx1 = F.col("syy"), F.col("syy1"), F.col("syx1")
    sy1y1, sx1x1, sy1x1 = (
        F.col("sy1y1"),
        F.col("sx1x1"),
        F.col("sy1x1"),
    )

    def det3(a, b, cc, dd, e, f, g, h, i):
        return (
            a * (e * i - f * h) - b * (dd * i - f * g)
            + cc * (dd * h - e * g)
        )

    det = det3(n, sy1, sx1, sy1, sy1y1, sy1x1, sx1, sy1x1, sx1x1)
    b0 = det3(sy, sy1, sx1, syy1, sy1y1, sy1x1, syx1, sy1x1, sx1x1) / det
    b1 = det3(n, sy, sx1, sy1, syy1, sy1x1, sx1, syx1, sx1x1) / det
    b2 = det3(n, sy1, sy, sy1, sy1y1, syy1, sx1, sy1x1, syx1) / det
    rss_u = syy - (b0 * sy + b1 * syy1 + b2 * syx1)
    d2 = n * sy1y1 - sy1 * sy1
    b0r = (sy * sy1y1 - sy1 * syy1) / d2
    b1r = (n * syy1 - sy1 * sy) / d2
    rss_r = syy - (b0r * sy + b1r * syy1)
    fstat = (rss_r - rss_u) / (rss_u / (n - 3.0))
    ok = (
        (F.col("n") >= 4)
        & (det != 0)
        & (d2 != 0)
        & (rss_u > 0)
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.when(ok, b1), round_dp).alias("b_y1"),
        F.round(F.when(ok, b2), round_dp).alias("b_x1"),
        F.round(F.when(ok, rss_r), round_dp).alias("rss_r"),
        F.round(F.when(ok, rss_u), round_dp).alias("rss_u"),
        F.round(F.when(ok, fstat), round_dp).alias("f_stat"),
        F.when(ok, (F.col("n") - 3).cast("long")).alias("df2"),
    )


def page_hinkley(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key Page-Hinkley drift detector (Page 1954; Hinkley 1971)
    for an upward MEAN shift in a time-ordered stream — the
    sequential companion of ``pettitt_test``'s retrospective change
    point and ``cusum_alarms``' known-target CUSUM (PH needs no
    target: it tracks deviations from the RUNNING mean):

        m_t = sum_{i<=t} (x_i - mean_i - delta),   mean_i = S_i / i
        PH_t = m_t - min_{i<=t} m_i,   alarm when PH_t > lambda

    Exactness: x quantizes to the 1e-6 grid (exact decimal running
    sum S_i), the per-row deviation is ONE fixed double expression
    off exact integers, and m_t accumulates 1e-9-quantized deviation
    terms as decimals — both running aggregations are order-free
    exact, so the running max and every alarm comparison are exact
    integer comparisons (no float drift across engines; the
    ``nelson_aalen`` no-float-window discipline).

    Scale shape: row_number + two running sums + one running max on
    ONE per-key partitioning (the ``pettitt_test`` single-exchange
    shape) + one hash aggregation.

    Output per key: ``(key, n, max_ph, n_alarms, first_alarm_t)``
    — first_alarm_t is the 1-based index of the first alarming
    observation in the caller's order (NULL when none).
    """
    w = (
        Window.partitionBy("__k")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("__k").orderBy(
        *[F.col(c) for c in order_cols]
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.floor(
            (F.col(value_col) * 1e6 + 0.5).cast("decimal(38,6)")
        )
        .cast("decimal(38,0)")
        .alias("__xq"),
        *[F.col(c) for c in order_cols],
    )
    staged = base.select(
        "__k",
        "__xq",
        F.row_number().over(wr).alias("__i"),
        F.sum("__xq").over(w).alias("__s"),
        *[F.col(c) for c in order_cols],
    )
    dev = (
        F.col("__xq").cast("double") / 1e6
        - F.col("__s").cast("double") / 1e6 / F.col("__i").cast("double")
        - F.lit(float(delta))
    )
    wi = (
        Window.partitionBy("__k")
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = staged.select(
        "__k",
        "__i",
        F.floor((dev * 1e9 + 0.5).cast("decimal(38,6)"))
        .cast("decimal(38,0)")
        .alias("__dq"),
    ).select(
        "__k",
        "__i",
        F.sum("__dq").over(wi).alias("__m"),
    )
    staged = staged.select(
        "__k",
        "__i",
        (F.col("__m") - F.min("__m").over(wi)).alias("__ph"),
    )
    lam_q = int(round(float(lam) * 1e9))
    alarm = F.col("__ph") > F.lit(lam_q).cast("decimal(38,0)")
    agg = staged.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("__ph").alias("__maxph"),
        F.count(F.when(alarm, F.lit(1))).alias("n_alarms"),
        F.min(F.when(alarm, F.col("__i"))).alias("first_alarm_t"),
    )
    return agg.select(
        F.col("__k").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("__maxph").cast("double") / 1e9, round_dp
        ).alias("max_ph"),
        F.col("n_alarms").cast("long").alias("n_alarms"),
        F.col("first_alarm_t").cast("long").alias("first_alarm_t"),
    )
