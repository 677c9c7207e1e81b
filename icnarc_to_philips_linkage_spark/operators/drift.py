"""Distribution-drift detection between two corpus slices.

Training-data pipelines re-ingest continuously; the standard monitoring
question is "does today's batch look like the reference distribution?".
This module answers it with the two industry-standard statistics,
computed as ONE aggregation plan over both slices:

- **PSI** (population stability index): sum over buckets of
  ``(p_cur - p_ref) * ln(p_cur / p_ref)``. Rule of thumb: <0.1 stable,
  0.1-0.25 moderate shift, >0.25 action.
- **Binned KS statistic**: max over buckets of the absolute cumulative
  probability gap — the Kolmogorov-Smirnov statistic restricted to the
  same bucket grid (exact KS needs a per-value CDF; on 100 TB the
  bucketed form is the practical one, and its grid is explicit).

Scale shape: both slices are unioned with a split tag and aggregated
in one ``groupBy(bucket)`` with conditional counts — a single shuffle
whose cardinality is ``bins``, independent of data size. Laplace
smoothing (``eps`` per bucket) keeps empty buckets finite and is
applied identically in the DuckDB oracle.

Bucket edges are CALLER-FIXED (lo/hi/bins), not data-derived: drift
monitoring must use the same grid every day or the statistic itself
drifts; data-derived edges would also make results depend on which
slice defines them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators.scale import (
    bounded_global_partition,
    bounded_global_window,
)


def bucketize(col, lo: float, hi: float, bins: int):
    """Equal-width bucket index in [0, bins-1], clamping out-of-range
    values into the edge buckets (monitoring wants them counted, not
    dropped)."""
    width = (hi - lo) / bins
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("long")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Per-bucket PSI contributions plus the scalar PSI total and binned
    KS statistic (repeated on every row so the result is one flat,
    hash-checkable table). Two-frame form for slices from DIFFERENT
    tables (yesterday's snapshot vs today's); when both slices are
    predicates over ONE table, use ``psi_report_tagged`` — it buckets in
    a single scan instead of two.

    Returns columns: ``bucket, n_ref, n_cur, p_ref, p_cur, psi_contrib,
    psi_total, ks_stat`` — probabilities and statistics rounded to 6dp.
    """
    tagged = ref.select(
        bucketize(F.col(value_col).cast("double"), lo, hi, bins).alias("bucket"),
        F.lit(1).alias("__is_ref"),
    ).unionByName(
        cur.select(
            bucketize(F.col(value_col).cast("double"), lo, hi, bins).alias("bucket"),
            F.lit(0).alias("__is_ref"),
        )
    )
    return _psi_from_tagged(tagged, bins, eps)


def psi_report_tagged(
    df: DataFrame,
    is_ref: Column,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Single-scan PSI/KS when ref and cur are predicate slices of the
    same table: ``is_ref`` tags each row (rows where it is NULL are
    excluded from both slices). At 100 TB this halves the dominant cost
    — the corpus scan — versus the two-frame form."""
    tagged = df.filter(is_ref.isNotNull()).select(
        bucketize(F.col(value_col).cast("double"), lo, hi, bins).alias("bucket"),
        F.when(is_ref, 1).otherwise(0).alias("__is_ref"),
    )
    return _psi_from_tagged(tagged, bins, eps)


def _psi_from_tagged(tagged: DataFrame, bins: int, eps: float) -> DataFrame:
    counts = tagged.groupBy("bucket").agg(
        F.count(F.when(F.col("__is_ref") == 1, 1)).alias("n_ref"),
        F.count(F.when(F.col("__is_ref") == 0, 1)).alias("n_cur"),
    )
    # NULL values bucket to NULL and are excluded from both slices'
    # totals symmetrically (groupBy keeps the NULL bucket row out via
    # the explicit filter below).
    counts = counts.filter(F.col("bucket").isNotNull())
    return psi_from_bucket_counts(counts, bins, eps)


def psi_report_strata(
    df: DataFrame,
    strata_col: str,
    is_ref: Column,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Per-stratum PSI/KS in ONE pass: the grouped form of
    ``psi_report_tagged`` — drift is computed independently within each
    stratum (per language, per source, per feature slice), which is how
    production monitoring actually runs: a stable aggregate can hide a
    badly drifted stratum. One shuffle of cardinality
    |strata| x bins; all windows partition by the stratum. Output adds
    a leading ``stratum`` column; psi_total/ks_stat are per-stratum."""
    tagged = df.filter(is_ref.isNotNull()).select(
        F.col(strata_col).alias("stratum"),
        bucketize(F.col(value_col).cast("double"), lo, hi, bins).alias(
            "bucket"
        ),
        F.when(is_ref, 1).otherwise(0).alias("__is_ref"),
    )
    counts = (
        tagged.groupBy("stratum", "bucket")
        .agg(
            F.count(F.when(F.col("__is_ref") == 1, 1)).alias("n_ref"),
            F.count(F.when(F.col("__is_ref") == 0, 1)).alias("n_cur"),
        )
        .filter(F.col("bucket").isNotNull())
    )
    return psi_from_bucket_counts(counts, bins, eps, strata_col="stratum")


def psi_from_bucket_counts(
    counts: DataFrame, bins: int, eps: float, strata_col: str | None = None
) -> DataFrame:
    """PSI/KS from a pre-bucketed (bucket, n_ref, n_cur) histogram —
    the shared tail of the batch forms and the streaming monitor
    (streaming/drift_monitor.py), which scores micro-batches against a
    frozen ``bins``-row reference histogram instead of rescanning the
    reference. With ``strata_col``, every window partitions by the
    stratum so each stratum gets its own totals / PSI / KS."""
    # Window levels are materialized stepwise (Spark forbids nesting a
    # window function inside another window's argument).
    parts = [strata_col] if strata_col else []
    if strata_col:
        w_all = Window.partitionBy(strata_col)
        w_cum = (
            Window.partitionBy(strata_col)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w_all = bounded_global_partition("bucket")
        w_cum = bounded_global_window("bucket").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    out = (
        counts.withColumn("__tot_ref", F.sum("n_ref").over(w_all))
        .withColumn("__tot_cur", F.sum("n_cur").over(w_all))
        .withColumn(
            "p_ref",
            (F.col("n_ref") + F.lit(eps)) / (F.col("__tot_ref") + F.lit(eps * bins)),
        )
        .withColumn(
            "p_cur",
            (F.col("n_cur") + F.lit(eps)) / (F.col("__tot_cur") + F.lit(eps * bins)),
        )
        .withColumn(
            "psi_contrib",
            (F.col("p_cur") - F.col("p_ref"))
            * F.log(F.col("p_cur") / F.col("p_ref")),
        )
        .withColumn("__cum_ref", F.sum("p_ref").over(w_cum))
        .withColumn("__cum_cur", F.sum("p_cur").over(w_cum))
        .withColumn("__gap", F.abs(F.col("__cum_ref") - F.col("__cum_cur")))
        .withColumn("psi_total", F.round(F.sum("psi_contrib").over(w_all), 6))
        .withColumn("ks_stat", F.round(F.max("__gap").over(w_all), 6))
    )
    return out.select(
        *parts,
        "bucket",
        "n_ref",
        "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round("psi_contrib", 6).alias("psi_contrib"),
        "psi_total",
        "ks_stat",
    )


def js_divergence(
    df: DataFrame,
    is_ref: Column,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Binned Jensen–Shannon divergence between the reference and
    current slices — the symmetric, always-finite cousin PSI's
    eps-smoothing approximates: ``JSD = ½Σ p·ln(p/m) + ½Σ q·ln(q/m)``
    with ``m = (p+q)/2``; a bucket empty on one side contributes its
    defined 0 on that side (no smoothing constant to tune), and
    ``√JSD`` is a proper metric, reported alongside. Completes the
    drift family: PSI (support-sensitive), KS (worst gap),
    W1 (mass distance), JSD (information distance).

    Same single-scan tagged shape as ``psi_report_tagged`` — one
    bins-cardinality aggregation; probabilities are exact count
    ratios and the only float reduction folds over the bucket-sorted
    array (ln is the one transcendental, tolerated under the ≥6dp
    output round, the BM25 precedent).

    Output one row: ``(n_ref, n_cur, js_divergence, js_distance)``
    in nats — NULL when either side is empty.
    """
    import math  # noqa: F401  (documentation parity with SQL's ln)

    tagged = df.filter(is_ref.isNotNull()).select(
        bucketize(F.col(value_col).cast("double"), lo, hi, bins).alias(
            "bucket"
        ),
        F.when(is_ref, 1).otherwise(0).alias("__is_ref"),
    )
    counts = (
        tagged.groupBy("bucket")
        .agg(
            F.count(F.when(F.col("__is_ref") == 1, 1)).alias("n_ref"),
            F.count(F.when(F.col("__is_ref") == 0, 1)).alias("n_cur"),
        )
        .filter(F.col("bucket").isNotNull())
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("bucket").alias("b"),
                F.col("n_ref").cast("double").alias("r"),
                F.col("n_cur").cast("double").alias("c"),
            )
        )
    )
    agg = (
        counts.agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
            arr.alias("__arr"),
        )
        .withColumn("__tr", F.col("n_ref").cast("double"))
        .withColumn("__tc", F.col("n_cur").cast("double"))
    )
    jsd = F.aggregate(
        F.expr(
            "transform(__arr, x -> "
            "(CASE WHEN x.r > 0 THEN 0.5 * (x.r / __tr)"
            " * ln((x.r / __tr)"
            "      / ((x.r / __tr + x.c / __tc) / 2.0)) ELSE 0.0 END)"
            " + (CASE WHEN x.c > 0 THEN 0.5 * (x.c / __tc)"
            " * ln((x.c / __tc)"
            "      / ((x.r / __tr + x.c / __tc) / 2.0)) ELSE 0.0 END))"
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    return agg.select(
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(F.when(ok, jsd), round_dp).alias("js_divergence"),
        F.round(
            F.when(ok, F.sqrt(F.greatest(jsd, F.lit(0.0)))), round_dp
        ).alias("js_distance"),
    )


def hellinger_distance(
    df: DataFrame,
    is_ref: Column,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    round_dp: int = 9,
) -> DataFrame:
    """Binned Hellinger distance between the reference and current
    slices: ``BC = Σ√(p_i·q_i)`` (the Bhattacharyya coefficient),
    ``H = √(1 − BC)`` — a bounded [0,1] proper metric. Unlike JSD's
    ``ln``, ``sqrt`` is an IEEE exactly-rounded primitive, so the
    whole computation is engine-exact and reports at 9dp with no
    transcendental tolerance; empty buckets contribute their defined
    0 (√0), no smoothing constant.

    Same single-scan tagged shape as ``js_divergence`` — one
    bins-cardinality aggregation; probabilities are exact count
    ratios and the only float reduction folds over the bucket-sorted
    array.

    Output one row: ``(n_ref, n_cur, bhattacharyya, hellinger)`` —
    NULL when either side is empty.
    """
    tagged = df.filter(is_ref.isNotNull()).select(
        bucketize(F.col(value_col).cast("double"), lo, hi, bins).alias(
            "bucket"
        ),
        F.when(is_ref, 1).otherwise(0).alias("__is_ref"),
    )
    counts = (
        tagged.groupBy("bucket")
        .agg(
            F.count(F.when(F.col("__is_ref") == 1, 1)).alias("n_ref"),
            F.count(F.when(F.col("__is_ref") == 0, 1)).alias("n_cur"),
        )
        .filter(F.col("bucket").isNotNull())
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("bucket").alias("b"),
                F.col("n_ref").cast("double").alias("r"),
                F.col("n_cur").cast("double").alias("c"),
            )
        )
    )
    agg = (
        counts.agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
            arr.alias("__arr"),
        )
        .withColumn("__tr", F.col("n_ref").cast("double"))
        .withColumn("__tc", F.col("n_cur").cast("double"))
    )
    bc = F.aggregate(
        F.expr(
            "transform(__arr, x -> "
            "sqrt((x.r / __tr) * (x.c / __tc)))"
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    return agg.select(
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(F.when(ok, bc), round_dp).alias("bhattacharyya"),
        F.round(
            F.when(
                ok,
                F.sqrt(F.greatest(F.lit(1.0) - bc, F.lit(0.0))),
            ),
            round_dp,
        ).alias("hellinger"),
    )


def wasserstein_report(
    df: DataFrame,
    is_ref: Column,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Binned Wasserstein-1 (earth-mover) drift — the metric PSI and KS
    miss: PSI is support-sensitive but magnitude-blind (a one-bucket
    shift and a nine-bucket shift with equal mass score similarly), KS
    only sees the single worst CDF gap; W1 integrates |CDF_ref −
    CDF_cur| over the range, so it scales with HOW FAR the mass moved
    in value units. Same single-scan tagged shape as
    ``psi_report_tagged`` (one bins-cardinality shuffle); the CDFs come
    from ordered windows over the bucket table (bounded rows).

    Output: (bucket, p_ref, p_cur, cdf_ref, cdf_cur, w1_total) with
    w1_total = Σ |cdf gap| · bin_width repeated per row, 6dp."""
    width = (hi - lo) / bins
    tagged = df.filter(is_ref.isNotNull()).select(
        bucketize(F.col(value_col).cast("double"), lo, hi, bins).alias(
            "bucket"
        ),
        F.when(is_ref, 1).otherwise(0).alias("__is_ref"),
    )
    counts = (
        tagged.groupBy("bucket")
        .agg(
            F.count(F.when(F.col("__is_ref") == 1, 1)).alias("n_ref"),
            F.count(F.when(F.col("__is_ref") == 0, 1)).alias("n_cur"),
        )
        .filter(F.col("bucket").isNotNull())
    )
    tot = bounded_global_partition("bucket")
    cum = bounded_global_window("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_p = counts.select(
        "bucket",
        (F.col("n_ref") / F.sum("n_ref").over(tot)).alias("__pr"),
        (F.col("n_cur") / F.sum("n_cur").over(tot)).alias("__pc"),
    )
    ordered = bounded_global_window("bucket")
    with_cdf = with_p.select(
        "bucket",
        F.round("__pr", 6).alias("p_ref"),
        F.round("__pc", 6).alias("p_cur"),
        F.sum("__pr").over(cum).alias("__cr"),
        F.sum("__pc").over(cum).alias("__cc"),
        # a bucket's CDF gap holds until the NEXT PRESENT bucket — empty
        # buckets between two present ones carry the same gap and must
        # be integrated, so each row weights its gap by the span to its
        # successor (the last row spans to the grid end)
        (
            F.lead("bucket", 1, bins).over(ordered) - F.col("bucket")
        ).alias("__span"),
    )
    w1 = bounded_global_partition("bucket")
    return with_cdf.select(
        "bucket",
        "p_ref",
        "p_cur",
        F.round("__cr", 6).alias("cdf_ref"),
        F.round("__cc", 6).alias("cdf_cur"),
        F.round(
            F.sum(
                F.abs(F.col("__cr") - F.col("__cc")) * F.col("__span")
            ).over(w1)
            * F.lit(width),
            6,
        ).alias("w1_total"),
    )
