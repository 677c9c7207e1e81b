"""Approximate/sketch variants (the 100 TB path of A5/A8): accuracy
within documented bounds of the exact operators on real testdata."""

from __future__ import annotations

import pytest

from icnarc_to_philips_linkage_spark.operators import profile
from icnarc_to_philips_linkage_spark.plans.tables import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def lineitem(spark):
    return load(spark, SF_SMOKE, "lineitem").cache()


def test_hll_completeness_within_bounds(spark, lineitem):
    exact = {
        r.l_returnflag: r.n_entities
        for r in profile.completeness(
            lineitem, "l_returnflag", "l_orderkey"
        ).collect()
    }
    approx = {
        r.l_returnflag: r.n_entities
        for r in profile.completeness(
            lineitem, "l_returnflag", "l_orderkey", approx=True
        ).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, n, approx[k])


def test_approx_percentiles_close_to_exact(spark, lineitem):
    exact = profile.percentiles_exact(lineitem, "l_extendedprice").collect()[0]
    approx = profile.percentiles_approx(
        lineitem, "l_extendedprice", accuracy=10000
    ).collect()[0]
    for c in ("p25", "p50", "p75"):
        assert abs(approx[c] - exact[c]) / exact[c] < 0.01, (c, exact[c], approx[c])


def test_histogram_bin_totals(spark, lineitem):
    hist = profile.histogram(lineitem, "l_extendedprice", bins=20).collect()
    assert sum(r.n for r in hist) == lineitem.count()
    assert {r.bin for r in hist} <= set(range(20))


def test_hll_partitioned_sketch_merge(spark, lineitem):
    """Per-group sketches union-merged ≈ global exact distinct."""
    exact = lineitem.select("l_orderkey").distinct().count()
    row = profile.hll_partitioned_distinct(
        lineitem, "l_returnflag", "l_orderkey"
    ).collect()[0]
    assert row.n_partitions == 3
    assert abs(row.distinct_estimate - exact) / exact < 0.05, (
        row.distinct_estimate, exact)


def test_equi_depth_histogram_balanced_bins(spark, lineitem):
    """Quantile bins hold ~equal counts even on skewed data, cover all
    rows, and bin extents tile the value range in order."""
    n_rows = lineitem.count()
    hist = sorted(
        profile.equi_depth_histogram(
            lineitem, "l_extendedprice", bins=10, exact=True
        ).collect(),
        key=lambda r: r.bin,
    )
    assert sum(r.n for r in hist) == n_rows
    assert [r.bin for r in hist] == list(range(10))
    # depth balance: every bin within 2x of the ideal tenth
    for r in hist:
        assert n_rows / 20 <= r.n <= n_rows / 5, (r.bin, r.n)
    # bins are ordered, non-overlapping ranges
    for lo, hi in zip(hist, hist[1:]):
        assert lo.bin_max <= hi.bin_min


def test_equi_depth_histogram_approx_mode(spark, lineitem):
    """The percentile_approx scale path lands within a few percent of
    the exact bin depths."""
    n_rows = lineitem.count()
    hist = profile.equi_depth_histogram(
        lineitem, "l_extendedprice", bins=10, exact=False
    ).collect()
    assert sum(r.n for r in hist) == n_rows
    for r in hist:
        assert abs(r.n - n_rows / 10) / (n_rows / 10) < 0.25, (r.bin, r.n)


def test_equi_depth_histogram_defaults_to_approx_sketch(spark, lineitem):
    """Regression (VERDICT r3): the DEFAULT boundary aggregate must be
    the mergeable percentile_approx sketch, not exact percentile (which
    buffers every value in one aggregation buffer — a scale-killer when
    callers take the default)."""
    default_plan = profile.equi_depth_histogram(
        lineitem, "l_extendedprice"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx(" in default_plan, default_plan
    assert "percentile(" not in default_plan.replace("percentile_approx(", "")
    exact_plan = profile.equi_depth_histogram(
        lineitem, "l_extendedprice", exact=True
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile(" in exact_plan.replace("percentile_approx(", "")


def test_standardize_semantics(spark):
    """Hand-checked z-scores; degenerate (constant / singleton) groups
    yield NULL."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(g="a", x=1.0), Row(g="a", x=2.0), Row(g="a", x=3.0),
         Row(g="b", x=5.0), Row(g="b", x=5.0),   # zero variance
         Row(g="c", x=7.0)]                      # singleton
    )
    out = {(r.g, r.x): r.zscore
           for r in profile.standardize(df, ["g"], "x").collect()}
    # group a: mu=2, pop sd=sqrt(2/3)
    sd = (2 / 3) ** 0.5
    assert out[("a", 1.0)] == round(-1 / sd, 6)
    assert out[("a", 2.0)] == 0.0
    assert out[("a", 3.0)] == round(1 / sd, 6)
    assert out[("b", 5.0)] is None and out[("c", 7.0)] is None


def test_kll_quantiles_close_to_exact_and_mergeable(spark, lineitem):
    """KLL sketch quantiles land within a few percent RANK error of the
    exact values, and per-group sketches folded by the binary merge
    give (approximately) the global answer — the property that makes a
    sketch column a rolling 100 TB profile."""
    exact = profile.percentiles_exact(
        lineitem, "l_extendedprice", (0.25, 0.5, 0.75)
    ).collect()[0]
    vals = sorted(
        r.l_extendedprice
        for r in lineitem.select("l_extendedprice").collect()
        if r.l_extendedprice is not None
    )
    n = len(vals)

    def rank_err(est, p):
        import bisect

        return abs(bisect.bisect_left(vals, est) / n - p)

    direct = profile.kll_quantiles(
        lineitem, "l_extendedprice", (0.25, 0.5, 0.75)
    ).collect()[0]
    merged = profile.kll_quantiles_merged(
        lineitem, ["l_returnflag"], "l_extendedprice", (0.25, 0.5, 0.75)
    ).collect()[0]
    for row in (direct, merged):
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            err = rank_err(getattr(row, col), p)
            assert err < 0.05, (col, getattr(row, col), getattr(exact, col), err)


def test_kll_quantiles_empty_and_allnull_yield_nulls(spark):
    """Regression (r4 review): zero rows / all-NULL values must produce
    NULL quantiles like the sibling percentile paths — not a
    KLL_INVALID_INPUT_SKETCH_BUFFER crash (a rolling profile job must
    survive an empty day)."""
    from pyspark.sql import functions as F

    empty = spark.range(0).select(
        F.col("id").cast("double").alias("v"), F.lit("g").alias("k")
    )
    allnull = spark.range(5).select(
        F.lit(None).cast("double").alias("v"), F.lit("g").alias("k")
    )
    for df in (empty, allnull):
        r1 = profile.kll_quantiles(df, "v").collect()
        assert len(r1) == 1 and all(v is None for v in r1[0])
        r2 = profile.kll_quantiles_merged(df, ["k"], "v").collect()
        assert len(r2) == 1 and all(v is None for v in r2[0])
