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
