"""Hypothesis property tests for the round-5 operators (SURVEY §5.4
strategy): invariants that must hold for ANY input, complementing the
oracle differentials' fixed-dataset checks.

- normalize_expr is idempotent (canonical forms are fixed points)
- PSI is non-negative and symmetric; binned KS lies in [0, 1]
- mutual information is non-negative
- funnel step counts are monotonically non-increasing
- containment scores lie in (0, 1] and pairs are canonically ordered
"""

from __future__ import annotations

import pytest

# hypothesis/property sweeps with many Spark jobs: the heavy lane
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import drift, profile, retrieval
from icnarc_to_philips_linkage_spark.operators.text import normalize_expr

SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

texts = st.lists(
    st.text(
        alphabet=" \t\nabcXYZ09.,!?-_",
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@settings(**SETTINGS)
@given(ts=texts)
def test_normalize_expr_idempotent(spark, ts):
    df = spark.createDataFrame([(t,) for t in ts], ["t"])
    once = df.select(normalize_expr("t").alias("n"))
    twice = once.select(normalize_expr("n").alias("n"))
    assert [r["n"] for r in once.collect()] == [
        r["n"] for r in twice.collect()
    ]
    # canonical form never has leading/trailing/double spaces or uppers
    for (n,) in once.collect():
        assert n == n.strip() and "  " not in n and n == n.lower()


values = st.lists(
    st.integers(min_value=0, max_value=99), min_size=1, max_size=40
)


@settings(**SETTINGS)
@given(a=values, b=values)
def test_psi_nonnegative_symmetric_ks_bounded(spark, a, b):
    ra = spark.createDataFrame([(float(v),) for v in a], ["v"])
    rb = spark.createDataFrame([(float(v),) for v in b], ["v"])
    fwd = drift.psi_report(ra, rb, "v", 0.0, 100.0, bins=5).collect()
    rev = drift.psi_report(rb, ra, "v", 0.0, 100.0, bins=5).collect()
    # each PSI term (p-q)·ln(p/q) >= 0, so the total is too (up to 6dp)
    assert fwd[0]["psi_total"] >= -1e-6
    assert 0.0 <= fwd[0]["ks_stat"] <= 1.0
    # PSI and KS are symmetric in the two slices
    assert fwd[0]["psi_total"] == rev[0]["psi_total"]
    assert fwd[0]["ks_stat"] == rev[0]["ks_stat"]


pairs = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]), st.sampled_from(["x", "y"])
    ),
    min_size=1,
    max_size=30,
)


@settings(**SETTINGS)
@given(ps=pairs)
def test_mutual_information_nonnegative(spark, ps):
    df = spark.createDataFrame(ps, ["x", "y"])
    rows = profile.mutual_information(df, "x", "y").collect()
    assert rows[0]["mi_total"] >= -1e-6  # MI >= 0 up to 6dp rounding


events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),            # user
        st.integers(min_value=0, max_value=50),           # minute
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(evs=events)
def test_funnel_counts_monotone_nonincreasing(spark, evs):
    from datetime import datetime, timedelta

    from icnarc_to_philips_linkage_spark.operators.events import funnel_steps

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + timedelta(minutes=m), t) for u, m, t in evs],
        ["user_id", "ts", "event_type"],
    )
    out = sorted(
        funnel_steps(df, ["view", "click", "purchase"]).collect(),
        key=lambda r: r["step_order"],
    )
    counts = [r["n_users"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(0 <= r["pct_of_first"] <= 1.0 for r in out)


docs = st.lists(
    st.lists(
        st.sampled_from(["w1", "w2", "w3", "w4", "q"]),
        min_size=1,
        max_size=12,
    ),
    min_size=2,
    max_size=5,
)


@settings(**SETTINGS)
@given(ds=docs)
def test_containment_bounds_and_canonical_order(spark, ds):
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(ds)],
        ["doc_id", "text"],
    )
    out = retrieval.containment_pairs(df, n=3, threshold=0.0).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert 0.0 < r["cont_a_in_b"] <= 1.0
        assert 0.0 < r["cont_b_in_a"] <= 1.0
        assert r["n_common"] >= 1
