"""Report operators (UD3) + hypothesis property tests (SURVEY §5.4):
dedup idempotence, LOS conservation, inner-join count accounting."""

from __future__ import annotations

import datetime as dt

import pytest

# multi-job property/report sweeps: the heavy lane
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import dedup, reports


def ts(h: int) -> dt.datetime:
    return dt.datetime(2016, 1, 1) + dt.timedelta(hours=h)


@pytest.fixture(scope="module")
def philips_merged(spark):
    rows = [
        Row(encounterId=1, age=40, gender="Male", inTime=ts(0), outTime=ts(48),
            **{"lengthOfStay (mins)": 2880.0}),
        Row(encounterId=2, age=60, gender="Female", inTime=ts(0), outTime=ts(24),
            **{"lengthOfStay (mins)": 1440.0}),
        Row(encounterId=3, age=50, gender=None, inTime=ts(0), outTime=ts(96),
            **{"lengthOfStay (mins)": 5760.0}),
        Row(encounterId=4, age=70, gender="Male", inTime=ts(0), outTime=ts(72),
            **{"lengthOfStay (mins)": 4320.0}),
    ]
    return spark.createDataFrame(rows)


def test_philips_summary(spark, philips_merged):
    r = reports.philips_summary(philips_merged).collect()[0]
    assert r.n_stays == 4
    assert r.age_median == 55.0  # np.percentile linear interpolation
    assert r.los_days_median == 2.5
    assert r.n_male == 2 and r.male_rate == 0.5
    assert r.n_gender_missing == 1 and r.gender_missing_rate == 0.25


def test_df_summary_one_pass(spark, philips_merged):
    out = reports.df_summary(philips_merged.select("age", "gender"))
    rows = {r.column: r for r in out.collect()}
    assert rows["gender"].n_non_null == 3
    assert rows["gender"].n_distinct == 2
    assert rows["age"].n_rows == 4


# ------------------------------------------------------- property tests

fragments = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),      # encounterId
        st.integers(min_value=0, max_value=1000),   # LOS mins
        st.integers(min_value=0, max_value=240),    # inTime offset hours
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(frags=fragments)
def test_dedup_conserves_los_and_is_idempotent(spark, frags):
    rows = [
        Row(encounterId=e, inTime=ts(off), outTime=ts(off + 1),
            **{"lengthOfStay (mins)": float(los)})
        for e, los, off in frags
    ]
    df = spark.createDataFrame(rows)
    once = dedup.dedup_merge(
        df, ["encounterId"],
        {"inTime": "min", "outTime": "max", "lengthOfStay (mins)": "sum"},
        order_col="inTime",
    )
    # conservation
    total_before = df.agg(F.sum("`lengthOfStay (mins)`")).collect()[0][0]
    total_after = once.agg(F.sum("`lengthOfStay (mins)`")).collect()[0][0]
    assert total_before == total_after
    # keys unique after merge
    assert once.count() == len({e for e, _, _ in frags})
    # idempotence: merging the merged table changes nothing
    twice = dedup.dedup_merge(
        once, ["encounterId"],
        {"inTime": "min", "outTime": "max", "lengthOfStay (mins)": "sum"},
        order_col="inTime",
    )
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


keysets = st.tuples(
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=15),
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=15),
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ks=keysets)
def test_inner_join_count_accounting(spark, ks):
    """|A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k) — the join-accounting invariant
    behind the reference's validation() row-count checks."""
    left, right = ks
    from collections import Counter

    expected = sum(
        c * Counter(right)[k] for k, c in Counter(left).items()
    )
    a = spark.createDataFrame([Row(k=x) for x in left], "k int")
    b = spark.createDataFrame([Row(k=x) for x in right], "k int")
    got = a.join(b, on="k", how="inner").count()
    assert got == expected
