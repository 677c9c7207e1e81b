"""Hypothesis property tests for the round-5 second-wave operators:
invariants for ANY input, complementing the fixed-dataset oracles.

- ewma_window lies within [min, max] of the contributing values and
  matches pandas' adjust=True ewm when the window covers the series
- global_rank is always the permutation 1..n agreeing with sorted order
- association_rules: support <= both confidences' marginals, lift > 0,
  and n_ab is bounded by each item's user count
- semantic_dedup keeps exactly one survivor among identical vectors
- ngram_lm bits_per_gram is non-negative (probabilities <= 1)
"""

from __future__ import annotations

import pytest

# hypothesis/property sweeps with many Spark jobs: the heavy lane
pytestmark = pytest.mark.slow

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from icnarc_to_philips_linkage_spark.operators import similarity, text
from icnarc_to_philips_linkage_spark.operators.events import association_rules
from icnarc_to_philips_linkage_spark.operators.scale import global_rank
from icnarc_to_philips_linkage_spark.operators.timeseries import ewma_window

SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


@settings(**SETTINGS)
@given(
    xs=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=25,
    ),
    alpha=st.floats(min_value=0.05, max_value=0.95),
)
def test_ewma_bounded_and_matches_pandas_when_window_covers(spark, xs, alpha):
    import pandas as pd

    rows = [(1, i, float(v), i) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, ts long, x double, rid long")
    got = [
        r.ewma
        for r in ewma_window(
            df, "k", "ts", "x", alpha=alpha, window=40, tiebreak="rid"
        )
        .orderBy("ts")
        .collect()
    ]
    want = pd.Series(xs).ewm(alpha=alpha, adjust=True).mean().tolist()
    for i, (g, w) in enumerate(zip(got, want)):
        prefix = xs[: i + 1]
        assert min(prefix) - 1e-6 <= g <= max(prefix) + 1e-6
        assert math.isclose(g, round(w, 6), rel_tol=1e-4, abs_tol=1e-4)


@settings(**SETTINGS)
@given(
    scores=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=40
    )
)
def test_global_rank_permutation_agrees_with_sorted(spark, scores):
    rows = [(i, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "id long, s long").repartition(4)
    out = global_rank(df, ["s", "id"], rank_col="rank").collect()
    assert sorted(r.rank for r in out) == list(range(1, len(scores) + 1))
    by_rank = [
        (r.s, r.id) for r in sorted(out, key=lambda r: r.rank)
    ]
    assert by_rank == sorted(by_rank)


@settings(**SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_association_rules_invariants(spark, pairs):
    df = spark.createDataFrame(pairs, "user_id long, event_type string")
    inc = {(u, i) for u, i in pairs}
    marg = {}
    for _, i in inc:
        marg[i] = marg.get(i, 0) + 1
    for r in association_rules(df).collect():
        assert r.n_ab <= min(marg[r.item_a], marg[r.item_b])
        assert 0 < r.support <= 1
        assert 0 < r.conf_a_to_b <= 1 and 0 < r.conf_b_to_a <= 1
        assert r.lift > 0
        assert r.item_a < r.item_b


@settings(**SETTINGS)
@given(
    n_copies=st.integers(min_value=2, max_value=6),
    base=st.lists(
        st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
)
def test_semantic_dedup_one_survivor_among_identicals(spark, n_copies, base):
    if all(abs(x) < 1e-6 for x in base):
        base = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, [float(x) for x in base]) for i in range(n_copies)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.semantic_dedup(
        df, threshold=0.999, n_planes=3, dim=4
    ).collect()
    kept = [r.vec_id for r in out if r.kept]
    assert kept == [0]  # exactly the smallest id survives


@settings(**SETTINGS)
@given(
    ts=st.lists(
        st.text(alphabet=" abcdefgh", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )
)
def test_ngram_lm_bits_nonnegative(spark, ts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "doc_id long, text string"
    )
    for r in text.ngram_lm_score(df).collect():
        if r.bits_per_gram is not None:
            assert r.bits_per_gram >= 0
        else:
            assert r.n_grams == 0
