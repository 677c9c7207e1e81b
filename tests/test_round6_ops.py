"""Round-6 operator tests: perceptual-hash image near-dup, event
transition matrix, lexical diversity, distributed NTILE equivalence,
Benford digits, multiset intersect."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from tests.test_llm_ops import _make_png


def _gradient_rows(w, h, f):
    return [[(f(x, y) % 256,) * 3 for x in range(w)] for y in range(h)]


def test_perceptual_dhash_stable_under_noise_and_distinct_for_other():
    """The dHash of a lightly-perturbed image stays within a small
    Hamming distance of the original; a structurally different image
    lands far away."""
    import numpy as np

    from icnarc_to_philips_linkage_spark.operators.multimodal import (
        _dhash64,
        _png_pixels,
    )

    w = h = 32
    base = _gradient_rows(w, h, lambda x, y: x * 6 + y * 2)
    noisy = [
        [
            tuple(min(255, v + ((x * 7 + y * 13) % 3)) for v in px)
            for x, px in enumerate(row)
        ]
        for y, row in enumerate(base)
    ]
    other = _gradient_rows(w, h, lambda x, y: (x * 97 + y * 31) ** 2 // 7)

    def dh(rows):
        png = _make_png(w, h, rows, color_type=2)
        wd, ht, ch, flat = _png_pixels(png)
        return _dhash64(flat, wd, ht, ch)

    a, b, c = dh(base), dh(noisy), dh(other)
    assert a is not None and b is not None and c is not None

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(a, b) <= 3
    assert ham(a, c) > 10


def test_phash_neardup_banding_finds_all_within_budget(spark):
    """Pigeonhole completeness: every pair within max_hamming appears —
    banded candidate generation must not lose pairs — and nothing
    beyond the budget is reported."""
    from icnarc_to_philips_linkage_spark.operators.multimodal import (
        phash_neardup,
    )

    rng = random.Random(42)
    base = rng.getrandbits(63)
    hashes = [base]
    # neighbors at controlled distances 1..6
    for d in range(1, 7):
        v = base
        for bit in rng.sample(range(64), d):
            v ^= 1 << bit
        hashes.append(v)
    hashes += [rng.getrandbits(63) for _ in range(20)]

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    df = spark.createDataFrame(
        [(i, signed(h)) for i, h in enumerate(hashes)],
        "media_id long, phash long",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup(df, max_hamming=3).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin(a ^ b).count("1")
        if d <= 3:
            want[(i, j)] = d
    assert got == want


def test_phash_neardup_end_to_end_on_pngs(spark):
    from icnarc_to_philips_linkage_spark.operators.multimodal import (
        perceptual_dhash,
        phash_neardup,
    )

    w = h = 32
    base = _gradient_rows(w, h, lambda x, y: x * 6 + y * 2)
    noisy = [
        [
            tuple(min(255, v + ((x + y) % 2)) for v in px)
            for x, px in enumerate(row)
        ]
        for y, row in enumerate(base)
    ]
    other = _gradient_rows(w, h, lambda x, y: (x * 211 + y * 89) // 3)
    data = [
        (1, "image", bytearray(_make_png(w, h, base))),
        (2, "image", bytearray(_make_png(w, h, noisy))),
        (3, "image", bytearray(_make_png(w, h, other))),
        (4, "image", bytearray(b"not a png")),
    ]
    df = spark.createDataFrame(
        data, "media_id long, media_type string, payload binary"
    )
    hashes = perceptual_dhash(df)
    out = {r.media_id: r.phash for r in hashes.collect()}
    assert out[4] is None and out[1] is not None
    pairs = {(r.id_a, r.id_b) for r in phash_neardup(hashes, 6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_transition_matrix_hand_case(spark):
    from icnarc_to_philips_linkage_spark.operators.events import (
        transition_matrix,
    )

    rows = [
        (1, "a", "2024-01-01 00:00:00", 1),
        (1, "b", "2024-01-01 00:01:00", 2),
        (1, "a", "2024-01-01 00:02:00", 3),
        (1, "c", "2024-01-01 00:03:00", 4),
        (2, "a", "2024-01-01 00:00:00", 5),
        (2, "b", "2024-01-01 00:01:00", 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.event_type, r.next_type): (r.n_transitions, r.prob)
        for r in transition_matrix(df).collect()
    }
    # user1: a->b, b->a, a->c ; user2: a->b  (no cross-user pair)
    assert got[("a", "b")] == (2, 0.666667)  # round(2/3, 6)
    assert got[("a", "c")] == (1, 0.333333)
    assert got[("b", "a")] == (1, 1.0)
    assert ("b", "c") not in got and ("c", "a") not in got


def test_lexical_diversity_counts(spark):
    from icnarc_to_philips_linkage_spark.operators.text import (
        lexical_diversity,
    )

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in lexical_diversity(df).collect()}
    assert (got[1].n_tokens, got[1].n_types, got[1].ttr) == (5, 2, 0.4)
    assert (got[2].n_tokens, got[2].n_types, got[2].ttr) == (4, 4, 1.0)


def test_decile_formula_matches_ntile_semantics(spark):
    """The rank→bucket arithmetic must equal NTILE(k) for awkward n:
    the extra rows land in the FIRST n mod k buckets (NOT spread
    evenly, which floor((rank-1)*k/n) would do). Checked directly
    against Spark's own ntile window for several n, including n < k."""
    from icnarc_to_philips_linkage_spark.operators.scale import global_rank
    from pyspark.sql import Window

    k = 10
    for n in [23, 7, 40, 101]:
        df = spark.createDataFrame(
            [(i, i * 7 % n) for i in range(n)], "id long, v long"
        )
        ranked = global_rank(df, ["v", "id"])
        q, m = divmod(n, k)
        cut = (q + 1) * m
        r = F.col("rank")
        bucket = F.when(
            r <= cut, F.floor((r - 1) / F.lit(q + 1)) + 1
        ).otherwise(
            F.lit(m) + F.floor((r - 1 - cut) / F.lit(max(q, 1))) + 1
        )
        got = {
            row.id: row.b
            for row in ranked.select(
                "id", bucket.cast("int").alias("b")
            ).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            row.id: row.b
            for row in df.select(
                "id", F.ntile(k).over(w).alias("b")
            ).collect()
        }
        assert got == want, f"n={n}"


def test_benford_digit_extraction_handles_sub_one_values(spark):
    """First SIGNIFICANT digit: leading zeros of sub-1 values are
    skipped by the [1-9] extraction."""
    digit = F.regexp_extract(
        F.col("v").cast("string"), "[1-9]", 0
    ).cast("int")
    df = spark.createDataFrame(
        [(0.05,), (123.4,), (0.87,), (9000.0,)], "v double"
    )
    got = [r.d for r in df.select(digit.alias("d")).collect()]
    assert got == [5, 1, 8, 9]


def test_intersect_all_keeps_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k long")
    b = spark.createDataFrame([(1,), (1,), (3,)], "k long")
    got = sorted(r.k for r in a.intersectAll(b).collect())
    assert got == [1, 1]
