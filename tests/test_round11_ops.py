"""Round-11 batch: verdict-r10 tasks (vacuous-oracle repairs, Cox
max_cells guard, Dunn post-hoc, paired bootstrap ΔAUC) and ADVICE-r10
hardenings (pre-collect LIMIT probes, wilcoxon float rejection).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# verdict r10 task 3 / ADVICE r10: pre-collect driver-bounded probes
# ---------------------------------------------------------------------------


def test_cox_max_cells_guard_raises_before_collect(spark):
    """An unquantized continuous covariate must raise, not silently
    collect a corpus-sized (duration, x) cell table."""
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        cox_ph_single,
    )

    df = spark.range(50).select(
        (F.col("id") % 5).alias("dur"),
        F.lit(1).alias("ev"),
        (F.col("id") * 0.001).alias("x"),  # 50 distinct x values
    )
    with pytest.raises(ValueError, match="max_cells"):
        cox_ph_single(df, "dur", "ev", "x", max_cells=10)
    # and the same frame fits a wide-enough contract
    out = cox_ph_single(df, "dur", "ev", "x", max_cells=100).collect()
    assert len(out) == 1 and out[0].n_subjects == 50


def test_bradley_terry_item_probe_raises_before_collect(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        bradley_terry_strengths,
    )

    pairs = spark.range(100).select(
        F.concat(F.lit("i"), F.col("id")).alias("winner"),
        F.concat(F.lit("i"), F.col("id") + 1000).alias("loser"),
    )
    with pytest.raises(ValueError, match="driver-bounded"):
        bradley_terry_strengths(pairs, max_items=16)


def test_plackett_luce_pattern_probe_raises_before_collect(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        plackett_luce_strengths,
    )

    ranks = spark.range(40).select(
        F.array(
            F.concat(F.lit("a"), F.col("id")),
            F.concat(F.lit("b"), F.col("id")),
        ).alias("ranking")
    )
    with pytest.raises(ValueError, match="driver-bounded"):
        plackett_luce_strengths(ranks, "ranking", max_patterns=8)


# ---------------------------------------------------------------------------
# ADVICE r10: wilcoxon_signed_rank rejects non-integer differences
# ---------------------------------------------------------------------------


def test_wilcoxon_rejects_floating_point_differences(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        wilcoxon_signed_rank,
    )

    df = spark.createDataFrame(
        [(1.5, 1.0), (2.25, 1.0)], "a double, b double"
    )
    with pytest.raises(ValueError, match="integer-valued"):
        wilcoxon_signed_rank(df, "a", "b")


# ---------------------------------------------------------------------------
# verdict r10 task 4: Dunn's pairwise post-hoc
# ---------------------------------------------------------------------------


def _hand_dunn(groups: dict[str, list[float]]):
    """Pure-Python Dunn z/p for the expected side of the test."""
    import math

    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    # tie-averaged ranks
    rank: dict[float, float] = {}
    i = 0
    tie_term = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        t = j - i
        rank[pooled[i]] = (i + 1 + j) / 2.0
        tie_term += t * t * t - t
        i = j
    sigma2 = n * (n + 1) / 12.0 - tie_term / (12.0 * (n - 1))
    out = {}
    gs = sorted(groups)
    for ai in range(len(gs)):
        for bi in range(ai + 1, len(gs)):
            a, b = gs[ai], gs[bi]
            ma = sum(rank[v] for v in groups[a]) / len(groups[a])
            mb = sum(rank[v] for v in groups[b]) / len(groups[b])
            z = (ma - mb) / math.sqrt(
                sigma2 * (1.0 / len(groups[a]) + 1.0 / len(groups[b]))
            )
            out[(a, b)] = (ma, mb, z)
    return out


def test_dunn_posthoc_matches_hand_computation(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        dunn_posthoc,
    )

    groups = {
        "a": [1, 2, 3, 4, 5],
        "b": [3, 4, 5, 6, 7],
        "c": [6, 7, 8, 9, 10],
    }
    df = spark.createDataFrame(
        [(g, v) for g, vs in groups.items() for v in vs],
        "g string, v int",
    )
    got = {
        (r.group_a, r.group_b): r
        for r in dunn_posthoc(df, "g", "v").collect()
    }
    want = _hand_dunn(groups)
    assert set(got) == set(want)
    for pair, (ma, mb, z) in want.items():
        r = got[pair]
        assert r.mean_rank_a == pytest.approx(ma, abs=1e-9)
        assert r.mean_rank_b == pytest.approx(mb, abs=1e-9)
        assert r.z == pytest.approx(z, abs=1e-6)
        assert 0.0 <= r.p_value <= 1.0
    # a-vs-c is the clear separation; a-vs-b is not
    assert got[("a", "c")].p_value < 0.01 < got[("a", "b")].p_value


def test_dunn_posthoc_all_tied_gives_null_z(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        dunn_posthoc,
    )

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, v int"
    )
    rows = dunn_posthoc(df, "g", "v").collect()
    assert len(rows) == 1
    assert rows[0].z is None and rows[0].p_value is None


# ---------------------------------------------------------------------------
# verdict r10 task 5: paired bootstrap ΔAUC vs DeLong
# ---------------------------------------------------------------------------


def test_paired_bootstrap_brackets_delong_interval(spark):
    """On planted data where scorer 1 clearly beats scorer 2, the
    bootstrap CI and DeLong's z-implied 95% interval must agree on
    the same difference: full-sample deltas identical, intervals
    overlapping, and each point estimate inside the other's CI."""
    import math

    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        delong_paired_auc,
        paired_bootstrap_delta_auc,
    )

    rows = [
        (
            i,
            (1.0 - i / 200.0) if i < 60 else (0.3 - i / 1000.0),
            0.5 + ((i * 37) % 100) / 200.0,
            1 if i < 60 else 0,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k int, s1 double, s2 double, y int")
    boot = paired_bootstrap_delta_auc(df, "s1", "s2", "y", "k").collect()[0]
    dl = delong_paired_auc(df, "s1", "s2", "y").collect()[0]
    assert boot.delta_auc == pytest.approx(dl.delta_auc, abs=2e-9)
    half = 1.96 * math.sqrt(dl.var_delta)
    dl_lo, dl_hi = dl.delta_auc - half, dl.delta_auc + half
    assert boot.ci_lo <= dl.delta_auc <= boot.ci_hi
    assert dl_lo <= boot.delta_med <= dl_hi
    assert max(boot.ci_lo, dl_lo) < min(boot.ci_hi, dl_hi)
    assert boot.ci_lo < boot.delta_med < boot.ci_hi


def test_paired_bootstrap_identical_scorers_delta_zero(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        paired_bootstrap_delta_auc,
    )

    rows = [(i, i / 50.0, i / 50.0, 1 if i % 3 == 0 else 0) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, s1 double, s2 double, y int")
    r = paired_bootstrap_delta_auc(df, "s1", "s2", "y", "k").collect()[0]
    assert r.delta_auc == 0.0
    assert r.ci_lo == 0.0 and r.ci_hi == 0.0 and r.delta_med == 0.0


def test_wilcoxon_accepts_integer_and_decimal_scale0(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        wilcoxon_signed_rank,
    )

    ints = spark.createDataFrame(
        [(5, 3), (4, 6), (7, 7)], "a int, b int"
    )
    r = wilcoxon_signed_rank(ints, "a", "b").collect()[0]
    assert r.n_pairs == 3 and r.n_nonzero == 2

    dec = ints.select(
        F.col("a").cast("decimal(18,0)").alias("a"),
        F.col("b").cast("decimal(18,0)").alias("b"),
    )
    r2 = wilcoxon_signed_rank(dec, "a", "b").collect()[0]
    assert r2.w_plus == r.w_plus and r2.z == r.z
