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


# ---------------------------------------------------------------------------
# round-11 batch 2: blocked/ordered/stratified tests + calibration + drift
# ---------------------------------------------------------------------------


def test_friedman_classic_no_ties(spark):
    """Ranks are (3,2,1) in every block -> R = (12,8,4), chi2 = 8."""
    from icnarc_to_philips_linkage_spark.operators.profile import (
        friedman_test,
    )

    vals = {1: (9, 4, 1), 2: (6, 5, 2), 3: (8, 7, 3), 4: (7, 5.5, 2.5)}
    data = [
        (b, t, float(v))
        for b, vs in vals.items()
        for t, v in zip(("t1", "t2", "t3"), vs)
    ]
    df = spark.createDataFrame(data, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r.k == 3 and r.n_blocks == 4 and r.chi2_f == 8.0


def test_friedman_incomplete_blocks_dropped_and_ties(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        friedman_test,
    )

    data = [
        (1, "t1", 1.0), (1, "t2", 1.0), (1, "t3", 2.0),  # tie in block
        (2, "t1", 3.0), (2, "t2", 1.0), (2, "t3", 2.0),
        (3, "t1", 5.0), (3, "t2", 4.0),  # incomplete -> dropped
    ]
    df = spark.createDataFrame(data, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r.n_blocks == 2
    # block1 doubled ranks: t1/t2 tied at avg 1.5 (r2=3), t3 r2=6
    # block2: t2=1,t3=2,t1=3. R = (1.5+3, 1.5+1, 3+2) = (4.5, 2.5, 5)
    # chi2_raw = 12/(2*3*4)*(20.25+6.25+25) - 3*2*4 = 25.75 - 24 = 1.75
    # tie term: one pair tied -> 2^3-2 = 6; C = 1 - 6/(2*3*8) = 0.875
    assert r.chi2_f == pytest.approx(1.75 / 0.875, abs=1e-6)


def test_cochran_q_hand_example(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        cochran_q,
    )

    rows = [
        (1, 1, 1), (1, 1, 0), (1, 0, 0), (0, 1, 1), (1, 1, 1),
        (0, 0, 0), (1, 1, 0), (0, 1, 0), (1, 0, 0), (1, 1, 1),
    ]
    data = [
        (i, f"t{j}", x) for i, r in enumerate(rows) for j, x in enumerate(r)
    ]
    df = spark.createDataFrame(data, "b int, t string, x int")
    r = cochran_q(df, "b", "t", "x").collect()[0]
    # G=(7,7,4), N=18, sumB2=42: Q = 2*(3*114-324)/(3*18-42) = 3.0
    assert r.k == 3 and r.n_blocks == 10 and r.n_success == 18
    assert r.q_stat == 3.0


def test_cochran_q_degenerate_all_ones(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        cochran_q,
    )

    data = [(b, t, 1) for b in range(3) for t in ("t1", "t2")]
    df = spark.createDataFrame(data, "b int, t string, x int")
    r = cochran_q(df, "b", "t", "x").collect()[0]
    assert r.q_stat is None  # kN - sumB^2 = 12 - 12 = 0


def test_mood_median_hand_example(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        mood_median_test,
    )

    md = (
        [("a", v) for v in [1, 2, 3, 4, 5]]
        + [("b", v) for v in [4, 5, 6, 7, 8]]
        + [("c", v) for v in [7, 8, 9, 10, 11]]
    )
    df = spark.createDataFrame(md, "g string, v int")
    r = mood_median_test(df, "g", "v").collect()[0]
    # pooled lower median = 6; above: a=0,b=2,c=5 (tot 7 of 15)
    # chi2 = 4.375 + 0.0892857 + 5.7142857 = 10.178571
    assert r.k == 3 and r.n == 15 and r.grand_median == 6
    assert r.chi2 == pytest.approx(10.178571, abs=1e-6)


def test_jonckheere_matches_bruteforce(spark):
    import itertools
    import math

    from icnarc_to_philips_linkage_spark.operators.profile import (
        jonckheere_trend,
    )

    groups = {
        "a": [1, 2, 3, 4, 5],
        "b": [3, 4, 5, 6, 7],
        "c": [6, 7, 8, 9, 10],
    }
    order = ["a", "b", "c"]
    df = spark.createDataFrame(
        [(g, v) for g, vs in groups.items() for v in vs],
        "g string, v int",
    )
    r = jonckheere_trend(df, "g", "v", order).collect()[0]
    jt = sum(
        1.0 if y > x else (0.5 if y == x else 0.0)
        for i, j in itertools.combinations(range(3), 2)
        for x in groups[order[i]]
        for y in groups[order[j]]
    )
    assert r.jt_stat == jt == 68.5
    # independent variance replay (Kendall S with group-size x-ties)
    vals = sorted(v for vs in groups.values() for v in vs)
    n = len(vals)
    gsz = [len(groups[g]) for g in order]
    from collections import Counter

    tv = Counter(vals).values()
    t1 = lambda xs: sum(t * (t - 1) * (2 * t + 5) for t in xs)
    t2 = lambda xs: sum(t * (t - 1) * (t - 2) for t in xs)
    t3 = lambda xs: sum(t * (t - 1) for t in xs)
    v_s = (
        (n * (n - 1) * (2 * n + 5) - t1(gsz) - t1(tv)) / 18.0
        + t2(gsz) * t2(tv) / (9.0 * n * (n - 1) * (n - 2))
        + t3(gsz) * t3(tv) / (2.0 * n * (n - 1))
    )
    p_pairs = (n * n - sum(g * g for g in gsz)) / 2
    z = (2 * jt - p_pairs) / math.sqrt(v_s)
    assert r.z == pytest.approx(z, abs=1e-6)
    assert r.p_value < 0.01  # clear planted ascending trend


def test_jonckheere_descending_gives_negative_z(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        jonckheere_trend,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 9), ("b", 5), ("b", 4), ("c", 1), ("c", 2)],
        "g string, v int",
    )
    r = jonckheere_trend(df, "g", "v", ["a", "b", "c"]).collect()[0]
    assert r.jt_stat == 0.0 and r.z < 0


def test_cmh_hand_example_and_simpson_guard(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        cmh_test,
    )

    rows = []

    def add(s, e, o, cnt):
        rows.extend([(s, e, o)] * cnt)

    add("s1", True, True, 20)
    add("s1", True, False, 10)
    add("s1", False, True, 10)
    add("s1", False, False, 20)
    add("s2", True, True, 30)
    add("s2", True, False, 30)
    add("s2", False, True, 10)
    add("s2", False, False, 30)
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    r = cmh_test(df, "s", "e", "o").collect()[0]
    # diff = 5 + 6 = 11; var = 900*900/(3600*59) + 60*40*40*60/(1e4*99)
    var = 30 * 30 * 30 * 30 / (3600.0 * 59) + 60 * 40 * 40 * 60 / (
        10000.0 * 99
    )
    assert r.n_strata == 2 and r.n == 160
    assert r.cmh_chi2 == pytest.approx(121.0 / var, abs=1e-4)
    orr = (20 * 20 / 60.0 + 30 * 30 / 100.0) / (
        10 * 10 / 60.0 + 30 * 10 / 100.0
    )
    assert r.mh_or == pytest.approx(orr, abs=1e-5)


def test_hosmer_lemeshow_hand_computation(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        hosmer_lemeshow,
    )

    pts = [
        (0.1, 0), (0.15, 0), (0.2, 1), (0.7, 1),
        (0.75, 0), (0.9, 1), (0.95, 1), (0.5, 0),
    ]
    df = spark.createDataFrame(pts, "p double, y int")
    r = hosmer_lemeshow(df, "p", "y", bins=4).collect()[0]
    # bins (width .25): b0 {.1,.15,.2}: n=3 o1=1 e1=.45
    #                   b2 {.5,.7}:     n=2 o1=1 e1=1.2
    #                   b3 {.75,.9,.95}: n=3 o1=2 e1=2.6
    exp = (
        (1 - 0.45) ** 2 / 0.45 + (2 - 2.55) ** 2 / 2.55
        + (1 - 1.2) ** 2 / 1.2 + (1 - 0.8) ** 2 / 0.8
        + (2 - 2.6) ** 2 / 2.6 + (1 - 0.4) ** 2 / 0.4
    )
    assert r.n == 8 and r.n_bins_used == 3
    assert r.hl_chi2 == pytest.approx(exp, abs=1e-5)


def test_brier_decomposition_identity_on_constant_bins(spark):
    """Scores constant within each bin -> the Murphy identity is
    EXACT: brier = REL - RES + UNC."""
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        brier_decomposition,
    )

    pts = (
        [(0.15, 1)] * 2 + [(0.15, 0)] * 8
        + [(0.85, 1)] * 7 + [(0.85, 0)] * 3
    )
    df = spark.createDataFrame(pts, "p double, y int")
    r = brier_decomposition(df, "p", "y", bins=10).collect()[0]
    assert r.n == 20 and r.n_pos == 9
    assert r.uncertainty == pytest.approx(0.45 * 0.55, abs=1e-9)
    assert r.brier == pytest.approx(
        r.reliability - r.resolution + r.uncertainty, abs=1e-8
    )


def test_js_divergence_disjoint_shift_closed_form(spark):
    """Uniform 0-9 vs uniform 2-11: 2 disjoint buckets each side ->
    JSD = 0.2 ln 2 exactly."""
    import math

    from pyspark.sql import functions as F2

    from icnarc_to_philips_linkage_spark.operators.drift import (
        js_divergence,
    )

    rows = [(True, float(i % 10)) for i in range(100)] + [
        (False, float((i % 10) + 2)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "r boolean, v double")
    r = js_divergence(df, F2.col("r"), "v", 0.0, 12.0, bins=12).collect()[0]
    assert r.n_ref == 100 and r.n_cur == 100
    assert r.js_divergence == pytest.approx(0.2 * math.log(2), abs=1e-6)
    assert r.js_distance == pytest.approx(
        (0.2 * math.log(2)) ** 0.5, abs=1e-6
    )


def test_js_divergence_identical_is_zero(spark):
    from pyspark.sql import functions as F2

    from icnarc_to_philips_linkage_spark.operators.drift import (
        js_divergence,
    )

    rows = [(True, float(i % 5)) for i in range(50)] + [
        (False, float(i % 5)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "r boolean, v double")
    r = js_divergence(df, F2.col("r"), "v", 0.0, 5.0, bins=5).collect()[0]
    assert r.js_divergence == 0.0 and r.js_distance == 0.0


def test_zipf_slope_hand_ols(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.text import zipf_slope

    df = spark.createDataFrame(
        [("w1 w1 w1 w1 w2 w2 w3",), ("w1 w2 w2 w3 w4",)],
        "text string",
    )
    r = zipf_slope(df, "text").collect()[0]
    # freqs: w1=5, w2=4, w3=2, w4=1 -> ranks 1..4 (freq desc)
    xs = [math.log(i) for i in (1, 2, 3, 4)]
    ys = [math.log(f) for f in (5, 4, 2, 1)]
    # replay the operator's 1e-6 quantization
    q = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    sx = sum(q(x) for x in xs)
    sy = sum(q(y) for y in ys)
    sxy = sum(q(x * y) for x, y in zip(xs, ys))
    sxx = sum(q(x * x) for x in xs)
    v = 4.0
    slope = (sxy - sx * sy / v) / (sxx - sx * sx / v)
    assert r.vocab_size == 4 and r.n_tokens == 12
    assert r.slope == pytest.approx(slope, abs=1e-4)
    assert -2.0 < r.slope < -0.5  # Zipf-ish


# ---------------------------------------------------------------------------
# round-11 batch 3: Page's L, CvM, Gwet AC1, QL retrieval, seasonal MK
# ---------------------------------------------------------------------------


def test_page_l_perfect_trend(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.profile import (
        page_l_trend,
    )

    data = [
        (b, t, float(i))
        for b in range(4)
        for i, t in enumerate(("t1", "t2", "t3"))
    ]
    df = spark.createDataFrame(data, "b int, t string, v double")
    r = page_l_trend(df, "b", "t", "v", ["t1", "t2", "t3"]).collect()[0]
    assert r.k == 3 and r.n_blocks == 4
    assert r.l_stat == 4 * (1 * 1 + 2 * 2 + 3 * 3)  # 56
    # exact permutation moments, no ties: E=48, Var per block =
    # [Sc2-(Sc)^2/k][SR2-(SR)^2/k]/(k-1) = 2*2/2 = 2 -> Var=8
    assert r.z == pytest.approx((56 - 48) / math.sqrt(8), abs=1e-9)
    assert r.p_value_one_sided < 0.01


def test_page_l_descending_large_p(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        page_l_trend,
    )

    data = [
        (b, t, float(-i))
        for b in range(4)
        for i, t in enumerate(("t1", "t2", "t3"))
    ]
    df = spark.createDataFrame(data, "b int, t string, v double")
    r = page_l_trend(df, "b", "t", "v", ["t1", "t2", "t3"]).collect()[0]
    assert r.z < 0 and r.p_value_one_sided > 0.99


def test_page_l_all_tied_null(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        page_l_trend,
    )

    data = [(b, t, 1.0) for b in range(3) for t in ("t1", "t2")]
    df = spark.createDataFrame(data, "b int, t string, v double")
    r = page_l_trend(df, "b", "t", "v", ["t1", "t2"]).collect()[0]
    assert r.z is None  # zero permutation variance


def test_cvm_matches_python_replay(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.profile import (
        cvm_two_sample_exact,
    )

    a_vals = [1, 2, 3, 4, 5]
    b_vals = [3, 4, 5, 6, 7]
    df = spark.createDataFrame(
        [("a", v) for v in a_vals] + [("b", v) for v in b_vals],
        "g string, v int",
    )
    r = cvm_two_sample_exact(df, "g", "v", "a", "b").collect()[0]
    na, nb = len(a_vals), len(b_vals)
    total = 0
    for v in sorted(set(a_vals + b_vals)):
        ca = sum(1 for x in a_vals if x <= v)
        cb = sum(1 for x in b_vals if x <= v)
        cv = sum(1 for x in a_vals + b_vals if x == v)
        gap = (ca * nb - cb * na) / (na * nb)
        total += math.floor(cv * gap * gap * 1e9 + 0.5)
    want = total / 1e9 * (na * nb / ((na + nb) ** 2))
    assert r.n_a == na and r.n_b == nb
    assert r.t_stat == pytest.approx(want, abs=1e-9)


def test_cvm_identical_samples_zero(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        cvm_two_sample_exact,
    )

    df = spark.createDataFrame(
        [("a", v) for v in range(10)] + [("b", v) for v in range(10)],
        "g string, v int",
    )
    r = cvm_two_sample_exact(df, "g", "v", "a", "b").collect()[0]
    assert r.t_stat == 0.0


def test_gwet_ac1_hand_example_and_kappa_paradox(spark):
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        gwet_ac1,
    )

    gd = (
        [("x", "x")] * 40 + [("x", "y")] * 5
        + [("y", "x")] * 5 + [("y", "y")] * 10
    )
    df = spark.createDataFrame(gd, "r1 string, r2 string")
    r = gwet_ac1(df, "r1", "r2").collect()[0]
    # pi_x = 90/120, Pe = 2*(0.75*0.25) = 0.375, Pa = 50/60
    assert r.p_agree == pytest.approx(50 / 60, abs=1e-9)
    assert r.p_chance == pytest.approx(0.375, abs=1e-9)
    assert r.ac1 == pytest.approx((50 / 60 - 0.375) / 0.625, abs=1e-9)
    # skewed-prevalence case: high agreement must keep AC1 high
    sk = [("x", "x")] * 98 + [("x", "y")] * 1 + [("y", "x")] * 1
    r2 = gwet_ac1(
        spark.createDataFrame(sk, "r1 string, r2 string"), "r1", "r2"
    ).collect()[0]
    assert r2.p_agree == 0.98 and r2.ac1 > 0.95


def test_ql_search_hand_scores_and_smoothing(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.retrieval import (
        ql_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join"),
            (2, "spark spark streaming"),
            (3, "pandas numpy"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in ql_search(docs, ["spark", "join"], mu=100.0, top_k=3).collect()}
    total = 8.0  # 3 + 3 + 2 tokens
    cf = {"spark": 3.0, "join": 1.0}

    def score(tfs, dl):
        s = 0.0
        for t, tf in tfs.items():
            w = math.log((tf + 100.0 * cf[t] / total) / (dl + 100.0))
            s += math.floor(w * 1e6 + 0.5) / 1e6 if w >= 0 else -math.floor(-w * 1e6 + 0.5) / 1e6
        return s

    for did, tfs, dl, hits in [
        (1, {"spark": 1, "join": 1}, 3, 2),
        (2, {"spark": 2, "join": 0}, 3, 1),
        (3, {"spark": 0, "join": 0}, 2, 0),
    ]:
        assert out[did].n_hits == hits
        assert out[did].score == pytest.approx(score(tfs, dl), abs=2e-6)
    # unseen-in-collection terms contribute 0, not -inf
    r = ql_search(docs, ["zzz"], top_k=1).collect()[0]
    assert r.score == 0.0 and r.n_hits == 0


def test_seasonal_mk_separates_cycle_from_trend(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    # strong weekly cycle + genuine upward drift across weeks
    rows = [
        ("a", d % 7, d, float((d % 7) * 10 + d // 7)) for d in range(28)
    ]
    df = spark.createDataFrame(rows, "k string, s int, t int, v double")
    r = seasonal_mann_kendall(df, "k", "s", "t", "v").collect()[0]
    # within each weekday values ascend: S = 7 * C(4,2) = 42, no ties
    assert r.n_obs == 28 and r.n_seasons == 7 and r.s_stat == 42
    assert r.var_s == pytest.approx(7 * 4 * 3 * 13 / 18.0, abs=1e-6)
    assert r.z > 5
    # pure cycle, no drift: seasonal S = 0, z = 0
    cyc = [("a", d % 7, d, float(d % 7)) for d in range(28)]
    df2 = spark.createDataFrame(cyc, "k string, s int, t int, v double")
    r2 = seasonal_mann_kendall(df2, "k", "s", "t", "v").collect()[0]
    assert r2.s_stat == 0 and r2.z is None  # all like-season values tied
    # while unstratified MK is whipsawed by the cycle (huge tie term,
    # nonzero S from cross-season pairs)
    mk = mann_kendall(df2, "k", "t", "v").collect()[0]
    assert mk.s_stat != 0


# ---------------------------------------------------------------------------
# round-11 batch 4: runs test, Ljung-Box, distinct-n, Heaps, Poisson rates
# ---------------------------------------------------------------------------


def test_runs_test_alternating_and_clustered(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.profile import (
        runs_test,
    )

    alt = [("a", t, t % 2 == 0) for t in range(10)]
    clu = [("b", t, t < 5) for t in range(10)]
    df = spark.createDataFrame(alt + clu, "k string, t int, x boolean")
    out = {r.k: r for r in runs_test(df, "k", "t", "x").collect()}
    # alternating: R=10, E=6, Var=2.2222 -> z = 4/sqrt(20/9)
    assert out["a"].n_runs == 10
    assert out["a"].z == pytest.approx(4 / math.sqrt(20 / 9.0), abs=1e-9)
    # clustered: R=2 -> strongly negative
    assert out["b"].n_runs == 2
    assert out["b"].z == pytest.approx(-4 / math.sqrt(20 / 9.0), abs=1e-9)
    assert out["a"].p_value < 0.01 and out["b"].p_value < 0.01


def test_runs_test_degenerate_single_symbol(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        runs_test,
    )

    df = spark.createDataFrame(
        [("a", t, True) for t in range(5)], "k string, t int, x boolean"
    )
    r = runs_test(df, "k", "t", "x").collect()[0]
    assert r.n_runs == 1 and r.z is None


def _py_ljung_box(xs: list[float], lags: int):
    """Classical fixed-mean Ljung-Box replay on integer cents."""
    cs = [round(x * 100) for x in xs]
    n = len(cs)
    sx = sum(cs)
    sxx = sum(c * c for c in cs)
    c0n2 = n * n * sxx - n * sx * sx
    q = 0.0
    for k in range(1, lags + 1):
        sxy = sum(cs[t] * cs[t - k] for t in range(k, n))
        head = sum(cs[t] for t in range(k, n))
        tail = sum(cs[t - k] for t in range(k, n))
        ckn2 = n * n * sxy - n * sx * (head + tail) + (n - k) * sx * sx
        r = ckn2 / c0n2
        q += r * r / (n - k)
    return n * (n + 2) * q


def test_ljung_box_matches_python_replay(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        ljung_box,
    )

    xs = [math.sin(t / 2.0) * 10 + 50 for t in range(30)]
    df = spark.createDataFrame(
        [("a", t, x) for t, x in enumerate(xs)],
        "k string, t int, v double",
    )
    r = ljung_box(df, "k", "t", "v", lags=3).collect()[0]
    assert r.n == 30 and r.n_lags == 3
    assert r.q_stat == pytest.approx(_py_ljung_box(xs, 3), abs=1e-5)
    # hash-scrambled noise (near-white) has far smaller Q than the
    # sine; note an ALTERNATING series is NOT white — its strong
    # negative lag-1 autocorrelation scores a large Q too
    ys = [((t * 2654435761) % 97) / 97.0 for t in range(30)]
    df2 = spark.createDataFrame(
        [("a", t, y) for t, y in enumerate(ys)],
        "k string, t int, v double",
    )
    r2 = ljung_box(df2, "k", "t", "v", lags=3).collect()[0]
    assert r2.q_stat == pytest.approx(_py_ljung_box(ys, 3), abs=1e-5)
    assert r.q_stat > r2.q_stat


def test_ljung_box_constant_series_null(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        ljung_box,
    )

    df = spark.createDataFrame(
        [("a", t, 5.0) for t in range(10)], "k string, t int, v double"
    )
    r = ljung_box(df, "k", "t", "v", lags=2).collect()[0]
    assert r.q_stat is None


def test_distinct_ngram_diversity_hand_counts(spark):
    from icnarc_to_philips_linkage_spark.operators.text import (
        distinct_ngram_diversity,
    )

    docs = spark.createDataFrame(
        [("s1", "a b a b a b"), ("s1", "a a a a"), ("s2", "x y z w")],
        "src string, text string",
    )
    out = {
        (r.src, r.n): r
        for r in distinct_ngram_diversity(docs, "src").collect()
    }
    # s1 unigrams: 10 tokens {a, b}; bigrams: 'a b','b a' x2 + 'a a' x3
    assert out[("s1", 1)].total_ngrams == 10
    assert out[("s1", 1)].distinct_ngrams == 2
    assert out[("s1", 2)].total_ngrams == 8
    assert out[("s1", 2)].distinct_ngrams == 3
    assert out[("s2", 3)].total_ngrams == 2
    assert out[("s2", 3)].distinct_ratio == 1.0
    # docs shorter than n contribute nothing (no descending sequence)
    tiny = spark.createDataFrame([("t", "solo")], "src string, text string")
    rows = distinct_ngram_diversity(tiny, "src").collect()
    assert {(r.n) for r in rows} == {1}


def test_heaps_law_fit_exact_power_law(spark):
    """Planted V = N^0.5 exactly on the quantized grid -> beta 0.5."""
    import math

    from icnarc_to_philips_linkage_spark.operators.text import (
        heaps_law_fit,
    )

    rows = []
    for s, (n_tok, vocab) in enumerate(
        [(100, 10), (400, 20), (2500, 50), (10000, 100)]
    ):
        toks = " ".join(f"w{i % vocab}" for i in range(n_tok))
        rows.append((f"s{s}", toks))
    df = spark.createDataFrame(rows, "src string, text string")
    r = heaps_law_fit(df, "src").collect()[0]
    assert r.n_groups == 4
    assert r.beta == pytest.approx(0.5, abs=1e-3)
    assert r.r2 == pytest.approx(1.0, abs=1e-3)


def test_poisson_two_rate_hand_z(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        poisson_two_rate,
    )

    df = spark.createDataFrame([(True,)] * 30 + [(False,)] * 10, "g boolean")
    r = poisson_two_rate(df, "g", 100.0, 50.0).collect()[0]
    p0 = 100.0 / 150.0
    z = (30 - 40 * p0) / math.sqrt(40 * p0 * (1 - p0))
    assert r.n_events_1 == 30 and r.n_events_2 == 10
    assert r.rate_1 == pytest.approx(0.3) and r.rate_2 == pytest.approx(0.2)
    assert r.z == pytest.approx(z, abs=1e-9)
    # equal rates at equal exposure: z = 0 exactly on balanced counts
    df2 = spark.createDataFrame([(True,)] * 5 + [(False,)] * 5, "g boolean")
    r2 = poisson_two_rate(df2, "g", 10.0, 10.0).collect()[0]
    assert r2.z == 0.0 and r2.p_value > 0.99


def test_odds_ratio_woolf_hand(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        odds_ratio_woolf,
    )

    rows = (
        [(True, True)] * 20 + [(True, False)] * 10
        + [(False, True)] * 5 + [(False, False)] * 15
    )
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = odds_ratio_woolf(df, "e", "o").collect()[0]
    orr = 20 * 15 / (10 * 5.0)
    half = 1.96 * math.sqrt(1 / 20 + 1 / 10 + 1 / 5.0 + 1 / 15.0)
    assert (r.a, r.b, r.c, r.d) == (20, 10, 5, 15)
    assert r.odds_ratio == pytest.approx(orr, abs=1e-6)
    assert r.ci_lo == pytest.approx(math.exp(math.log(orr) - half), abs=1e-5)
    assert r.ci_hi == pytest.approx(math.exp(math.log(orr) + half), abs=1e-5)
    # empty cell -> NULL (no silent 0.5 correction)
    df2 = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 3, "e boolean, o boolean"
    )
    r2 = odds_ratio_woolf(df2, "e", "o").collect()[0]
    assert r2.odds_ratio is None and r2.ci_lo is None


def test_dispersion_index_hand(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        dispersion_index,
    )

    # Poisson-ish: values 1..5 -> mean 3, var 2.5, VMR 2.5/3
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4, 5)]
        + [("b", 7.0)] * 4,  # constant -> vmr 0
        "k string, v double",
    )
    out = {r.k: r for r in dispersion_index(df, "k", "v").collect()}
    assert out["a"].n == 5 and out["a"].mean == 3.0
    assert out["a"].vmr == pytest.approx(2.5 / 3.0, abs=1e-6)
    assert out["a"].chi2 == pytest.approx(4 * 2.5 / 3.0, abs=1e-6)
    assert out["b"].vmr == 0.0 and out["b"].chi2 == 0.0
