"""Round-9 session-2 operators: hand-computed contract tests.

- conformal_coverage_binary (split conformal: exact order-statistic
  quantile, coverage, prediction-set size)
- krippendorff_alpha_nominal (integer-exact nominal alpha)
- k_anonymity_report (k-anonymity + l-diversity flags)
- mixture_reweight_mwu (DoReMi-style linear MWU domain reweighting)
- mann_kendall (tie-corrected trend test)
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# conformal_coverage_binary
# ---------------------------------------------------------------------------


def test_conformal_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    rows = [
        # calibration: nonconformity s = 1-p if y=1 else p
        (0.9, 1, True),   # s=0.1
        (0.8, 1, True),   # s=0.2
        (0.3, 0, True),   # s=0.3
        (0.2, 0, True),   # s=0.2
        (0.6, 0, True),   # s=0.6
        # test
        (0.85, 1, False),  # s=0.15 covered
        (0.4, 1, False),   # s=0.6 covered (<=)
        (0.1, 0, False),   # s=0.1 covered
        (0.7, 0, False),   # s=0.7 NOT covered
    ]
    df = spark.createDataFrame(rows, "p double, y int, cal boolean")
    out = ev.conformal_coverage_binary(df, "p", "y", "cal", alpha=0.2)
    r = out.collect()[0]
    # r = ceil((5+1)*0.8) = 5 -> q_hat = 5th smallest of {.1,.2,.2,.3,.6}
    assert r.n_cal == 5 and r.n_test == 4
    assert r.q_hat == pytest.approx(0.6)
    assert r.coverage == pytest.approx(0.75)
    # set sizes: {1},{0,1},{0},{0} -> mean 5/4
    assert r.avg_set_size == pytest.approx(1.25)
    assert r.target == pytest.approx(0.8)


def test_conformal_vacuous_small_calibration(spark):
    """ceil((n+1)(1-alpha)) > n -> q_hat NULL, full sets, coverage 1."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    rows = [(0.9, 1, True), (0.2, 0, True), (0.5, 1, False)]
    df = spark.createDataFrame(rows, "p double, y int, cal boolean")
    r = ev.conformal_coverage_binary(df, "p", "y", "cal", alpha=0.1).collect()[0]
    assert r.q_hat is None
    assert r.coverage == pytest.approx(1.0)
    assert r.avg_set_size == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# krippendorff_alpha_nominal
# ---------------------------------------------------------------------------


def test_krippendorff_two_raters_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")],
        "r1 string, r2 string",
    )
    r = ev.krippendorff_alpha_nominal(df, ["r1", "r2"]).collect()[0]
    # Do_pairs=2, N=8, sum_t2 = 3^2+5^2 = 34
    # alpha = 1 - 2*7/(1*(64-34)) = 1 - 14/30
    assert r.n_items == 4 and r.m_raters == 2 and r.n_categories == 2
    assert r.do_pairs == 2
    assert r.alpha == pytest.approx(1 - 14 / 30, abs=1e-9)


def test_krippendorff_perfect_and_null_rows(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [("x", "x", "x"), ("y", "y", "y"), ("x", None, "x")],
        "r1 string, r2 string, r3 string",
    )
    r = ev.krippendorff_alpha_nominal(df, ["r1", "r2", "r3"]).collect()[0]
    assert r.n_items == 2  # NULL-rated item excluded
    assert r.do_pairs == 0
    assert r.alpha == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# k_anonymity_report
# ---------------------------------------------------------------------------


def test_k_anonymity_flags(spark):
    from icnarc_to_philips_linkage_spark.operators import pii

    df = spark.createDataFrame(
        [(1, "A", "x")] * 3
        + [(1, "B", "x")]
        + [(2, "A", "y"), (2, "A", "z")],
        "nat int, seg string, sens string",
    )
    rows = {
        (r.nat, r.seg): r
        for r in pii.k_anonymity_report(
            df, ["nat", "seg"], "sens", k=3, l=2
        ).collect()
    }
    assert not rows[(1, "A")].k_violation and rows[(1, "A")].l_violation
    assert rows[(1, "B")].k_violation and rows[(1, "B")].l_violation
    assert rows[(2, "A")].k_violation and not rows[(2, "A")].l_violation


def test_k_anonymity_requires_qi(spark):
    from icnarc_to_philips_linkage_spark.operators import pii

    df = spark.createDataFrame([(1, "x")], "a int, s string")
    with pytest.raises(ValueError):
        pii.k_anonymity_report(df, [], "s")


# ---------------------------------------------------------------------------
# mixture_reweight_mwu
# ---------------------------------------------------------------------------


def test_mixture_reweight_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    rows = [("d1", 10.0)] * 4 + [("d2", 20.0)] * 4 + [("d3", 30.0)] * 2
    df = spark.createDataFrame(rows, "dom string, loss double")
    out = {
        r.domain: r
        for r in sa.mixture_reweight_mwu(df, "dom", "loss", eta=0.5).collect()
    }
    # pooled mean = 18; excess = (mean-18)/18
    assert out["d1"].excess == pytest.approx(-4 / 9, abs=1e-6)
    assert out["d3"].excess == pytest.approx(2 / 3, abs=1e-6)
    # w_raw: .4*(1-2/9)=.311111, .4*(1+1/18)=.422222, .2*(4/3)=.266667
    assert out["d1"].new_weight == pytest.approx(0.311111, abs=1e-6)
    assert out["d2"].new_weight == pytest.approx(0.422222, abs=1e-6)
    assert out["d3"].new_weight == pytest.approx(0.266667, abs=1e-6)
    assert sum(r.new_weight for r in out.values()) == pytest.approx(
        1.0, abs=1e-5
    )


def test_mixture_reweight_clamps_at_zero(spark):
    """A domain whose linear update would go negative clamps to 0."""
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    rows = [("cheap", 0.0)] * 9 + [("dear", 100.0)]
    df = spark.createDataFrame(rows, "dom string, loss double")
    out = {
        r.domain: r
        for r in sa.mixture_reweight_mwu(df, "dom", "loss", eta=2.0).collect()
    }
    # cheap: excess = (0-10)/10 = -1 -> share*(1-2) < 0 -> clamp
    assert out["cheap"].new_weight == pytest.approx(0.0)
    assert out["dear"].new_weight == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# mann_kendall
# ---------------------------------------------------------------------------


def test_mann_kendall_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate([1, 2, 3, 4])]
        + [("b", i, x) for i, x in enumerate([1, 2, 2, 3])]
        + [("c", 0, 9)],
        "k string, t int, x int",
    )
    out = {r.k: r for r in ts.mann_kendall(df, "k", "t", "x").collect()}
    # strictly increasing: S=6, var18 = 4*3*13 = 156
    assert out["a"].s_stat == 6
    assert out["a"].var_s == pytest.approx(156 / 18, abs=1e-6)
    assert out["a"].z == pytest.approx(5 / (156 / 18) ** 0.5, abs=1e-6)
    # one tie pair: S=5, tie term 2*1*9=18 -> var18=138
    assert out["b"].s_stat == 5
    assert out["b"].z == pytest.approx(4 / (138 / 18) ** 0.5, abs=1e-6)
    # singleton series: everything degenerate, z NULL
    assert out["c"].n_obs == 1 and out["c"].z is None


def test_mann_kendall_decreasing_and_all_tied(spark):
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("down", i, 10 - i) for i in range(4)]
        + [("flat", i, 7) for i in range(4)],
        "k string, t int, x int",
    )
    out = {r.k: r for r in ts.mann_kendall(df, "k", "t", "x").collect()}
    assert out["down"].s_stat == -6
    assert out["down"].z == pytest.approx(-5 / (156 / 18) ** 0.5, abs=1e-6)
    # all tied: tie term cancels n-term exactly -> Var 0 -> z NULL
    assert out["flat"].s_stat == 0 and out["flat"].var_s == 0.0
    assert out["flat"].z is None
