"""Round-8b tests: the session-2 statistics family — grouped OLS,
Spearman rank correlation, Welch's t — hand-computed goldens plus
degenerate-input contracts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import profile


# ---------------------------------------------------------------------------
# grouped_ols
# ---------------------------------------------------------------------------


def test_grouped_ols_recovers_exact_line(spark):
    """y = 2x + 3 exactly → slope 2, intercept 3, r² 1."""
    rows = [("g", x, 2 * x + 3) for x in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = profile.grouped_ols(
        df, "g", F.col("x"), F.col("y")
    ).collect()[0]
    assert out.n == 7
    assert out.slope == 2.0
    assert out.intercept == 3.0
    assert out.r2 == 1.0


def test_grouped_ols_hand_computed_scatter(spark):
    """Non-degenerate scatter checked against the closed form computed
    in plain Python (exact integer sums, same final algebra)."""
    pts = [(1, 2), (2, 1), (3, 4), (4, 3), (5, 7)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x long, y long"
    )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    slope = cov / vx
    out = profile.grouped_ols(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert out.slope == round(slope, 6)
    assert out.intercept == round((sy - slope * sx) / n, 6)
    assert out.r2 == round(cov * cov / (vx * vy), 6)


def test_grouped_ols_zero_x_variance_is_null(spark):
    df = spark.createDataFrame(
        [("g", 4, 1), ("g", 4, 2), ("g", 4, 9)], "g string, x long, y long"
    )
    out = profile.grouped_ols(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert out.slope is None and out.intercept is None and out.r2 is None


def test_grouped_ols_nulls_excluded_per_pair(spark):
    """A NULL in either column drops the PAIR (regr_* contract)."""
    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, None), ("g", None, 7), ("g", 3, 9)],
        "g string, x long, y long",
    )
    out = profile.grouped_ols(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert out.n == 2
    assert out.slope == 2.0  # (1,5) and (3,9)


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------


def test_spearman_perfect_monotone_is_one(spark):
    """Any strictly increasing transform → ρ = 1; decreasing → −1."""
    rows = [("up", x, x**3) for x in range(1, 9)] + [
        ("down", x, -(x**2)) for x in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r.g: r.rho for r in profile.spearman_corr(df, "g", "x", "y").collect()
    }
    assert got == {"up": 1.0, "down": -1.0}


def test_spearman_ties_hand_computed(spark):
    """Tie-averaged ranks, checked against a plain-Python Spearman with
    average ranks (the scipy definition) on a small tied sample."""
    xs = [1, 2, 2, 3, 3, 3, 4]
    ys = [2, 1, 3, 5, 4, 4, 6]

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sdx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    sdy = math.sqrt(sum((b - my) ** 2 for b in ry))
    expected = round(cov / (sdx * sdy), 6)

    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
    )
    got = profile.spearman_corr(df, "g", "x", "y").collect()[0]
    assert got.n == n
    assert abs(got.rho - expected) < 1e-9


def test_spearman_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1, 7), ("g", 2, 7), ("g", 3, 7)], "g string, x long, y long"
    )
    assert profile.spearman_corr(df, "g", "x", "y").collect()[0].rho is None


def test_spearman_null_pairs_dropped_from_both_rankings(spark):
    """A row with a NULL on either side must not occupy a rank in the
    OTHER variable's ranking (pairwise deletion, not per-column)."""
    rows = [("g", 1, 10), ("g", 2, 20), ("g", 3, None), ("g", 4, 40)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = profile.spearman_corr(df, "g", "x", "y").collect()[0]
    assert out.n == 3
    assert out.rho == 1.0


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------


def _welch_py(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se)
    dfw = se * se / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, dfw


def test_welch_ttest_hand_computed(spark):
    a = [10, 12, 14, 15, 18, 21]
    b = [8, 9, 11, 12]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.welch_ttest(df, "g", F.col("v"), "A", "B").collect()[0]
    t, dfw = _welch_py(a, b)
    assert (out.n_a, out.n_b) == (6, 4)
    assert out.mean_a == round(sum(a) / len(a), 6)
    assert out.t_stat == round(t, 6)
    assert out.df_welch == round(dfw, 6)


def test_welch_ttest_single_row_side_is_null(spark):
    df = spark.createDataFrame(
        [("A", 5), ("B", 1), ("B", 2), ("B", 3)], "g string, v long"
    )
    out = profile.welch_ttest(df, "g", F.col("v"), "A", "B").collect()[0]
    assert out.n_a == 1
    assert out.t_stat is None and out.df_welch is None


def test_welch_ttest_ignores_other_groups(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", 3), ("B", 2), ("B", 4), ("C", 999)],
        "g string, v long",
    )
    out = profile.welch_ttest(df, "g", F.col("v"), "A", "B").collect()[0]
    assert (out.n_a, out.n_b) == (2, 2)


# ---------------------------------------------------------------------------
# forecast_eval
# ---------------------------------------------------------------------------


def test_forecast_eval_hand_computed(spark):
    ys = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame(
        [("g", t, y) for t, y in enumerate(ys)], "g string, t long, n long"
    )
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        forecast_eval,
    )

    out = forecast_eval(df, "g", "t", "n", season=3).collect()[0]
    e1 = sum(abs(ys[i] - ys[i - 1]) for i in range(1, 10))
    es = sum(abs(ys[i] - ys[i - 3]) for i in range(3, 10))
    a1 = sum(abs(ys[i]) for i in range(1, 10))
    assert (out.n_naive, out.n_seasonal) == (9, 7)
    assert out.mae_naive == round(e1 / 9, 6)
    assert out.wape_naive == round(e1 / a1, 6)
    assert out.mae_seasonal == round(es / 7, 6)
    assert out.mase == round((es / 7) / (e1 / 9), 6)


def test_forecast_eval_single_observation_all_null(spark):
    df = spark.createDataFrame([("g", 1, 5)], "g string, t long, n long")
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        forecast_eval,
    )

    out = forecast_eval(df, "g", "t", "n").collect()[0]
    assert out.n_naive == 0 and out.mae_naive is None
    assert out.mase is None


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_textbook_curve(spark):
    """Six subjects, two censored — the standard worked example:
    S = 5/6, 2/3, 4/9, 4/9, 0 at t = 1, 2, 3, 4, 5."""
    rows = [
        (1, 1), (2, 1), (2, 0), (3, 1), (4, 0), (5, 1),
    ]
    df = spark.createDataFrame(rows, "duration long, observed int")
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        kaplan_meier,
    )

    got = {
        r.duration: (r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in kaplan_meier(df, "duration", "observed").collect()
    }
    assert got[1] == (6, 1, 0, 5 / 6)
    assert got[2] == (5, 1, 1, (5 / 6) * (4 / 5))
    assert got[3] == (3, 1, 0, (5 / 6) * (4 / 5) * (2 / 3))
    assert got[4] == (2, 0, 1, (5 / 6) * (4 / 5) * (2 / 3))
    assert got[5] == (1, 1, 0, 0.0)


def test_kaplan_meier_no_censoring_is_empirical_survival(spark):
    """Without censoring, S(t) is the plain empirical proportion of
    subjects still beyond t."""
    rows = [(d, 1) for d in [1, 2, 2, 3, 4, 4, 4, 5]]
    df = spark.createDataFrame(rows, "duration long, observed int")
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        kaplan_meier,
    )

    n = len(rows)
    remaining = {1: 7, 2: 5, 3: 4, 4: 1, 5: 0}
    for r in kaplan_meier(df, "duration", "observed").collect():
        assert abs(r.survival - remaining[r.duration] / n) < 1e-12


# ---------------------------------------------------------------------------
# gradient-descent classifier
# ---------------------------------------------------------------------------


def test_gd_train_matches_pure_python_replay_bitwise(spark):
    """The whole determinism claim: a plain-Python replay of the same
    arithmetic (fast sigmoid, 1e-12 integer contributions, identical
    update expression) reproduces the distributed weights BIT-EXACTLY."""
    import math as m

    from icnarc_to_philips_linkage_spark.operators import regression

    data = [(0.125, 0), (0.25, 0), (0.375, 0), (0.625, 1), (0.75, 1),
            (0.875, 1), (0.5, 0), (1.0, 1)]
    df = spark.createDataFrame(data, "x1 double, y int")
    got = regression.gd_train(df, ["x1"], "y", lr=0.5, iters=5)

    def qint(v):
        s = 0.0 if v == 0 else m.copysign(1.0, v)
        if v != v or v == 0:
            s = 0.0
        return int(s * m.floor(abs(v) * 1e12 + 0.5))

    w = [0.0, 0.0]
    n = len(data)
    for _ in range(5):
        s = [0, 0]
        for x1, y in data:
            z = (w[0] * 1.0) + (w[1] * x1)
            sig = 0.5 * (1.0 + z / (1.0 + abs(z)))
            resid = sig - float(y)
            s[0] += qint(resid * 1.0)
            s[1] += qint(resid * x1)
        w = [w[j] - 0.5 * (float(s[j]) / 1e12) / float(n) for j in range(2)]
    assert got == w  # bitwise, not approx


def test_gd_train_is_partition_invariant(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    rows = [(i / 97.0, (3 * i) % 7 / 10.0, 1 if i % 3 == 0 else 0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "a double, b double, y int")
    w1 = regression.gd_train(df.repartition(1), ["a", "b"], "y", iters=4)
    w7 = regression.gd_train(df.repartition(7), ["a", "b"], "y", iters=4)
    assert w1 == w7  # exact decimal sums -> layout cannot matter


def test_gd_classifier_separates_separable_data(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    rows = [(i / 100.0, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y int")
    w = regression.gd_train(df, ["x"], "y", lr=2.0, iters=60)
    scored = regression.gd_score(df, ["x"], w).collect()
    acc = sum(
        1 for r in scored if (r.score > 0.5) == (r.y == 1)
    ) / len(scored)
    assert acc >= 0.9


def test_gd_train_null_rows_excluded(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    base = [(0.1, 0), (0.9, 1), (0.2, 0), (0.8, 1)]
    df_clean = spark.createDataFrame(base, "x double, y int")
    df_dirty = spark.createDataFrame(
        base + [(None, 1), (0.5, None)], "x double, y int"
    )
    assert regression.gd_train(
        df_clean, ["x"], "y", iters=3
    ) == regression.gd_train(df_dirty, ["x"], "y", iters=3)


# ---------------------------------------------------------------------------
# anova_oneway
# ---------------------------------------------------------------------------


def _anova_py(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    stot = sum(sum(g) for g in groups)
    sb = sum(sum(g) ** 2 / len(g) for g in groups)
    st = sum(x * x for g in groups for x in g)
    ssb = sb - stot * stot / n
    ssw = st - sb
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_hand_computed(spark):
    groups = {"a": [1, 2, 3], "b": [2, 3, 4], "c": [10, 11, 12]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.anova_oneway(df, "g", F.col("v")).collect()[0]
    assert (out.k, out.n) == (3, 9)
    assert out.f_stat == round(_anova_py(list(groups.values())), 6)


def test_anova_identical_groups_f_is_zero(spark):
    rows = [(g, v) for g in "ab" for v in [5, 7, 9]]
    df = spark.createDataFrame(rows, "g string, v long")
    assert profile.anova_oneway(df, "g", F.col("v")).collect()[0].f_stat == 0.0


def test_anova_single_group_is_null(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
    assert profile.anova_oneway(df, "g", F.col("v")).collect()[0].f_stat is None


# ---------------------------------------------------------------------------
# mann_whitney_u
# ---------------------------------------------------------------------------


def _mwu_py(a, b):
    """Plain-Python tie-corrected Mann–Whitney (average ranks)."""
    import math as m
    from collections import Counter

    allv = sorted(a + b)
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j + 1 < len(allv) and allv[j + 1] == allv[i]:
            j += 1
        ranks[allv[i]] = (i + j) / 2 + 1
        i = j + 1
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    u = ra - na * (na + 1) / 2
    ties = sum(t**3 - t for t in Counter(allv).values())
    var = (na * nb / 12) * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2) / m.sqrt(var)
    return u, z


def test_mann_whitney_hand_computed_with_ties(spark):
    a = [1, 2, 2, 3, 5, 5, 7]
    b = [2, 4, 5, 6, 6, 8]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    u, z = _mwu_py(a, b)
    assert (out.n_a, out.n_b) == (7, 6)
    assert out.u_a == u
    assert abs(out.z - round(z, 6)) < 1e-9


def test_mann_whitney_all_tied_z_null(spark):
    rows = [("A", 4)] * 3 + [("B", 4)] * 3
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert out.z is None


def test_mann_whitney_stochastic_dominance_sign(spark):
    rows = [("A", v) for v in range(10, 20)] + [
        ("B", v) for v in range(0, 10)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert out.u_a == 100.0  # A wins every comparison
    assert out.z > 3


# ---------------------------------------------------------------------------
# logrank_test
# ---------------------------------------------------------------------------


def _logrank_py(subjects):
    """subjects: (duration, observed, in_a). Standard log-rank O/E/V."""
    import math as m
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])  # d, d1, tot, tot1
    for t, ev, a in subjects:
        c = cells[t]
        c[0] += ev
        c[1] += ev * a
        c[2] += 1
        c[3] += a
    o = e = v = 0.0
    times = sorted(cells)
    for i, t in enumerate(times):
        d, d1, _, _ = cells[t]
        n = sum(cells[s][2] for s in times[i:])
        n1 = sum(cells[s][3] for s in times[i:])
        o += d1
        e += d * n1 / n
        if n > 1:
            v += ((d * (n1 / n)) * (1 - n1 / n)) * ((n - d) / (n - 1))
    return o, e, v, (o - e) / m.sqrt(v) if v > 0 else None


def test_logrank_hand_computed(spark):
    subjects = [
        (1, 1, 1), (2, 1, 1), (3, 0, 1), (4, 1, 1),
        (2, 1, 0), (3, 1, 0), (5, 1, 0), (5, 0, 0), (6, 1, 0),
    ]
    df = spark.createDataFrame(
        subjects, "duration long, observed int, in_a int"
    )
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        logrank_test,
    )

    out = logrank_test(
        df, "duration", "observed", F.col("in_a") == 1
    ).collect()[0]
    o, e, v, z = _logrank_py(subjects)
    assert out.n_subjects == 9
    assert out.o_a == o
    assert out.e_a == round(e, 6)
    assert out.v_a == round(v, 6)
    assert out.z == round(z, 6)


def test_logrank_identical_cohorts_z_near_zero(spark):
    """Two interleaved copies of the same survival experience: O=E."""
    base = [(1, 1), (2, 1), (3, 0), (4, 1)]
    subjects = [(t, ev, 1) for t, ev in base] + [
        (t, ev, 0) for t, ev in base
    ]
    df = spark.createDataFrame(
        subjects, "duration long, observed int, in_a int"
    )
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        logrank_test,
    )

    out = logrank_test(
        df, "duration", "observed", F.col("in_a") == 1
    ).collect()[0]
    assert abs(out.o_a - out.e_a) < 1e-9
    assert abs(out.z) < 1e-6


# ---------------------------------------------------------------------------
# kruskal_wallis
# ---------------------------------------------------------------------------


def _kw_py(groups):
    from collections import Counter

    allv = sorted(v for g in groups for v in g)
    n = len(allv)
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j + 1 < len(allv) and allv[j + 1] == allv[i]:
            j += 1
        ranks[allv[i]] = (i + j) / 2 + 1
        i = j + 1
    rsum = sum(sum(ranks[v] for v in g) ** 2 / len(g) for g in groups)
    h = (12 / (n * (n + 1))) * rsum - 3 * (n + 1)
    ties = sum(t**3 - t for t in Counter(allv).values())
    return h / (1 - ties / (n**3 - n))


def test_kruskal_wallis_hand_computed_with_ties(spark):
    groups = {"a": [1, 2, 2, 5], "b": [2, 3, 6, 6], "c": [4, 6, 8, 9, 9]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.kruskal_wallis(df, "g", "v").collect()[0]
    assert (out.k, out.n) == (3, 13)
    assert abs(out.h_stat - round(_kw_py(list(groups.values())), 6)) < 1e-9


def test_kruskal_wallis_two_groups_matches_mwu_squared(spark):
    """With k=2 and no ties, H equals z² from Mann–Whitney (classic
    identity, up to the normal approximation both sides share)."""
    a = list(range(0, 20, 2))
    b = list(range(1, 30, 3))
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    h = profile.kruskal_wallis(df, "g", "v").collect()[0].h_stat
    z = profile.mann_whitney_u(df, "g", "v", "A", "B").collect()[0].z
    assert abs(h - z * z) < 1e-3


def test_kruskal_wallis_all_tied_is_null(spark):
    rows = [("a", 7)] * 3 + [("b", 7)] * 4
    df = spark.createDataFrame(rows, "g string, v long")
    assert profile.kruskal_wallis(df, "g", "v").collect()[0].h_stat is None


def test_gd_scored_auc_on_separable_data_is_high(spark):
    from icnarc_to_philips_linkage_spark.operators import (
        evaluation,
        regression,
    )

    rows = [(i / 100.0, i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    w = regression.gd_train(df, ["x"], "y", lr=2.0, iters=60)
    out = evaluation.roc_auc(
        regression.gd_score(df, ["x"], w), "score", "y"
    ).collect()[0]
    assert (out.n_pos, out.n_neg) == (50, 50)
    assert out.auc == 1.0  # monotone score in x separates perfectly


# ---------------------------------------------------------------------------
# ks_two_sample_exact
# ---------------------------------------------------------------------------


def _ks_py(a, b):
    vals = sorted(set(a + b))
    na, nb = len(a), len(b)
    return max(
        abs(
            sum(1 for x in a if x <= v) / na
            - sum(1 for x in b if x <= v) / nb
        )
        for v in vals
    )


def test_ks_exact_hand_computed(spark):
    a = [1, 3, 3, 5, 8, 9]
    b = [2, 3, 6, 7, 7, 10, 11]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.ks_two_sample_exact(df, "g", "v", "A", "B").collect()[0]
    assert (out.n_a, out.n_b) == (6, 7)
    assert abs(out.d_stat - _ks_py(a, b)) < 1e-9


def test_ks_exact_identical_samples_is_zero(spark):
    rows = [(g, v) for g in "AB" for v in [1, 2, 2, 5, 9]]
    df = spark.createDataFrame(rows, "g string, v long")
    assert profile.ks_two_sample_exact(
        df, "g", "v", "A", "B"
    ).collect()[0].d_stat == 0.0


def test_ks_exact_disjoint_supports_is_one(spark):
    rows = [("A", v) for v in range(5)] + [("B", v) for v in range(10, 15)]
    df = spark.createDataFrame(rows, "g string, v long")
    assert profile.ks_two_sample_exact(
        df, "g", "v", "A", "B"
    ).collect()[0].d_stat == 1.0


# ---------------------------------------------------------------------------
# brown_forsythe
# ---------------------------------------------------------------------------


def test_brown_forsythe_hand_computed(spark):
    """Matches a plain-Python Levene-with-median on a small sample."""
    groups = {"a": [1, 2, 4, 8, 9], "b": [4, 5, 5, 6], "c": [0, 10, 20, 30]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")

    def med(vs):
        s = sorted(vs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    devs = [
        [abs(v - med(vs)) for v in vs] for vs in groups.values()
    ]
    out = profile.brown_forsythe(df, "g", F.col("v")).collect()[0]
    assert (out.k, out.n) == (3, 13)
    # _anova_py on the (doubled-cancels) deviations
    assert abs(out.f_stat - round(_anova_py(devs), 6)) < 1e-6


def test_brown_forsythe_equal_spread_small_f(spark):
    """Same distribution shifted per group → deviations identical →
    F exactly 0."""
    rows = [(g, v + off) for g, off in [("a", 0), ("b", 100)]
            for v in [1, 2, 3, 4, 9]]
    df = spark.createDataFrame(rows, "g string, v long")
    assert profile.brown_forsythe(df, "g", F.col("v")).collect()[0].f_stat == 0.0


# ---------------------------------------------------------------------------
# weighted_median_native
# ---------------------------------------------------------------------------


def test_weighted_median_hand_computed(spark):
    """Values 1..4 with weights 1,1,3,1: total 6, cumulative weights
    1,2,5,6 → first value with 2·cum ≥ 6 is v=3."""
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 3), ("g", 4, 1)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    out = profile.weighted_median_native(df, "g", "v", "w").collect()[0]
    assert out.weighted_median == 3
    assert (out.n_rows, out.total_weight) == (4, 6.0)


def test_weighted_median_unit_weights_is_lower_median(spark):
    rows = [("g", v, 1) for v in [10, 20, 30, 40]]  # even count
    df = spark.createDataFrame(rows, "g string, v long, w long")
    assert (
        profile.weighted_median_native(df, "g", "v", "w")
        .collect()[0]
        .weighted_median
        == 20
    )


def test_weighted_median_heavy_value_dominates(spark):
    rows = [("g", 5, 100)] + [("g", v, 1) for v in range(50, 60)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    assert (
        profile.weighted_median_native(df, "g", "v", "w")
        .collect()[0]
        .weighted_median
        == 5
    )


def test_weighted_median_nonpositive_weights_excluded(spark):
    rows = [("g", 1, 0), ("g", 2, -5), ("g", 3, 1)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    out = profile.weighted_median_native(df, "g", "v", "w").collect()[0]
    assert out.weighted_median == 3 and out.n_rows == 1


# ---------------------------------------------------------------------------
# global_prefix_sums
# ---------------------------------------------------------------------------


def test_global_prefix_sums_matches_sequential(spark):
    from icnarc_to_philips_linkage_spark.operators.scale import (
        global_prefix_sums,
    )

    rows = [(i, (7 * i) % 5, (3 * i) % 4) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, a long, b long").repartition(7)
    out, totals = global_prefix_sums(df, ["k"], ["a", "b"], partitions=5)
    got = {r.k: (r.cum_a, r.cum_b) for r in out.collect()}
    ca = cb = 0
    for i, a, b in rows:
        ca, cb = ca + a, cb + b
        assert got[i] == (ca, cb)
    assert totals == {"a": ca, "b": cb}


def test_global_prefix_sums_partition_count_invariant(spark):
    from icnarc_to_philips_linkage_spark.operators.scale import (
        global_prefix_sums,
    )

    rows = [(i, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, a long")
    o1, t1 = global_prefix_sums(df.repartition(1), ["k"], ["a"], partitions=2)
    o9, t9 = global_prefix_sums(df.repartition(9), ["k"], ["a"], partitions=8)
    assert t1 == t9
    assert sorted((r.k, r.cum_a) for r in o1.collect()) == sorted(
        (r.k, r.cum_a) for r in o9.collect()
    )


# ---------------------------------------------------------------------------
# layout invariance: exact accumulation ⇒ partitioning cannot matter
# ---------------------------------------------------------------------------


def test_rank_stats_partition_invariant(spark):
    rows = [
        (f"g{i % 3}", (7 * i) % 23, (11 * i) % 19) for i in range(300)
    ]
    df1 = spark.createDataFrame(rows, "g string, x long, y long").repartition(1)
    df13 = spark.createDataFrame(rows, "g string, x long, y long").repartition(13)

    def snap(df):
        return (
            sorted(map(tuple, profile.spearman_corr(df, "g", "x", "y").collect())),
            profile.mann_whitney_u(df, "g", "x", "g0", "g1").collect()[0],
            profile.kruskal_wallis(df, "g", "x").collect()[0],
            profile.ks_two_sample_exact(df, "g", "x", "g0", "g1").collect()[0],
            profile.anova_oneway(df, "g", F.col("x")).collect()[0],
        )

    assert snap(df1) == snap(df13)


# ---------------------------------------------------------------------------
# km_rmst
# ---------------------------------------------------------------------------


def test_km_rmst_textbook_curve(spark):
    """Same six subjects as the KM test: RMST to tau=5 is the step
    integral 1·1 + (2−1)·5/6 + (3−2)·(2/3) + (4−3)·(4/9) + (5−4)·(4/9)."""
    rows = [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "duration long, observed int")
    from icnarc_to_philips_linkage_spark.operators.timeseries import km_rmst

    out = km_rmst(df, "duration", "observed").collect()[0]
    expected = 1.0 + 5 / 6 + 2 / 3 + 4 / 9 + 4 / 9
    assert out.n_times == 5 and out.tau == 5.0
    assert abs(out.rmst - expected) < 1e-12


def test_km_rmst_no_events_equals_tau_times_one(spark):
    """All censored → S ≡ 1 → RMST = tau."""
    rows = [(3, 0), (7, 0), (7, 0)]
    df = spark.createDataFrame(rows, "duration long, observed int")
    from icnarc_to_philips_linkage_spark.operators.timeseries import km_rmst

    out = km_rmst(df, "duration", "observed").collect()[0]
    assert out.rmst == out.tau == 7.0


# ---------------------------------------------------------------------------
# cochran_armitage_trend
# ---------------------------------------------------------------------------


def test_trend_test_hand_computed(spark):
    """Monotone dose-response, checked against the closed form."""
    import math as m

    cells = {1: (10, 1), 2: (10, 3), 3: (10, 5), 4: (10, 8)}  # (n, pos)
    rows = [
        (s, 1 if i < pos else 0)
        for s, (n, pos) in cells.items()
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "s int, y int")
    out = profile.cochran_armitage_trend(
        df, F.col("s"), F.col("y")
    ).collect()[0]
    n = sum(c[0] for c in cells.values())
    r = sum(c[1] for c in cells.values())
    ss = sum(s * c[0] for s, c in cells.items())
    ssy = sum(s * c[1] for s, c in cells.items())
    ss2 = sum(s * s * c[0] for s, c in cells.items())
    p = r / n
    t = ssy - p * ss
    var = p * (1.0 - p) * (ss2 - ss * ss / n)
    assert (out.n, out.n_pos) == (n, r)
    assert out.z_trend == round(t / m.sqrt(var), 6)
    assert out.z_trend > 3  # strong positive trend


def test_trend_test_constant_outcome_is_null(spark):
    rows = [(s, 1) for s in [1, 2, 3] for _ in range(5)]
    df = spark.createDataFrame(rows, "s int, y int")
    out = profile.cochran_armitage_trend(
        df, F.col("s"), F.col("y")
    ).collect()[0]
    assert out.z_trend is None


def test_trend_test_no_trend_z_small(spark):
    rows = [(s, y) for s in [1, 2, 3] for y in [0, 1] for _ in range(10)]
    df = spark.createDataFrame(rows, "s int, y int")
    out = profile.cochran_armitage_trend(
        df, F.col("s"), F.col("y")
    ).collect()[0]
    assert abs(out.z_trend) < 1e-9  # identical rate at every score


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_quantile_normalize_identical_sources_is_identity_on_ranks(spark):
    """Two sources with the SAME distribution: every value maps to (a
    pooled copy of) itself — normalization is a no-op up to ties."""
    from icnarc_to_philips_linkage_spark.operators.scale import (
        quantile_normalize,
    )

    rows = [(s, i, v) for s in ("a", "b") for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "src string, id long, v long")
    out = quantile_normalize(df, "src", "v", "id").collect()
    for r in out:
        assert r.v_norm == r.v


def test_quantile_normalize_shifted_source_aligns(spark):
    """Source b = source a + 100: after normalization b's values land
    on pooled quantiles at the same relative positions as a's."""
    from icnarc_to_philips_linkage_spark.operators.scale import (
        quantile_normalize,
    )

    a = [10, 20, 30, 40, 50]
    rows = [("a", i, v) for i, v in enumerate(a)] + [
        ("b", 100 + i, v + 100) for i, v in enumerate(a)
    ]
    df = spark.createDataFrame(rows, "src string, id long, v long")
    got = {
        (r.src, r.v): r.v_norm
        for r in quantile_normalize(df, "src", "v", "id").collect()
    }
    # same within-source rank -> same normalized value
    for i, v in enumerate(a):
        assert got[("a", v)] == got[("b", v + 100)]


def test_quantile_normalize_hand_positions(spark):
    """One source, N=4: q = (r-.5)/4 -> idx = ceil(qN) = r - ... check
    the type-1 mapping against hand-computed pooled indices."""
    from icnarc_to_philips_linkage_spark.operators.scale import (
        quantile_normalize,
    )
    import math as m

    vals = [5, 7, 11, 13]
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)], "src string, id long, v long"
    )
    got = {r.v: r.v_norm for r in quantile_normalize(df, "src", "v", "id").collect()}
    n = len(vals)
    pooled = sorted(vals)
    for r, v in enumerate(sorted(vals), start=1):
        idx = max(1, m.ceil((r - 0.5) / n * n))
        assert got[v] == pooled[idx - 1]
