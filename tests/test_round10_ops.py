"""Round-10 batch: ADVICE-r9 degenerate-input fixes, then the new
operators (Bradley-Terry, Theil-Sen, A-ES reservoir, McNemar/DeLong).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r9: sampling.mixture_reweight_mwu — all-zero losses
# ---------------------------------------------------------------------------


def test_mwu_all_zero_losses_fall_back_to_base_share(spark):
    """pooled mean 0 must NOT produce NaN/NULL weights: excess is
    defined as 0 and new_weight equals the count share."""
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    df = spark.createDataFrame(
        [("a", 0.0)] * 3 + [("b", 0.0)] * 1,
        "dom string, loss double",
    )
    rows = {
        r.domain: r
        for r in sa.mixture_reweight_mwu(df, "dom", "loss", eta=0.5).collect()
    }
    assert rows["a"].excess == 0.0 and rows["b"].excess == 0.0
    assert rows["a"].new_weight == pytest.approx(0.75, abs=1e-9)
    assert rows["b"].new_weight == pytest.approx(0.25, abs=1e-9)


# ---------------------------------------------------------------------------
# ADVICE r9: sampling.ht_total_estimate — NULL ids leave the population
# ---------------------------------------------------------------------------


def test_ht_estimate_excludes_null_ids_from_population(spark):
    """A NULL id can never be sampled (md5 of NULL is NULL), so such
    rows must not count toward n_rows / true_total either."""
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (None, "en", 1000)],
        "doc_id long, lang string, v long",
    )
    out = sa.ht_total_estimate(
        df, "lang", "v", {"en": 1.0}, id_col="doc_id"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_rows == 2
    assert r.true_total == 30
    # pi = 1 keeps everything in-population -> exact estimate
    assert r.n_sampled == 2 and r.ht_total == pytest.approx(30.0)
    assert r.rel_err == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# ADVICE r9: retrieval.rocchio_prf_search — duplicate query terms
# ---------------------------------------------------------------------------


def test_rocchio_duplicate_query_terms_deduped(spark):
    from icnarc_to_philips_linkage_spark.operators import retrieval

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join optimizer"),
            (2, "spark spark catalyst plans"),
            (3, "pandas eager loops"),
            (4, "shuffle partitions skew salt"),
        ],
        "doc_id long, text string",
    )
    base = retrieval.rocchio_prf_search(
        docs, ["spark", "shuffle"], fb_k=2, expand_k=1, top_k=10
    ).collect()
    duped = retrieval.rocchio_prf_search(
        docs, ["spark", "shuffle", "spark", "spark"],
        fb_k=2, expand_k=1, top_k=10,
    ).collect()
    assert [(r.doc_id, r.score, r.n_hits) for r in base] == [
        (r.doc_id, r.score, r.n_hits) for r in duped
    ]


# ---------------------------------------------------------------------------
# evaluation.bradley_terry_strengths
# ---------------------------------------------------------------------------


def test_bradley_terry_two_items_exact(spark):
    """A beats B 3:1 -> MLE strengths (0.75, 0.25) exactly (the MM
    update lands on the fixed point after one iteration)."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    pairs = spark.createDataFrame(
        [("A", "B")] * 3 + [("B", "A")],
        "winner string, loser string",
    )
    rows = {r.item: r for r in ev.bradley_terry_strengths(pairs).collect()}
    assert rows["A"].strength == pytest.approx(0.75, abs=1e-9)
    assert rows["B"].strength == pytest.approx(0.25, abs=1e-9)
    assert rows["A"].n_wins == 3 and rows["A"].n_games == 4


def test_bradley_terry_planted_recovery(spark):
    """Counts generated at exact 4:2:1 strength proportions are the
    MLE's sufficient statistics -> recovered ratios match."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    data = (
        [("A", "B")] * 400 + [("B", "A")] * 200   # 4/(4+2)
        + [("A", "C")] * 480 + [("C", "A")] * 120  # 4/(4+1)
        + [("B", "C")] * 400 + [("C", "B")] * 200  # 2/(2+1)
    )
    pairs = spark.createDataFrame(data, "winner string, loser string")
    rows = {
        r.item: r.strength
        for r in ev.bradley_terry_strengths(pairs, iters=40).collect()
    }
    assert rows["A"] / rows["C"] == pytest.approx(4.0, rel=0.02)
    assert rows["A"] / rows["B"] == pytest.approx(2.0, rel=0.02)
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-8)


def test_bradley_terry_zero_game_item_null(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    pairs = spark.createDataFrame(
        [("A", "B")], "winner string, loser string"
    )
    rows = {
        r.item: r
        for r in ev.bradley_terry_strengths(
            pairs, items=["A", "B", "C"]
        ).collect()
    }
    assert rows["C"].strength is None and rows["C"].n_games == 0
    assert rows["A"].strength is not None


def test_bradley_terry_self_pair_raises(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    pairs = spark.createDataFrame(
        [("A", "A")], "winner string, loser string"
    )
    with pytest.raises(ValueError, match="self-pair"):
        ev.bradley_terry_strengths(pairs)


# ---------------------------------------------------------------------------
# timeseries.theil_sen_slope
# ---------------------------------------------------------------------------


def test_theil_sen_hand_computed_odd(spark):
    """Points (0,1),(1,3),(2,2): slopes {2, 0.5, -1} -> median 0.5."""
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("k", 0, 1), ("k", 1, 3), ("k", 2, 2)],
        "k string, t int, x int",
    )
    r = ts.theil_sen_slope(df, "k", "t", "x").collect()[0]
    assert r.n_obs == 3 and r.n_pairs == 3
    assert r.sen_slope == pytest.approx(0.5, abs=1e-9)


def test_theil_sen_even_interpolates(spark):
    """Points (0,0),(1,2),(2,1),(3,3): six slopes sorted
    [-1, 0.5, 0.5, 1, 2, 2] -> median (0.5+1)/2 = 0.75."""
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("k", 0, 0), ("k", 1, 2), ("k", 2, 1), ("k", 3, 3)],
        "k string, t int, x int",
    )
    r = ts.theil_sen_slope(df, "k", "t", "x").collect()[0]
    assert r.n_pairs == 6
    assert r.sen_slope == pytest.approx(0.75, abs=1e-9)


def test_theil_sen_outlier_robust(spark):
    """y = 2t with one wild outlier: OLS is dragged, Sen stays 2."""
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    rows = [("k", t, 2 * t) for t in range(20)] + [("k", 20, 100000)]
    df = spark.createDataFrame(rows, "k string, t int, x int")
    r = ts.theil_sen_slope(df, "k", "t", "x").collect()[0]
    assert r.sen_slope == pytest.approx(2.0, abs=1e-9)


def test_theil_sen_single_point_null(spark):
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    df = spark.createDataFrame([("k", 0, 1)], "k string, t int, x int")
    r = ts.theil_sen_slope(df, "k", "t", "x").collect()[0]
    assert r.n_obs == 1 and r.n_pairs == 0 and r.sen_slope is None


def test_theil_sen_rejects_timestamps(spark):
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts
    import datetime

    df = spark.createDataFrame(
        [("k", datetime.datetime(2024, 1, 1), 1)],
        "k string, t timestamp, x int",
    )
    with pytest.raises(ValueError, match="time grid"):
        ts.theil_sen_slope(df, "k", "t", "x")


# ---------------------------------------------------------------------------
# sampling.stratified_reservoir_topk
# ---------------------------------------------------------------------------


def test_stratified_reservoir_matches_per_stratum_global(spark):
    """Each stratum's reservoir equals weighted_reservoir_topk run on
    that stratum alone with the same salt (two-level top-k is exact)."""
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    rows = [(f"s{i % 3}", i, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "st string, id long, w int")
    strat = {
        (r.st, r.id): (r.sample_key, r.rank)
        for r in sa.stratified_reservoir_topk(
            df, "st", "id", "w", k=5
        ).collect()
    }
    for s in ("s0", "s1", "s2"):
        solo = sa.weighted_reservoir_topk(
            df.filter(F.col("st") == s), "id", "w", k=5, salt="swres"
        ).collect()
        assert {
            (s, r.id): (r.sample_key, r.rank) for r in solo
        } == {kk: v for kk, v in strat.items() if kk[0] == s}


def test_stratified_reservoir_partitioning_invariant(spark):
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    rows = [(f"s{i % 2}", i, i + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "st string, id long, w int")
    a = sorted(
        (r.st, r.id, r.rank)
        for r in sa.stratified_reservoir_topk(
            df.repartition(7), "st", "id", "w", k=4
        ).collect()
    )
    b = sorted(
        (r.st, r.id, r.rank)
        for r in sa.stratified_reservoir_topk(
            df.repartition(3), "st", "id", "w", k=4
        ).collect()
    )
    assert a == b and len(a) == 8


def test_stratified_reservoir_small_stratum_returns_all(spark):
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 5), ("b", 3, 5)],
        "st string, id long, w int",
    )
    out = sa.stratified_reservoir_topk(df, "st", "id", "w", k=10).collect()
    assert len(out) == 3
    assert {r.id for r in out if r.st == "b"} == {3}


def test_stratified_reservoir_inclusion_probability(spark):
    """A-ES with k=1: P(item wins) = w_i / sum(w). Vary the salt to
    simulate independent draws; the weight-8 item must win roughly
    8/15 of the time and strictly more often than the weight-1 item."""
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    df = spark.createDataFrame(
        [("s", "heavy", 8), ("s", "m1", 4), ("s", "m2", 2), ("s", "lt", 1)],
        "st string, id string, w int",
    )
    wins: dict[str, int] = {}
    n_draws = 60
    for i in range(n_draws):
        r = sa.stratified_reservoir_topk(
            df, "st", "id", "w", k=1, salt=f"trial{i}"
        ).collect()[0]
        wins[r.id] = wins.get(r.id, 0) + 1
    freq_heavy = wins.get("heavy", 0) / n_draws
    # E = 8/15 ~ 0.533, sd ~ 0.064 at n=60: a +-3sd band
    assert 0.34 < freq_heavy < 0.73, wins
    assert wins.get("heavy", 0) > wins.get("lt", 0), wins


# ---------------------------------------------------------------------------
# evaluation.mcnemar_test / evaluation.delong_paired_auc
# ---------------------------------------------------------------------------


def test_mcnemar_hand_computed(spark):
    """b=6, c=2: corrected chi2 = (|6-2|-1)^2/8 = 1.125; the
    concordant cells never matter."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    rows = (
        [(True, False, True)] * 6     # only clf1 right
        + [(False, True, True)] * 2   # only clf2 right
        + [(True, True, True)] * 10   # both right
        + [(False, False, True)] * 3  # both wrong
    )
    df = spark.createDataFrame(rows, "p1 boolean, p2 boolean, y boolean")
    r = ev.mcnemar_test(df, "p1", "p2", "y").collect()[0]
    assert (r.n, r.n_both, r.n_only1, r.n_only2, r.n_neither) == (
        21, 10, 6, 2, 3,
    )
    assert r.chi2 == pytest.approx(1.125, abs=1e-12)
    r2 = ev.mcnemar_test(df, "p1", "p2", "y", corrected=False).collect()[0]
    assert r2.chi2 == pytest.approx(2.0, abs=1e-12)


def test_mcnemar_no_discordance_null(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [(True, True, True), (False, False, True)],
        "p1 boolean, p2 boolean, y boolean",
    )
    r = ev.mcnemar_test(df, "p1", "p2", "y").collect()[0]
    assert r.chi2 is None


def _delong_reference(s1, s2, y):
    """Pure-Python DeLong (placement-value form, pROC convention)."""
    def placements(s):
        xs = [v for v, l in zip(s, y) if l]
        ys = [v for v, l in zip(s, y) if not l]
        m, n = len(xs), len(ys)
        v10 = [
            (sum(1 for b in ys if b < a) + 0.5 * sum(1 for b in ys if b == a)) / n
            for a in xs
        ]
        v01 = [
            (sum(1 for a in xs if a > b) + 0.5 * sum(1 for a in xs if a == b)) / m
            for b in ys
        ]
        return v10, v01, sum(v10) / m

    def cov(u, v):
        mu, mv = sum(u) / len(u), sum(v) / len(v)
        return sum((a - mu) * (b - mv) for a, b in zip(u, v)) / (len(u) - 1)

    va, wa, auc_a = placements(s1)
    vb, wb, auc_b = placements(s2)
    m, n = len(va), len(wa)
    var = (cov(va, va) + cov(vb, vb) - 2 * cov(va, vb)) / m + (
        cov(wa, wa) + cov(wb, wb) - 2 * cov(wa, wb)
    ) / n
    z = (auc_a - auc_b) / var**0.5 if var > 0 else None
    return auc_a, auc_b, var, z


def test_delong_matches_reference(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    import random

    rng = random.Random(7)
    rows = []
    for _ in range(120):
        y = rng.random() < 0.4
        # clf1 informative, clf2 weakly informative, with ties
        s1 = round(rng.random() * 0.5 + (0.4 if y else 0.0), 2)
        s2 = round(rng.random() * 0.8 + (0.1 if y else 0.0), 1)
        rows.append((s1, s2, y))
    df = spark.createDataFrame(rows, "s1 double, s2 double, y boolean")
    r = ev.delong_paired_auc(df, "s1", "s2", "y").collect()[0]
    a1, a2, var, z = _delong_reference(
        [x[0] for x in rows], [x[1] for x in rows], [x[2] for x in rows]
    )
    assert r.auc1 == pytest.approx(a1, abs=1e-9)
    assert r.auc2 == pytest.approx(a2, abs=1e-9)
    assert r.var_delta == pytest.approx(var, abs=1e-9)
    assert r.z == pytest.approx(z, abs=1e-6)


def test_delong_identical_scores_null_z(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    rows = [(0.9, 0.9, True), (0.8, 0.8, True), (0.2, 0.2, False),
            (0.3, 0.3, False)]
    df = spark.createDataFrame(rows, "s1 double, s2 double, y boolean")
    r = ev.delong_paired_auc(df, "s1", "s2", "y").collect()[0]
    assert r.delta_auc == 0.0 and r.z is None


# ---------------------------------------------------------------------------
# evaluation.wilcoxon_signed_rank / bh_fdr / cliffs_delta / normal_sf
# ---------------------------------------------------------------------------


def test_normal_sf_approx_accuracy(spark):
    """A&S 26.2.17 claims |err| < 7.5e-8 against the true tail."""
    import math

    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [(x / 10.0,) for x in range(0, 50)], "x double"
    )
    rows = df.select(
        "x", ev.normal_sf_approx(F.col("x")).alias("q")
    ).collect()
    for r in rows:
        true_q = 0.5 * math.erfc(r.x / math.sqrt(2.0))
        assert abs(r.q - true_q) < 7.5e-8, (r.x, r.q, true_q)


def test_wilcoxon_no_ties_hand_computed(spark):
    """d = [1,-2,3,4,5]: W+ = 13, z = 22/sqrt(220) = 1.483240."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [(1, 0), (0, 2), (3, 0), (4, 0), (5, 0)], "a long, b long"
    )
    r = ev.wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r.n_pairs == 5 and r.n_nonzero == 5
    assert r.w_plus == pytest.approx(13.0)
    assert r.z == pytest.approx(22.0 / (220.0 ** 0.5), abs=1e-6)


def test_wilcoxon_with_ties_and_zeros(spark):
    """d = [2,2,-2,1,0]: zero drops, |2| ties at avg rank 3 ->
    W+ = 7, z = 8/sqrt(112) = 0.755929."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [(2, 0), (2, 0), (0, 2), (1, 0), (3, 3)], "a long, b long"
    )
    r = ev.wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r.n_pairs == 5 and r.n_nonzero == 4
    assert r.w_plus == pytest.approx(7.0)
    assert r.z == pytest.approx(8.0 / (112.0 ** 0.5), abs=1e-6)


def test_bh_fdr_step_up_includes_interior_points(spark):
    """p = [0.001, 0.049, 0.05] at alpha 0.05: p_(2)=0.049 is ABOVE
    its own line (0.0333) but p_(3)=0.05 <= 0.05, so ALL THREE
    reject — the step-up subtlety."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [("t1", 0.001), ("t2", 0.049), ("t3", 0.05)],
        "k string, p double",
    )
    rows = {r.k: r for r in ev.bh_fdr(df, "k", "p").collect()}
    assert all(rows[t].rejected for t in ("t1", "t2", "t3"))


def test_bh_fdr_q_values_monotone(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04),
         ("e", 0.2)],
        "k string, p double",
    )
    rows = sorted(ev.bh_fdr(df, "k", "p").collect(), key=lambda r: r.rank)
    assert [r.rejected for r in rows] == [True] * 4 + [False]
    assert [r.q_value for r in rows] == pytest.approx(
        [0.05, 0.05, 0.05, 0.05, 0.2]
    )
    qs = [r.q_value for r in rows]
    assert qs == sorted(qs)  # monotone by construction


def test_bh_fdr_family_partitioning(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [("f1", "a", 0.01), ("f1", "b", 0.5), ("f2", "c", 0.01),
         ("f2", "d", 0.012)],
        "fam string, k string, p double",
    )
    rows = {
        (r.fam, r.k): r
        for r in ev.bh_fdr(df, "k", "p", family_cols=["fam"]).collect()
    }
    assert rows[("f1", "a")].m_tests == 2
    assert rows[("f1", "a")].rejected and not rows[("f1", "b")].rejected
    # f2: p_(2)=0.012 <= 0.05*2/2 -> both reject
    assert rows[("f2", "c")].rejected and rows[("f2", "d")].rejected


def test_cliffs_delta_hand_computed(spark):
    """x=[3,4,5] vs y=[1,2,3]: (8 wins - 0 losses)/9 = 0.888889."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [(3, True), (4, True), (5, True), (1, False), (2, False),
         (3, False)],
        "v long, g boolean",
    )
    r = ev.cliffs_delta(df, "v", "g").collect()[0]
    assert (r.n_pos, r.n_neg) == (3, 3)
    assert r.delta == pytest.approx(8.0 / 9.0, abs=1e-9)
    assert r.magnitude == "large"


def test_cliffs_delta_identical_groups_zero(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [(1, True), (2, True), (1, False), (2, False)],
        "v long, g boolean",
    )
    r = ev.cliffs_delta(df, "v", "g").collect()[0]
    assert r.delta == 0.0 and r.magnitude == "negligible"


# ---------------------------------------------------------------------------
# profile.kendall_tau_b
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_scipy_formula(spark):
    """Hand data with ties in both variables; compare against the
    direct O(n^2) pair count."""
    from icnarc_to_philips_linkage_spark.operators import profile as pr

    data = [(1, 2), (2, 1), (2, 3), (3, 3), (3, 3), (4, 5), (5, 4),
            (5, 6), (1, 1), (4, 4)]
    df = spark.createDataFrame(data, "x long, y long")
    r = pr.kendall_tau_b(df, "x", "y").collect()[0]
    n = len(data)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = data[i][0] - data[j][0]
            dy = data[i][1] - data[j][1]
            if dx == 0 and dy == 0:
                continue
            if dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif dx * dy > 0:
                conc += 1
            else:
                disc += 1
    n0 = n * (n - 1) // 2
    n1 = sum(
        t * (t - 1) // 2
        for t in __import__("collections").Counter(
            x for x, _ in data
        ).values()
    )
    n2 = sum(
        t * (t - 1) // 2
        for t in __import__("collections").Counter(
            y for _, y in data
        ).values()
    )
    expected = (conc - disc) / ((n0 - n1) * (n0 - n2)) ** 0.5
    assert r.n == n and r.n_concordant == conc and r.n_discordant == disc
    assert r.tau_b == pytest.approx(expected, abs=1e-9)


def test_kendall_tau_perfect_and_constant(spark):
    from icnarc_to_philips_linkage_spark.operators import profile as pr

    mono = spark.createDataFrame(
        [(i, i * 2) for i in range(10)], "x long, y long"
    )
    assert pr.kendall_tau_b(mono, "x", "y").collect()[0].tau_b == 1.0
    const = spark.createDataFrame(
        [(i, 7) for i in range(5)], "x long, y long"
    )
    assert pr.kendall_tau_b(const, "x", "y").collect()[0].tau_b is None


# ---------------------------------------------------------------------------
# evaluation.plackett_luce_strengths
# ---------------------------------------------------------------------------


def test_plackett_luce_reduces_to_bradley_terry_on_pairs(spark):
    """Length-2 rankings ARE Bradley-Terry pairs: the PL fit must
    match bradley_terry_strengths on the same data."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    pair_data = [("A", "B")] * 3 + [("B", "A")]
    bt = {
        r.item: r.strength
        for r in ev.bradley_terry_strengths(
            spark.createDataFrame(
                pair_data, "winner string, loser string"
            ),
            iters=30,
        ).collect()
    }
    pl = {
        r.item: r.strength
        for r in ev.plackett_luce_strengths(
            spark.createDataFrame(
                [([w, l],) for w, l in pair_data],
                "ranking array<string>",
            ),
            "ranking",
            iters=30,
        ).collect()
    }
    assert pl["A"] == pytest.approx(bt["A"], abs=1e-6)
    assert pl["B"] == pytest.approx(bt["B"], abs=1e-6)


def test_plackett_luce_planted_order_recovered(spark):
    """A always first, D always last across rotations of the middle:
    strengths must order A > {B, C} > D."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    data = (
        [(["A", "B", "C", "D"],)] * 6
        + [(["A", "C", "B", "D"],)] * 6
        + [(["B", "A", "C", "D"],)] * 2
    )
    df = spark.createDataFrame(data, "ranking array<string>")
    rows = {
        r.item: r
        for r in ev.plackett_luce_strengths(df, "ranking", iters=50).collect()
    }
    assert rows["A"].strength > rows["B"].strength
    assert rows["A"].strength > rows["C"].strength
    assert rows["B"].strength > rows["D"].strength
    assert rows["C"].strength > rows["D"].strength
    # A wins a stage in all 14 rankings (12 firsts + 2 seconds)
    assert rows["A"].n_wins == 14
    assert rows["D"].n_wins == 0


def test_plackett_luce_duplicate_items_raise(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [(["A", "A", "B"],)], "ranking array<string>"
    )
    with pytest.raises(ValueError, match="duplicate"):
        ev.plackett_luce_strengths(df, "ranking")


# ---------------------------------------------------------------------------
# evaluation.isotonic_calibration_grid / benford_first_digit
# ---------------------------------------------------------------------------


def _iso_rows(spec):
    """spec: list of (bin, n, n_pos) -> row tuples."""
    rows = []
    for b, n, p in spec:
        rows += [(b, True)] * p + [(b, False)] * (n - p)
    return rows


def test_isotonic_pools_adjacent_violators(spark):
    """Rates [0.1, 0.3, 0.2, 0.6]: bins 2 and 3 violate -> pooled
    to 0.25; ends untouched."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        _iso_rows([(0, 10, 1), (1, 10, 3), (2, 10, 2), (3, 10, 6)]),
        "sb int, y boolean",
    )
    rows = {
        r.score_bin: r
        for r in ev.isotonic_calibration_grid(df, "sb", "y").collect()
    }
    assert rows[0].iso_rate == pytest.approx(0.1)
    assert rows[1].iso_rate == pytest.approx(0.25)
    assert rows[2].iso_rate == pytest.approx(0.25)
    assert rows[3].iso_rate == pytest.approx(0.6)
    assert rows[1].raw_rate == pytest.approx(0.3)


def test_isotonic_weighted_pooling(spark):
    """Unequal block weights: [n=2 p=2 (1.0), n=8 p=0 (0.0)] pools to
    2/10 = 0.2 for both."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        _iso_rows([(0, 2, 2), (1, 8, 0)]), "sb int, y boolean"
    )
    rows = {
        r.score_bin: r.iso_rate
        for r in ev.isotonic_calibration_grid(df, "sb", "y").collect()
    }
    assert rows[0] == pytest.approx(0.2) and rows[1] == pytest.approx(0.2)


def test_isotonic_monotone_and_identity_on_sorted(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    spec = [(i, 20, i * 2) for i in range(8)]  # already monotone
    df = spark.createDataFrame(_iso_rows(spec), "sb int, y boolean")
    rows = sorted(
        ev.isotonic_calibration_grid(df, "sb", "y").collect(),
        key=lambda r: r.score_bin,
    )
    isos = [r.iso_rate for r in rows]
    assert isos == sorted(isos)
    for r in rows:  # monotone input -> fit equals raw rates
        assert r.iso_rate == pytest.approx(r.raw_rate)


def test_benford_digits_and_chi2(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev
    import math

    vals = [1234.0, 0.005, -20.5, 1.0e-7, 999.0, 150.0, 0.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {
        r.digit: r for r in ev.benford_first_digit(df, "v").collect()
    }
    # first significant digits: 1, 5, 2, 1, 9, 1 (0.0/None excluded)
    assert rows[1].n_values == 3
    assert rows[5].n_values == 1 and rows[2].n_values == 1
    assert rows[9].n_values == 1
    assert sum(r.n_values for r in rows.values()) == 6
    assert sum(r.observed_p for r in rows.values()) == pytest.approx(1.0)
    exp1 = math.log10(2.0)
    n = 6
    assert rows[1].expected_p == pytest.approx(exp1, abs=1e-9)
    assert rows[1].chi2_contrib == pytest.approx(
        (3 - exp1 * n) ** 2 / (exp1 * n), abs=1e-6
    )


# ---------------------------------------------------------------------------
# text.vocab_richness_report / evaluation.cuped_adjusted_means
# ---------------------------------------------------------------------------


def test_vocab_richness_hand_computed(spark):
    """'a a b c' + 'd d e': V=5, f1={b,c,e}=3, f2={a,d}=2, N=7;
    Chao1 = 5 + 3*2/(2*3) = 6; unseen = 3/7."""
    from icnarc_to_philips_linkage_spark.operators import text as tx

    df = spark.createDataFrame(
        [("a a b c",), ("d d e",)], "text string"
    )
    r = tx.vocab_richness_report(df).collect()[0]
    assert (r.n_tokens, r.vocab_size) == (7, 5)
    assert (r.f1_singletons, r.f2_doubletons) == (3, 2)
    assert r.chao1_estimate == pytest.approx(6.0)
    assert r.unseen_mass == pytest.approx(3 / 7, abs=1e-9)


def test_vocab_richness_no_doubletons_defined(spark):
    """Bias-corrected Chao1 is finite with f2 = 0."""
    from icnarc_to_philips_linkage_spark.operators import text as tx

    df = spark.createDataFrame([("x y z",)], "text string")
    r = tx.vocab_richness_report(df).collect()[0]
    assert r.f2_doubletons == 0
    assert r.chao1_estimate == pytest.approx(3 + 3 * 2 / 2.0)


def test_cuped_reference_computation(spark):
    """Compare against a straight numpy-style reference on data where
    the covariate strongly predicts the metric."""
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    import random

    rng = random.Random(3)
    rows = []
    for i in range(400):
        x = round(rng.random() * 10, 3)
        noise = round(rng.random(), 3)
        v = "A" if i % 2 == 0 else "B"
        lift = 0.5 if v == "B" else 0.0
        rows.append((v, round(2 * x + noise + lift, 6), x))
    df = spark.createDataFrame(rows, "variant string, y double, x double")
    out = {r.variant: r for r in ev.cuped_adjusted_means(
        df, "y", "x", "variant").collect()}

    ys = [r[1] for r in rows]
    xs = [r[2] for r in rows]
    n = len(rows)
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    varx = sum((a - mx) ** 2 for a in xs)
    theta = cov / varx
    for v in ("A", "B"):
        sel = [(y, x) for (vv, y, x) in rows if vv == v]
        m_y = sum(y for y, _ in sel) / len(sel)
        m_x = sum(x for _, x in sel) / len(sel)
        adj = m_y - theta * (m_x - mx)
        assert out[v].mean_adjusted == pytest.approx(adj, abs=1e-4)
        assert out[v].theta == pytest.approx(theta, abs=1e-4)
    # CUPED must tighten the A/B gap toward the true +0.5 lift
    raw_gap = out["B"].mean_metric - out["A"].mean_metric
    adj_gap = out["B"].mean_adjusted - out["A"].mean_adjusted
    assert abs(adj_gap - 0.5) < abs(raw_gap - 0.5) + 0.05
    assert out["A"].rho2 is not None and out["A"].rho2 > 0.9


def test_cuped_constant_covariate_falls_back(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame(
        [("A", 1.0, 5.0), ("A", 2.0, 5.0), ("B", 3.0, 5.0),
         ("B", 4.0, 5.0)],
        "variant string, y double, x double",
    )
    out = {r.variant: r for r in ev.cuped_adjusted_means(
        df, "y", "x", "variant").collect()}
    assert out["A"].theta is None
    assert out["A"].mean_adjusted == pytest.approx(out["A"].mean_metric)


# ---------------------------------------------------------------------------
# timeseries.cox_ph_single
# ---------------------------------------------------------------------------


def _cox_reference(data, iters=40):
    """Pure-Python Newton on the Breslow partial likelihood with TRUE
    exp (the operator uses the (1+z/1024)^1024 link; at |z| ~ 1 the
    fits agree to ~1e-3)."""
    import math

    beta = 0.0
    for _ in range(iters):
        times = sorted({t for t, _, _ in data})
        g = sum(x for t, x, e in data if e)
        h = 0.0
        for t in times:
            dt = sum(e for tt, _, e in data if tt == t)
            if not dt:
                continue
            risk = [(x, math.exp(x * beta)) for tt, x, _ in data
                    if tt >= t]
            se = sum(w for _, w in risk)
            sxe = sum(x * w for x, w in risk)
            sx2e = sum(x * x * w for x, w in risk)
            g -= dt * sxe / se
            h += dt * (sx2e / se - (sxe / se) ** 2)
        if h > 0:
            beta += g / h
    return beta


def test_cox_recovers_positive_effect(spark):
    """x = 1 subjects fail systematically earlier -> beta > 0 and
    close to the true-exp Newton reference."""
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    data = []
    for i in range(40):
        data.append((3 + i % 4, 1.0, 1))      # x=1: early events
        data.append((8 + i % 5, 0.0, 1))      # x=0: late events
        if i % 4 == 0:
            data.append((10, 1.0, 0))          # some censoring
            data.append((12, 0.0, 0))
    df = spark.createDataFrame(data, "t int, x double, e int")
    r = ts.cox_ph_single(df, "t", "e", "x", iters=20).collect()[0]
    ref = _cox_reference(data)
    assert r.beta > 0.5
    assert r.beta == pytest.approx(ref, abs=5e-3)
    assert r.hazard_ratio == pytest.approx(
        (1 + r.beta / 1024.0) ** 1024, abs=1e-4
    )


def test_cox_null_effect_near_zero(spark):
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    data = [(5 + i % 7, float(i % 2), 1) for i in range(60)]
    df = spark.createDataFrame(data, "t int, x double, e int")
    r = ts.cox_ph_single(df, "t", "e", "x").collect()[0]
    assert abs(r.beta) < 0.3
    assert r.n_subjects == 60 and r.n_events == 60


def test_cox_no_events_null(spark):
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [(5, 1.0, 0), (7, 0.0, 0)], "t int, x double, e int"
    )
    r = ts.cox_ph_single(df, "t", "e", "x").collect()[0]
    assert r.beta is None and r.hazard_ratio is None


# ---------------------------------------------------------------------------
# profile.cramers_v / g_test_independence, evaluation.two_proportion_z
# ---------------------------------------------------------------------------


def test_cramers_v_perfect_and_independent(spark):
    from icnarc_to_philips_linkage_spark.operators import profile as pr

    # perfect association: b == a -> V = 1
    perfect = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
    )
    r = pr.cramers_v(perfect, "a", "b").collect()[0]
    assert r.cramers_v == pytest.approx(1.0, abs=1e-6)
    # exact independence: uniform 2x2 -> chi2 = 0, V = 0
    indep = spark.createDataFrame(
        [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 3,
        "a string, b string",
    )
    r2 = pr.cramers_v(indep, "a", "b").collect()[0]
    assert r2.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r2.cramers_v == pytest.approx(0.0, abs=1e-6)
    # constant column -> NULL
    const = spark.createDataFrame(
        [("x", "u"), ("x", "v")], "a string, b string"
    )
    assert pr.cramers_v(const, "a", "b").collect()[0].cramers_v is None


def test_g_test_matches_reference(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators import profile as pr

    counts = {("x", "u"): 10, ("x", "v"): 20, ("y", "u"): 30,
              ("y", "v"): 5}
    rows = [(a, b) for (a, b), c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = pr.g_test_independence(df, "a", "b").collect()[0]
    n = sum(counts.values())
    ra = {"x": 30, "y": 35}
    cb = {"u": 40, "v": 25}
    g = sum(
        round(2.0 * o * math.log(o / (ra[a] * cb[b] / n)), 6)
        for (a, b), o in counts.items()
    )
    assert r.n == n and r.dof == 1
    assert r.g_stat == pytest.approx(g, abs=1e-5)


def test_two_proportion_z_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    # group1: 30/100, group2: 20/100
    rows = (
        [(True, True)] * 30 + [(True, False)] * 70
        + [(False, True)] * 20 + [(False, False)] * 80
    )
    df = spark.createDataFrame(rows, "g boolean, s boolean")
    r = ev.two_proportion_z(df, "g", "s").collect()[0]
    assert (r.n1, r.x1, r.n2, r.x2) == (100, 30, 100, 20)
    pp = 50 / 200
    se = (pp * (1 - pp) * (1 / 100 + 1 / 100)) ** 0.5
    assert r.z == pytest.approx(0.1 / se, abs=1e-9)
    assert r.lift == pytest.approx(0.1)


def test_two_proportion_z_degenerate_null(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    all_success = spark.createDataFrame(
        [(True, True), (False, True)], "g boolean, s boolean"
    )
    assert ev.two_proportion_z(all_success, "g", "s").collect()[0].z is None
