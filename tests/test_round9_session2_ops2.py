"""Round-9 session-2 batch 2: link prediction, bitext mining, PRF,
training-trajectory cartography."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# graph.resource_allocation_links
# ---------------------------------------------------------------------------


def test_ra_links_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (4, 3), (1, 5), (2, 5), (1, 2)],
        "node_id long, neighbor_id long",
    )
    out = graph.resource_allocation_links(edges, top_k=10).collect()
    rows = {(r.node_a, r.node_b): r for r in out}
    # 1,2,4 share neighbor 3 (indeg 3 -> weight 1/3); (1,2) is adjacent
    # so only (1,4) and (2,4) survive
    assert set(rows) == {(1, 4), (2, 4)}
    assert rows[(1, 4)].n_common == 1
    assert rows[(1, 4)].ra_score == pytest.approx(1 / 3, abs=1e-6)


def test_ra_links_hub_exclusion(spark):
    """A target whose in-degree exceeds max_in_degree contributes no
    wedges (the LSH max_bucket_size discipline)."""
    from icnarc_to_philips_linkage_spark.operators import graph

    hub = [(i, 99) for i in range(1, 8)]  # 7 nodes -> hub 99
    edges = spark.createDataFrame(
        hub + [(1, 50), (2, 50)], "node_id long, neighbor_id long"
    )
    out = graph.resource_allocation_links(
        edges, max_in_degree=5, top_k=100
    ).collect()
    # hub 99 excluded: only the (1,2) wedge through 50 remains
    assert {(r.node_a, r.node_b) for r in out} == {(1, 2)}
    assert out[0].ra_score == pytest.approx(0.5, abs=1e-6)


# ---------------------------------------------------------------------------
# similarity.margin_bitext_mine
# ---------------------------------------------------------------------------


def test_margin_bitext_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import similarity

    left = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.6, 0.8]), (12, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.margin_bitext_mine(left, right, knn=2, top_m=2)
    rows = {(r.query_id, r.neighbor_id): r for r in out.collect()}
    # x0 NN2 avg = (1.0+0.6)/2 = 0.8; y10 avg among queries = 0.5
    # margin(x0,y10) = 1.0 / ((0.8+0.5)/2) = 1.538462
    assert rows[(0, 10)].margin == pytest.approx(1.538462, abs=1e-6)
    # margin(x0,y11) = 0.6 / ((0.8+0.7)/2) = 0.8
    assert rows[(0, 11)].margin == pytest.approx(0.8, abs=1e-6)
    # x1 NN2 avg = (1.0+0.8)/2 = 0.9; y12 avg = 0.5
    assert rows[(1, 12)].margin == pytest.approx(
        1.0 / ((0.9 + 0.5) / 2), abs=1e-6
    )
    assert rows[(1, 11)].margin == pytest.approx(1.0, abs=1e-6)
    # top_m=2 per query, cos_sim reattached
    assert len(rows) == 4
    assert rows[(0, 10)].cos_sim == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# retrieval.rocchio_prf_search
# ---------------------------------------------------------------------------


def test_rocchio_expansion_recalls_unmatched_doc(spark):
    """A doc sharing NO original query term but containing the
    feedback-characteristic term is retrieved after expansion."""
    from icnarc_to_philips_linkage_spark.operators import retrieval

    rows = [
        (1, "spark zebra zebra zebra"),
        (2, "spark zebra zebra"),
        (3, "zebra crossing only"),          # no query term
        (4, "unrelated words entirely"),
        (5, "spark alone"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval.rocchio_prf_search(
        docs, ["spark"], fb_k=3, expand_k=1, beta=0.5, top_k=10
    )
    got = {r.doc_id: r for r in out.collect()}
    # feedback docs = {1,2,5}; "zebra" dominates fb_tf*idf
    # (tf 5 x idf(df=3) beats any tf-1 term's idf(df=1)) -> doc 3 scores
    assert 3 in got and got[3].score > 0
    assert 4 not in got
    # docs matching both original + expansion outrank expansion-only
    assert got[1].score > got[3].score


def test_rocchio_excluded_terms_never_expand(spark):
    from icnarc_to_philips_linkage_spark.operators import retrieval

    rows = [
        (1, "spark zebra zebra"),
        (2, "spark zebra"),
        (3, "zebra zebra zebra"),
        (4, "quiet words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval.rocchio_prf_search(
        docs, ["spark"], fb_k=2, expand_k=1, beta=0.5,
        exclude_terms=("zebra",), top_k=10,
    )
    got = {r.doc_id for r in out.collect()}
    # zebra banned -> doc 3 can only enter via another expansion term;
    # the only remaining feedback term would be none (docs 1,2 are all
    # spark/zebra) -> doc 3 absent
    assert 3 not in got


# ---------------------------------------------------------------------------
# regression: trajectory + cartography
# ---------------------------------------------------------------------------


def test_gd_trajectory_last_equals_gd_train(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    df = spark.createDataFrame(
        [(0.1, 1), (0.9, 0), (0.4, 1), (0.8, 0)], "x double, y int"
    )
    traj = regression.gd_train_trajectory(df, ["x"], "y", iters=3)
    w = regression.gd_train(df, ["x"], "y", iters=3)
    assert len(traj) == 3
    assert traj[-1] == w
    # snapshots all differ (training is moving)
    assert traj[0] != traj[1]


def test_cartography_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    df = spark.createDataFrame(
        [(0.0, 1, "flat"), (3.0, 1, "move")], "x double, y int, tag string"
    )
    # two snapshots: zero weights, then feature weight 1 (no bias)
    traj = [[0.0, 0.0], [0.0, 1.0]]
    out = {
        r.tag: r
        for r in regression.cartography_map(
            df, ["x"], "y", traj, conf_hi=0.55, conf_lo=0.45, var_hi=0.02
        ).collect()
    }
    # x=0: z=0 at both snapshots -> p=.5 twice -> conf .5, var 0 -> middle
    assert out["flat"].confidence == pytest.approx(0.5)
    assert out["flat"].variability == pytest.approx(0.0)
    assert out["flat"].bucket == "middle"
    # x=3: p = .5 then sigma(3) = .5*(1+3/4) = .875
    # conf = .6875; msq = (.25+.765625)/2; sd = .1875 -> ambiguous
    assert out["move"].confidence == pytest.approx(0.6875)
    assert out["move"].variability == pytest.approx(0.1875)
    assert out["move"].bucket == "ambiguous"


def test_cartography_needs_trajectory(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    df = spark.createDataFrame([(0.0, 1)], "x double, y int")
    with pytest.raises(ValueError):
        regression.cartography_map(df, ["x"], "y", [])


# ---------------------------------------------------------------------------
# clustering.power_iteration_top_pc
# ---------------------------------------------------------------------------


def test_power_iteration_matches_numpy(spark):
    """On a strongly anisotropic cloud the power direction aligns with
    numpy's dominant eigenvector of X^T X after a few iterations."""
    import numpy as np

    from icnarc_to_philips_linkage_spark.operators import clustering

    rng = np.random.RandomState(7)
    base = rng.randn(200, 3) * np.array([5.0, 1.0, 0.2])
    rows = [(r.tolist(),) for r in base.astype("float32")]
    df = spark.createDataFrame(rows, "embedding array<float>")
    v, z, norm2, n = clustering.power_iteration_top_pc(
        df, dim=3, iters=8
    )
    assert n == 200 and norm2 > 0
    # unit norm
    assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-9)
    x = np.array([list(map(np.float32, r[0])) for r in rows], dtype=np.float64)
    w_np, vecs = np.linalg.eigh(x.T @ x)
    top = vecs[:, -1]
    align = abs(float(np.dot(top, np.array(v))))
    assert align > 0.999


def test_power_iteration_empty_and_ragged(spark):
    from icnarc_to_philips_linkage_spark.operators import clustering

    df = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0],), (None,)], "embedding array<float>"
    )
    # ragged + null rows filtered; only the dim-2 row participates
    v, z, norm2, n = clustering.power_iteration_top_pc(df, dim=2, iters=3)
    assert n == 1
    assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# similarity.maxsim_score
# ---------------------------------------------------------------------------


def test_maxsim_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import similarity

    q = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    c = spark.createDataFrame(
        [(10, 1, [1.0, 0.0]), (11, 2, [0.0, 1.0]), (12, 2, [0.6, 0.8])],
        "vec_id long, label int, embedding array<float>",
    )
    out = {r.label: r for r in similarity.maxsim_score(q, c).collect()}
    # g1: max(1,0)=1 for q0, max(0,?)... q1 vs [1,0] = 0 -> 1.0
    assert out[1].score == pytest.approx(1.0)
    assert out[1].n_vectors == 1
    # g2: q0 best = 0.6 ([0.6,.8]); q1 best = 1.0 ([0,1]) -> 1.6
    assert out[2].score == pytest.approx(1.6)
    assert out[2].n_vectors == 2


# ---------------------------------------------------------------------------
# graph.label_propagation
# ---------------------------------------------------------------------------


def test_label_propagation_two_triangles(spark):
    """Two triangles joined by a bridge resolve to the hand-traced
    label assignment under synchronous min-tie LPA."""
    from icnarc_to_philips_linkage_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "node_id long, neighbor_id long",
    )
    out = {
        r.node: r.label
        for r in graph.label_propagation(edges, iters=2).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 3, 6: 3}


def test_label_propagation_components_stay_separate(spark):
    from icnarc_to_philips_linkage_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (3, 4)], "node_id long, neighbor_id long"
    )
    out = {
        r.node: r.label
        for r in graph.label_propagation(edges, iters=3).collect()
    }
    # each pair oscillates/settles within itself; no cross-component label
    assert set(out) == {1, 2, 3, 4}
    assert {out[1], out[2]} <= {1, 2}
    assert {out[3], out[4]} <= {3, 4}


# ---------------------------------------------------------------------------
# sampling.ht_total_estimate
# ---------------------------------------------------------------------------


def test_ht_estimate_properties(spark):
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    rows = (
        [(i, "full", 10) for i in range(20)]
        + [(100 + i, "half", 7) for i in range(40)]
        + [(1000 + i, "none", 3) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars int")
    out = {
        r.stratum: r
        for r in sa.ht_total_estimate(
            df, "lang", "n_chars",
            {"full": 1.0, "half": 0.5, "none": 0.0},
        ).collect()
    }
    # pi=1: estimator is exact
    assert out["full"].n_sampled == 20
    assert out["full"].ht_total == pytest.approx(200.0)
    assert out["full"].rel_err == pytest.approx(0.0)
    # pi=0.5: ht = sampled_sum / 0.5
    h = out["half"]
    assert 0 < h.n_sampled < 40
    assert h.ht_total == pytest.approx(h.n_sampled * 7 / 0.5)
    assert h.true_total == 280
    # pi=0: no estimate
    assert out["none"].ht_total is None and out["none"].rel_err is None


# ---------------------------------------------------------------------------
# fuzzy.fs_em_estimate
# ---------------------------------------------------------------------------


def test_fs_em_recovers_planted_mixture(spark):
    """EM on a planted two-class mixture recovers m >> u and a
    prevalence near the planted 10%."""
    import random

    from icnarc_to_philips_linkage_spark.operators import fuzzy

    rng = random.Random(42)
    rows = []
    for _ in range(5000):
        is_match = rng.random() < 0.1
        pm = 0.9 if is_match else 0.15
        rows.append(tuple(int(rng.random() < pm) for _ in range(3)))
    df = spark.createDataFrame(rows, "g1 int, g2 int, g3 int")
    params, n = fuzzy.fs_em_estimate(df, ["g1", "g2", "g3"], iters=25)
    got = {r.field: r for r in params.collect()}
    assert n == 5000
    for f in ("g1", "g2", "g3"):
        assert got[f].m > 0.75, got[f]
        assert got[f].u < 0.25, got[f]
        assert 0.05 < got[f].p < 0.2, got[f]


def test_fs_em_empty_and_validation(spark):
    from icnarc_to_philips_linkage_spark.operators import fuzzy
    import pytest as _pt

    df = spark.createDataFrame([], "g1 int")
    params, n = fuzzy.fs_em_estimate(df, ["g1"], iters=3)
    assert n == 0
    r = params.collect()[0]
    # no data: parameters stay at their initial values
    assert r.m == _pt.approx(0.8) and r.u == _pt.approx(0.2)
    with _pt.raises(ValueError):
        fuzzy.fs_em_estimate(df, [], iters=1)


# ---------------------------------------------------------------------------
# timeseries.stl_decompose
# ---------------------------------------------------------------------------


def test_stl_decompose_hand_computed(spark):
    """Linear trend + period-3 seasonal signal decomposes exactly:
    trend recovers the line, seasonal recovers the pattern, interior
    residuals are 0, edge rows get NULL trend/resid."""
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    sig = [0, 3, -3]
    rows = [
        ("k", d, (d + 1) + sig[d % 3], d % 3) for d in range(9)
    ]
    df = spark.createDataFrame(rows, "k string, t int, x int, season int")
    out = {
        r.t: r
        for r in ts.stl_decompose(
            df, "k", "t", "x", "season", trend_window=3
        ).collect()
    }
    assert out[0].trend is None and out[0].resid is None
    for d in range(1, 8):
        assert out[d].trend == pytest.approx(d + 1), d
        assert out[d].resid == pytest.approx(0.0), d
    # seasonal means: season 1 -> +3, season 2 -> -3, season 0 -> 0
    assert out[1].seasonal == pytest.approx(3.0)
    assert out[2].seasonal == pytest.approx(-3.0)
    assert out[3].seasonal == pytest.approx(0.0)


def test_stl_decompose_requires_odd_window(spark):
    from icnarc_to_philips_linkage_spark.operators import timeseries as ts

    df = spark.createDataFrame([("k", 1, 1, 0)], "k string, t int, x int, s int")
    with pytest.raises(ValueError):
        ts.stl_decompose(df, "k", "t", "x", "s", trend_window=4)


# ---------------------------------------------------------------------------
# dedup_scale.bloom_fpr_report
# ---------------------------------------------------------------------------


def test_bloom_fpr_no_false_negatives(spark):
    """Every truly-present probe hits (Bloom's contract); FPR is
    measured only over the truly-absent probes."""
    from icnarc_to_philips_linkage_spark.operators import dedup_scale

    build = spark.createDataFrame(
        [(f"v{i}",) for i in range(50)], "digest string"
    )
    probe = spark.createDataFrame(
        [(f"v{i}",) for i in range(30, 80)], "digest string"
    )
    r = dedup_scale.bloom_fpr_report(
        build, probe, "digest", num_bits=256, k=4
    ).collect()[0]
    assert r.n_build_distinct == 50 and r.n_probes == 50
    assert r.n_true_present == 20
    # no false negatives: every present probe is among the hits
    assert r.n_hits >= 20
    assert r.n_false_pos == r.n_hits - 20
    if r.n_probes > r.n_true_present:
        assert r.fpr == pytest.approx(
            r.n_false_pos / (r.n_probes - r.n_true_present), abs=1e-6
        )
    assert 0 < r.bits_set <= 256


def test_bloom_fpr_saturated_filter_hits_everything(spark):
    """An undersized filter saturates: every probe hits."""
    from icnarc_to_philips_linkage_spark.operators import dedup_scale

    build = spark.createDataFrame(
        [(f"x{i}",) for i in range(500)], "digest string"
    )
    probe = spark.createDataFrame(
        [(f"y{i}",) for i in range(50)], "digest string"
    )
    r = dedup_scale.bloom_fpr_report(
        build, probe, "digest", num_bits=64, k=3
    ).collect()[0]
    assert r.bits_set == 64 and r.fpr == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# evaluation.auc_bootstrap_ci
# ---------------------------------------------------------------------------


def test_auc_bootstrap_perfect_separation(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    rows = [(i, 0.9 + i * 1e-4, 1) for i in range(30)] + [
        (100 + i, 0.1 + i * 1e-4, 0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k long, p double, y int")
    r = ev.auc_bootstrap_ci(df, "p", "y", "k", n_resamples=10).collect()[0]
    # every resample separates perfectly (weights can't reorder scores)
    assert r.auc == pytest.approx(1.0)
    assert r.ci_lo == pytest.approx(1.0) and r.ci_hi == pytest.approx(1.0)


def test_auc_bootstrap_ci_brackets_point(spark):
    import random

    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    rng = random.Random(3)
    rows = []
    for i in range(2000):
        y = rng.random() < 0.4
        p = min(1.0, max(0.0, rng.gauss(0.6 if y else 0.45, 0.15)))
        rows.append((i, round(p, 4), int(y)))
    df = spark.createDataFrame(rows, "k long, p double, y int")
    r = ev.auc_bootstrap_ci(df, "p", "y", "k", n_resamples=20).collect()[0]
    assert 0.5 < r.auc < 1.0
    assert r.ci_lo <= r.auc <= r.ci_hi
    assert r.ci_lo <= r.auc_med <= r.ci_hi
    # the interval is non-degenerate but tight at n=2000
    assert 0 < (r.ci_hi - r.ci_lo) < 0.1


# ---------------------------------------------------------------------------
# sampling.temperature_mixture / events.markov_steady_state
# ---------------------------------------------------------------------------


def test_temperature_mixture_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import sampling as sa

    rows = [("big",)] * 80 + [("small",)] * 20
    df = spark.createDataFrame(rows, "dom string")
    out = {r.domain: r for r in sa.temperature_mixture(df, "dom").collect()}
    # sqrt(.8)/(sqrt(.8)+sqrt(.2)) = 2/3 exactly
    assert out["big"].weight == pytest.approx(2 / 3, abs=1e-6)
    assert out["small"].weight == pytest.approx(1 / 3, abs=1e-6)
    # small domain gets upsampled: effective epochs > 1
    assert out["small"].effective_epochs == pytest.approx(5 / 3, abs=1e-6)
    assert out["big"].effective_epochs < 1


def test_markov_steady_state_cycle_and_absorbing(spark):
    import datetime as dt

    from icnarc_to_philips_linkage_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    # user 1 alternates a,b forever (cycle); user 2 ends in c (absorbing)
    rows = [
        (1, t0 + dt.timedelta(minutes=i), "a" if i % 2 == 0 else "b", i)
        for i in range(20)
    ] + [
        (2, t0 + dt.timedelta(minutes=i), s, 100 + i)
        for i, s in enumerate(["a", "c", "c", "c"])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {
        r.state: r
        for r in ev.markov_steady_state(
            df, ["a", "b", "c"], iters=50
        ).collect()
    }
    # c is absorbing-ish (c->c dominates); mass should accumulate there
    # relative to the uniform start, and pi sums to ~1
    total = sum(r.pi for r in out.values())
    assert total == pytest.approx(1.0, abs=1e-6)
    assert out["c"].pi > 1 / 3
    assert out["c"].out_transitions == 2  # c->c twice


def test_markov_requires_sorted_states(spark):
    from icnarc_to_philips_linkage_spark.operators import events as ev

    df = spark.createDataFrame(
        [(1, None, "a", 1)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    with pytest.raises(ValueError):
        ev.markov_steady_state(df, ["b", "a"])


# ---------------------------------------------------------------------------
# pii.t_closeness_report / evaluation.mcc_at_threshold
# ---------------------------------------------------------------------------


def test_t_closeness_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import pii

    # global: x:6, y:4 (N=10); group A: {x:3} -> d = .5(|1-.6|+|0-.4|) = .4
    rows = [(1, "x")] * 3 + [(2, "x")] * 3 + [(2, "y")] * 4
    df = spark.createDataFrame(rows, "g int, s string")
    out = {
        r.g: r
        for r in pii.t_closeness_report(df, ["g"], "s", t=0.3).collect()
    }
    assert out[1].t_distance == pytest.approx(0.4)
    assert out[1].t_violation
    # group 2: {x:3, y:4}, p_g=(3/7,4/7) vs (.6,.4): d = .5(|3/7-.6|+|4/7-.4|)
    d2 = 0.5 * (abs(3 / 7 - 0.6) + abs(4 / 7 - 0.4))
    assert out[2].t_distance == pytest.approx(round(d2, 6), abs=1e-6)
    assert not out[2].t_violation


def test_mcc_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    # tp=4, fp=1, fn=2, tn=3
    rows = (
        [(0.9, 1)] * 4 + [(0.9, 0)] * 1 + [(0.1, 1)] * 2 + [(0.1, 0)] * 3
    )
    df = spark.createDataFrame(rows, "p double, y int")
    r = ev.mcc_at_threshold(df, "p", "y", 0.5).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (4, 1, 2, 3)
    num = 4 * 3 - 1 * 2
    den = (5 * 6 * 4 * 5) ** 0.5
    assert r.mcc == pytest.approx(num / den, abs=1e-9)


def test_mcc_degenerate_is_null(spark):
    from icnarc_to_philips_linkage_spark.operators import evaluation as ev

    df = spark.createDataFrame([(0.9, 1), (0.8, 1)], "p double, y int")
    assert ev.mcc_at_threshold(df, "p", "y").collect()[0].mcc is None
