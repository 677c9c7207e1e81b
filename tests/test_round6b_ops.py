"""Round-6 second wave: Count-Min sketch, chi-square independence,
Poisson bootstrap."""

import math

import pytest

# broad operator-golden sweep (oracle suite also covers these ops): the heavy lane
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F


def test_countmin_estimate_dominates_and_is_tight_when_sparse(spark):
    """est >= exact always; with far fewer keys than cells the min over
    depth rows is exact for every key."""
    from icnarc_to_philips_linkage_spark.operators.profile import (
        countmin_estimate,
        countmin_sketch,
    )

    rows = [(k,) for k in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"] * 1]
    df = spark.createDataFrame(rows, "k string")
    sk = countmin_sketch(df, "k", depth=4, width=256)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz",)], "k string")
    est = {r.k: r.cms_est for r in countmin_estimate(sk, keys, "k").collect()}
    exact = {"a": 50, "b": 20, "c": 5, "d": 1, "zz": 0}
    for k, n in exact.items():
        assert est[k] >= n
    # 4 keys into 4x256 cells: collisions essentially impossible with
    # fixed md5 hashing — estimates are exact, including the absent key
    assert est == exact


def test_countmin_sketch_is_mergeable(spark):
    """Cell-wise sum of two half-corpus sketches equals the sketch of
    the union — the property that makes it a scale sketch."""
    from icnarc_to_philips_linkage_spark.operators.profile import (
        countmin_sketch,
    )

    rows = [(i, f"k{i % 17}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string").select("k", "id")
    left = df.filter(F.col("id") < 100)
    right = df.filter(F.col("id") >= 100)
    merged = (
        countmin_sketch(left, "k")
        .unionByName(countmin_sketch(right, "k"))
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    whole = countmin_sketch(df, "k")
    a = {(r.d, r.bucket): r.n for r in merged.collect()}
    b = {(r.d, r.bucket): r.n for r in whole.collect()}
    assert a == b


def test_chi_square_independent_vs_dependent(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        chi_square_independence,
    )

    # perfectly independent 2x2 (all cells 25): chi2 == 0
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(25)],
        "a string, b string",
    )
    out = chi_square_independence(indep, "a", "b").collect()
    assert all(r.chi2 == 0.0 for r in out)
    assert out[0].dof == 1
    # perfectly dependent: a==x iff b==u; chi2 == n
    dep_rows = [("x", "u")] * 30 + [("y", "v")] * 30
    dep = spark.createDataFrame(dep_rows, "a string, b string")
    out2 = chi_square_independence(dep, "a", "b").collect()
    assert all(r.chi2 == pytest.approx(60.0, abs=1e-6) for r in out2)


def test_poisson_bootstrap_weights_and_means(spark):
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        poisson_bootstrap_means,
    )

    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(2000)], "id long, v double"
    )
    out = poisson_bootstrap_means(df, "id", "v", replicates=8).collect()
    assert len(out) == 8
    true_mean = sum(i % 10 for i in range(2000)) / 2000
    means = [r.boot_mean for r in out]
    # Poisson(1) weights: n_eff ≈ n, replicate means cluster around the
    # sample mean with sd ≈ sd(v)/sqrt(n) ≈ 0.064 — allow 5 sigma
    for r in out:
        assert abs(r.n_eff - 2000) < 250
    for m in means:
        assert abs(m - true_mean) < 5 * 2.87 / math.sqrt(2000)
    # determinism: same salt → identical replicate means
    again = sorted(
        r.boot_mean
        for r in poisson_bootstrap_means(df, "id", "v", replicates=8).collect()
    )
    assert again == sorted(means)


def test_group_capped_sample_caps_and_plans_group_limit(spark):
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        group_capped_sample,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)], "id long, g string"
    )
    out = group_capped_sample(df, "g", "id", 5)
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # deterministic: same selection on rerun
    ids = sorted(r.id for r in out.collect())
    assert ids == sorted(r.id for r in group_capped_sample(df, "g", "id", 5).collect())
    # small groups survive uncapped
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, g string")
    assert group_capped_sample(tiny, "g", "id", 5).count() == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_countmin_streaming_maintenance_via_rollup(spark, tmp_path):
    """Composition: CMS cell partials fold through the incremental
    rollup state machinery — a continuously-maintained heavy-hitter
    sketch with the rollup's exactly-once batch guard. The maintained
    state must equal the sketch of the union corpus."""
    from icnarc_to_philips_linkage_spark.operators.profile import (
        countmin_sketch,
    )
    from icnarc_to_philips_linkage_spark.operators.rollup import (
        read_rollup_state,
        rollup_apply,
        rollup_values,
    )

    d = str(tmp_path / "cms_state")
    b1 = spark.createDataFrame([(f"k{i % 7}",) for i in range(60)], "k string")
    b2 = spark.createDataFrame([(f"k{i % 11}",) for i in range(40)], "k string")
    for i, b in enumerate([b1, b2]):
        cells = countmin_sketch(b, "k").select(
            "d", "bucket", F.col("n").cast("double").alias("n")
        )
        assert rollup_apply(cells, d, ["d", "bucket"], ["n"], batch_id=i)
    # replay of batch 0 must be a no-op (sums are not idempotent)
    cells0 = countmin_sketch(b1, "k").select(
        "d", "bucket", F.col("n").cast("double").alias("n")
    )
    assert rollup_apply(cells0, d, ["d", "bucket"], ["n"], batch_id=0) is False
    state = rollup_values(read_rollup_state(spark, d), ["n"])
    got = {(r.d, r.bucket): int(r.sum_n) for r in state.collect()}
    want = {
        (r.d, r.bucket): r.n
        for r in countmin_sketch(b1.unionByName(b2), "k").collect()
    }
    assert got == want


def test_rrf_fuse_hand_case(spark):
    """Fusion math: doc in both lists beats docs in one; reciprocal
    terms use k + rank; missing-in-one-ranker docs still score."""
    from icnarc_to_philips_linkage_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], k=60, top_k=10).collect()}
    assert out[20].n_rankers == 2 and out[10].n_rankers == 1
    assert out[20].rrf_score == pytest.approx(
        round(1 / 62, 9) + round(1 / 61, 9), abs=1e-12
    )
    assert out[10].rrf_score == pytest.approx(round(1 / 61, 9), abs=1e-12)
    # both-lists doc outranks every single-list doc here
    best = max(out.values(), key=lambda r: r.rrf_score)
    assert best.doc_id == 20


def test_ohlc_bars_hand_case(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        ohlc_bars,
    )

    rows = [
        (1, "2024-01-01 10:05:00", 5.0, 1),
        (1, "2024-01-01 10:10:00", 9.0, 2),
        (1, "2024-01-01 10:20:00", 2.0, 3),
        (1, "2024-01-01 10:59:00", 7.0, 4),
        (1, "2024-01-01 11:01:00", 3.0, 5),
        # same-timestamp tie inside the 10:00 bar: id 0 wins open
        (1, "2024-01-01 10:05:00", 6.0, 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.user_id, str(r.bucket_start)): r for r in ohlc_bars(df).collect()
    }
    bar = out[(1, "2024-01-01 10:00:00")]
    assert (bar.open, bar.high, bar.low, bar.close, bar.n) == (
        6.0, 9.0, 2.0, 7.0, 5
    )
    assert out[(1, "2024-01-01 11:00:00")].open == 3.0


def test_gini_known_distributions(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        gini_concentration,
    )

    # perfectly equal: gini 0
    eq = spark.createDataFrame(
        [(k, 10.0) for k in range(50)], "k long, v double"
    )
    assert gini_concentration(eq, "k", "v").collect()[0].gini == 0.0
    # maximal concentration over n keys: gini = (n-1)/n
    n = 40
    conc = spark.createDataFrame(
        [(0, 1000.0)] + [(k, 0.0) for k in range(1, n)], "k long, v double"
    )
    got = gini_concentration(conc, "k", "v").collect()[0]
    assert got.gini == pytest.approx((n - 1) / n, abs=1e-9)
    assert got.n_keys == n


def test_referential_integrity_flags_planted_orphans(spark):
    from icnarc_to_philips_linkage_spark.operators.checks import (
        referential_integrity_report,
    )

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], "id long, fk long"
    )
    out = {
        r.fk_name: r
        for r in referential_integrity_report(
            [("child->parent", child, "fk", parent, "pk")]
        ).collect()
    }
    r = out["child->parent"]
    assert (r.n_child, r.n_null_keys, r.n_orphans, r.ok) == (4, 1, 1, False)


def test_percentile_disc_counting_definition(spark):
    """PERCENTILE_DISC: smallest value whose cume_dist >= p."""
    from icnarc_to_philips_linkage_spark.operators.profile import (
        percentile_disc_counting,
    )

    df = spark.createDataFrame(
        [("g", v) for v in [1, 2, 2, 3, 10]], "g string, v long"
    )
    got = {
        r.p: r.value
        for r in percentile_disc_counting(
            df, "g", "v", ps=(0.2, 0.5, 0.8, 1.0)
        ).collect()
    }
    # cume_dist: 1→0.2, 2→0.6, 3→0.8, 10→1.0
    assert got == {0.2: 1, 0.5: 2, 0.8: 3, 1.0: 10}


def test_entropy_by_group_known_values(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.profile import (
        entropy_by_group,
    )

    rows = (
        [("uniform", c) for c in "abcd" * 10]
        + [("single", "x")] * 20
        + [("skew", "a")] * 30
        + [("skew", "b")] * 10
    )
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r.g: r for r in entropy_by_group(df, "g", "c").collect()}
    assert got["uniform"].entropy_bits == 2.0  # log2(4)
    assert got["single"].entropy_bits == 0.0
    want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert got["skew"].entropy_bits == pytest.approx(want, abs=1e-6)
    assert got["skew"].n_categories == 2


def test_pagerank_known_graphs(spark):
    from icnarc_to_philips_linkage_spark.operators.graph import pagerank

    # symmetric 2-cycle: ranks equal and = teleport + d * rank (≈ 1/2)
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r.node: float(r.rank) for r in pagerank(cyc).collect()}
    assert got["a"] == got["b"]
    assert got["a"] == pytest.approx(0.5, abs=1e-9)
    # undirected star on 4 leaves: center outranks every leaf
    star_edges = [("c", x) for x in "wxyz"] + [(x, "c") for x in "wxyz"]
    star = spark.createDataFrame(star_edges, "src string, dst string")
    pr = {r.node: float(r.rank) for r in pagerank(star).collect()}
    assert all(pr["c"] > pr[x] for x in "wxyz")
    assert pr["w"] == pr["z"]
    # iteration count respected: more iterations move ranks toward the
    # stationary distribution monotonically for the star center
    pr1 = {r.node: float(r.rank) for r in pagerank(star, iterations=1).collect()}
    assert abs(pr["c"] - 1 / 3) < abs(pr1["c"] - 1 / 3) or pr["c"] == pr1["c"]


def test_pagerank_dangling_and_empty(spark):
    from icnarc_to_philips_linkage_spark.operators.graph import pagerank

    # b is dangling (no out-edges): keeps only the teleport floor after
    # its inflow is dropped; a still gets teleport
    dag = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: float(r.rank) for r in pagerank(dag, iterations=3).collect()}
    assert got["b"] > got["a"]  # b receives a's mass, a only teleport
    assert got["a"] == pytest.approx(0.15 / 2, abs=1e-9)
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0


def test_grouped_global_rank_matches_window_semantics(spark):
    """Two-level grouped rank == row_number() OVER (PARTITION BY g
    ORDER BY ...) for every group, across partition boundaries."""
    from pyspark.sql import Window

    from icnarc_to_philips_linkage_spark.operators.scale import (
        grouped_global_rank,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 4}", (i * 37) % 101) for i in range(500)],
        "id long, g string, v long",
    )
    got = {
        (r.g, r.id): r.rank
        for r in grouped_global_rank(df, ["g"], ["v", "id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r.g, r.id): r.rn
        for r in df.select(
            "g", "id", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == want
    # dense 1..n_g per group
    sizes = {}
    for (g, _), rk in got.items():
        sizes.setdefault(g, set()).add(rk)
    for g, rks in sizes.items():
        assert rks == set(range(1, len(rks) + 1)), g


def test_bpe_train_classic_corpus(spark):
    """The canonical Sennrich example must reproduce the textbook merge
    order: es, est, lo, low, ...; merges are greedy by weighted pair
    frequency with deterministic ties."""
    from icnarc_to_philips_linkage_spark.operators.text import bpe_train

    corpus = spark.createDataFrame(
        [
            (
                "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest",
            )
        ],
        "text string",
    )
    merges = [
        (r.step, r.left, r.right, r.merged, r.pair_n)
        for r in bpe_train(corpus, n_merges=4).collect()
    ]
    assert merges == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_bpe_apply_merge_handles_overlaps(spark):
    """'aaa' under merge (a,a): left-to-right gives [aa, a], not [a, aa]
    and never a double merge."""
    from icnarc_to_philips_linkage_spark.operators.text import _apply_merge

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    got = df.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).collect()
    assert got[0].m == ["aa", "a"]


def test_multimodal_phash_pipeline_planted_recall(spark):
    """End-to-end synth→decode→dHash→banded-join: every planted
    near-dup pair found, no false positives among the md5-textured
    distinct images."""
    from icnarc_to_philips_linkage_spark.operators import multimodal

    ids = spark.range(120).select(F.col("id").alias("media_id"))
    media = multimodal.synth_png_media(ids, near_dup_mod=13)
    hashes = multimodal.perceptual_dhash(media)
    got = {
        (r.id_a, r.id_b)
        for r in multimodal.phash_neardup(hashes, max_hamming=6).collect()
    }
    planted = {(i - 1, i) for i in range(1, 120) if i % 13 == 0}
    assert got == planted


def test_read_parquet_evolved_unions_added_columns(spark, tmp_path):
    """Files written before a column existed read back with NULLs in
    that column; both generations survive in one frame."""
    from icnarc_to_philips_linkage_spark.sources.readers import (
        read_parquet_evolved,
    )

    d = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        d + "/gen=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(d + "/gen=2")
    out = read_parquet_evolved(spark, d)
    assert set(out.columns) >= {"id", "name", "score"}
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_cusum_detects_planted_mean_shift(spark):
    """A level shift halfway through the series must raise an alarm
    shortly after onset; a stationary series must not alarm."""
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        cusum_alarms,
    )

    rows = []
    for i in range(200):
        # key 1: shift of +3 (in raw units ≈ +3σ) from i=100
        v = (i % 7 - 3) * 0.3 + (3.0 if i >= 100 else 0.0)
        rows.append((1, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", v))
        # key 2: stationary
        rows.append((2, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", (i % 7 - 3) * 0.3))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = cusum_alarms(df, "user_id", "ts", "value").collect()
    alarms1 = sorted(
        r.ts for r in out if r.user_id == 1 and r.alarm
    )
    alarms2 = [r for r in out if r.user_id == 2 and r.alarm]
    assert alarms1, "shift must alarm"
    # first alarm lands after onset (minute >= 100) and not too late
    first = alarms1[0]
    minute = first.hour * 60 + first.minute
    assert 100 <= minute <= 140
    assert not alarms2, "stationary series must not alarm"


def test_phash_and_bootstrap_parameter_guards(spark):
    import pytest as _pytest

    from icnarc_to_philips_linkage_spark.operators.multimodal import (
        phash_neardup,
    )
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        poisson_bootstrap_means,
    )

    df = spark.createDataFrame([(1, 2)], "media_id long, phash long")
    with _pytest.raises(ValueError):
        phash_neardup(df, max_hamming=16)
    with _pytest.raises(ValueError):
        phash_neardup(df, max_hamming=-1)
    vdf = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with _pytest.raises(ValueError):
        poisson_bootstrap_means(vdf, "id", "v", replicates=0)
