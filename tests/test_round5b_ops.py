"""Unit tests for the round-5 second-wave operators: SemDeDup-style
semantic dedup, truncated-window EWMA, native session windows, and the
char-trigram LM quality score. The DuckDB differentials live in
test_oracle.py (all four carry full oracles); these pin the semantic
edge cases the differential can't isolate.
"""

from __future__ import annotations

import math

import pytest

# broad operator-golden sweep (oracle suite also covers these ops): the heavy lane
pytestmark = pytest.mark.slow
from pyspark.sql import Row
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import similarity, text
from icnarc_to_philips_linkage_spark.operators.timeseries import ewma_window

DIM = 4


def _vec(*xs):
    return [float(x) for x in xs]


def test_semantic_dedup_min_id_survivor(spark):
    # two identical vectors (cos=1) and one orthogonal-ish outlier:
    # identical pair lands in one cluster, smaller id survives
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=_vec(1, 0, 0, 0)),
            Row(vec_id=2, embedding=_vec(1, 0, 0, 0)),
            Row(vec_id=3, embedding=_vec(-1, 5, -7, 2)),
        ]
    )
    out = similarity.semantic_dedup(
        df, threshold=0.9, n_planes=3, dim=DIM
    ).collect()
    kept = {r.vec_id: r.kept for r in out}
    assert kept[1] is True
    assert kept[2] is False  # dominated by id 1 in the same cluster
    assert kept[3] is True  # alone (or dissimilar) → survives
    clusters = {r.vec_id: r.cluster for r in out}
    assert clusters[1] == clusters[2]  # identical vectors co-cluster


def test_semantic_dedup_cross_cluster_duplicates_not_compared(spark):
    # identical vectors ALWAYS share a cluster (same signature), but
    # dissimilar ones may too; kept only depends on within-cluster sims
    df = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=_vec(0.5, 0.5, 0.5, 0.5)),
            Row(vec_id=11, embedding=_vec(0.5, 0.5, 0.5, 0.5)),
            Row(vec_id=12, embedding=_vec(0.5, 0.5, 0.5, 0.51)),
        ]
    )
    out = {
        r.vec_id: r
        for r in similarity.semantic_dedup(
            df, threshold=0.999, n_planes=2, dim=DIM
        ).collect()
    }
    assert out[10].kept and not out[11].kept
    # near-identical third vector shares the cluster and exceeds the
    # threshold against id 10 → dropped too
    assert out[12].cluster == out[10].cluster
    assert not out[12].kept


def test_ewma_window_constant_series_is_identity(spark):
    rows = [Row(k=1, ts=i, x=5.0, rid=i) for i in range(30)]
    df = spark.createDataFrame(rows)
    out = ewma_window(df, "k", "ts", "x", alpha=0.4, window=10, tiebreak="rid")
    for r in out.collect():
        assert r.ewma == pytest.approx(5.0, abs=1e-9)


def test_ewma_window_first_row_equals_value_and_nulls_renormalize(spark):
    rows = [
        Row(k=1, ts=1, x=10.0, rid=1),
        Row(k=1, ts=2, x=None, rid=2),
        Row(k=1, ts=3, x=20.0, rid=3),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, x double, rid long")
    got = {
        r.rid: r.ewma
        for r in ewma_window(
            df, "k", "ts", "x", alpha=0.5, window=4, tiebreak="rid"
        ).collect()
    }
    assert got[1] == pytest.approx(10.0)
    # row 2: value NULL; only lag-1 (=10) contributes → renormalized 10
    assert got[2] == pytest.approx(10.0)
    # row 3: x=20 (w=1), lag1 NULL skipped, lag2=10 (w=0.25)
    assert got[3] == pytest.approx((20.0 + 0.25 * 10.0) / 1.25)


def test_ewma_window_matches_untruncated_recursion_when_window_covers(spark):
    # window >= series length ⇒ truncated EWMA == pandas adjust=True ewm
    import pandas as pd

    xs = [3.0, 7.0, 1.0, 9.0, 4.0]
    rows = [Row(k=1, ts=i, x=v, rid=i) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows)
    got = [
        r.ewma
        for r in ewma_window(
            df, "k", "ts", "x", alpha=0.3, window=50, tiebreak="rid"
        )
        .orderBy("ts")
        .collect()
    ]
    want = pd.Series(xs).ewm(alpha=0.3, adjust=True).mean().tolist()
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-6)


def test_chargrams_short_and_empty_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="ab"), Row(doc_id=2, text=""), Row(doc_id=3, text="a b!  c")]
    )
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", text.chargrams("text", 3).alias("g")
        ).collect()
    }
    assert out[1] == []
    assert out[2] == []
    # normalized "a b c" → trigrams of the normalized string
    assert out[3] == ["a b", " b ", "b c"]


def test_ngram_lm_score_short_docs_score_null(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the same text here"),
            Row(doc_id=2, text="the same text here"),
            Row(doc_id=3, text="xy"),
        ]
    )
    out = {r.doc_id: r for r in text.ngram_lm_score(df).collect()}
    assert out[3].n_grams == 0 and out[3].bits_per_gram is None
    # identical docs score identically
    assert out[1].bits_per_gram == out[2].bits_per_gram
    assert out[1].n_grams == len("the same text here") - 2


def test_ngram_lm_score_flags_unusual_doc(spark):
    common = [
        Row(doc_id=i, text="the quick brown fox jumps over the lazy dog")
        for i in range(10)
    ]
    odd = [Row(doc_id=99, text="zzqx jvzz qxjv zzzq xqzv jqzx")]
    out = {
        r.doc_id: r.bits_per_gram
        for r in text.ngram_lm_score(
            spark.createDataFrame(common + odd)
        ).collect()
    }
    assert out[99] > out[0]  # rare grams cost more bits


def test_session_window_gap_semantics(spark):
    # events at t=0, 10, 50 min with a 30-min gap → sessions {0,10}, {50}
    base = "2024-01-01 00:{:02d}:00"
    rows = [
        Row(user_id=1, ts=base.format(0)),
        Row(user_id=1, ts=base.format(10)),
        Row(user_id=1, ts=base.format(50)),
    ]
    df = spark.createDataFrame(rows).select(
        "user_id", F.to_timestamp("ts").alias("ts"), F.lit(1.0).alias("value")
    )
    sess = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "w.start", "w.end", "n")
        .orderBy("start")
        .collect()
    )
    assert len(sess) == 2
    assert sess[0].n == 2 and sess[1].n == 1
    # session end = last event + gap
    assert (sess[0].end - sess[0].start).total_seconds() == 40 * 60


def test_dsir_weights_separate_target_like_docs(spark):
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        dsir_log_weights,
    )

    rows = (
        [Row(doc_id=i, text="alpha beta gamma", src="target") for i in range(5)]
        + [Row(doc_id=10 + i, text="delta epsilon zeta", src="raw") for i in range(5)]
        + [Row(doc_id=20, text="alpha beta gamma", src="raw")]  # target-like raw doc
        + [Row(doc_id=21, text="", src="raw")]
    )
    df = spark.createDataFrame(rows)
    out = {
        r.doc_id: r
        for r in dsir_log_weights(df, F.col("src") == "target").collect()
    }
    # target-like raw doc scores strictly higher than raw-like raw docs
    assert out[20].log_weight > out[10].log_weight
    # empty doc: no tokens, NULL weight
    assert out[21].n_tokens == 0 and out[21].log_weight is None
    assert out[0].n_tokens == 3


def test_bpe_pair_counts_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators.text import bpe_pair_counts

    # "abab" twice, "ab" once: pair 'ab' = 2*2 + 1 = 5, 'ba' = 2
    df = spark.createDataFrame(
        [Row(doc_id=1, text="abab abab"), Row(doc_id=2, text="ab x")]
    )
    out = {r.pair: (r.pair_n, r.rk) for r in bpe_pair_counts(df).collect()}
    assert out["ab"] == (5, 1)
    assert out["ba"] == (2, 2)
    assert "x" not in out  # single-char words contribute no pairs


def test_mad_outlier_report_flags_planted_spike(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        mad_outlier_report,
    )

    vals = [10.0] * 20 + [11.0] * 20 + [9.0] * 20 + [1000.0]
    df = spark.createDataFrame([(("g"), v) for v in vals], "g string, v double")
    out = mad_outlier_report(df, "g", "v", k=3.0).collect()[0]
    assert out.med == 10.0 and out.mad == 1.0
    assert out.n_outliers == 1  # only the 1000.0 spike: |1000-10| > 3*1
    assert out.n == 61


def test_mad_is_robust_where_mean_would_drag(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        mad_outlier_report,
    )

    # half the data is a far cloud — median/MAD still flag nothing
    # (50% breakdown): all points sit within 3 MAD of the median.
    # exact=True: the interpolated exact median gives MAD = 2 here;
    # the approx default's discrete quantile degenerates to MAD = 0 on
    # an exactly-bimodal 50/50 split (a known MAD pitfall, not an
    # approx defect — the second assertion pins the approx path on a
    # split where the discrete median is itself robust)
    vals = [10.0] * 30 + [14.0] * 30
    df = spark.createDataFrame([(("g"), v) for v in vals], "g string, v double")
    out = mad_outlier_report(df, "g", "v", k=3.0, exact=True).collect()[0]
    assert out.n_outliers == 0

    vals2 = [10.0] * 40 + [14.0] * 21
    df2 = spark.createDataFrame(
        [(("g"), v) for v in vals2], "g string, v double"
    )
    out2 = mad_outlier_report(df2, "g", "v", k=1.0).collect()[0]
    assert out2.med == 10.0 and out2.mad == 0.0
    assert out2.n_outliers == 21  # the far cloud, under the tight k=1


def test_group_linreg_recovers_planted_line(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import group_linreg

    rows = [("a", float(x), 2.0 * x + 5.0) for x in range(1, 50)]
    rows += [("const", 7.0, 3.0), ("const", 7.0, 9.0)]  # zero x-variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in group_linreg(df, "g", "x", "y", scale=1).collect()}
    assert out["a"].slope == pytest.approx(2.0, abs=1e-6)
    assert out["a"].intercept == pytest.approx(5.0, abs=1e-6)
    assert out["a"].r2 == pytest.approx(1.0, abs=1e-6)
    assert out["const"].slope is None and out["const"].r2 is None


def test_association_rules_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators.events import (
        association_rules,
    )

    # users: 1:{x,y}, 2:{x,y}, 3:{x}, 4:{y,z}
    rows = [
        (1, "x"), (1, "y"), (1, "y"),  # duplicate event collapses
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "y"), (4, "z"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r.item_a, r.item_b): r for r in association_rules(df).collect()
    }
    xy = out[("x", "y")]
    assert xy.n_ab == 2
    assert xy.support == pytest.approx(2 / 4)
    assert xy.conf_a_to_b == pytest.approx(2 / 3)  # P(y|x)
    assert xy.conf_b_to_a == pytest.approx(2 / 3)  # P(x|y)
    assert xy.lift == pytest.approx((2 * 4) / (3 * 3))
    assert ("y", "z") in out and out[("y", "z")].n_ab == 1
    assert ("x", "z") not in out  # never co-occur


def test_rollup_incremental_equals_direct_aggregation(spark, tmp_path):
    from icnarc_to_philips_linkage_spark.operators.rollup import (
        read_rollup_state,
        rollup_apply,
        rollup_values,
    )

    d = str(tmp_path / "rollup")
    b1 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    b2 = spark.createDataFrame(
        [("a", 5.0), ("b", 2.0), ("c", 7.0)], "k string, v double"
    )
    assert rollup_apply(b1, d, ["k"], ["v"], batch_id=0)
    assert rollup_apply(b2, d, ["k"], ["v"], batch_id=1)
    got = {
        r.k: r
        for r in rollup_values(
            read_rollup_state(spark, d), ["v"]
        ).collect()
    }
    # equal to aggregating b1 ∪ b2 directly
    assert got["a"].n == 3 and got["a"].sum_v == 9.0
    assert got["a"].min_v == 1.0 and got["a"].max_v == 5.0
    assert got["a"].avg_v == 3.0
    assert got["b"].n == 2 and got["b"].min_v == 2.0 and got["b"].max_v == 10.0
    assert got["c"].n == 1 and got["c"].sum_v == 7.0


def test_rollup_retry_of_applied_batch_is_noop(spark, tmp_path):
    from icnarc_to_philips_linkage_spark.operators.rollup import (
        read_rollup_state,
        rollup_apply,
        rollup_values,
    )

    d = str(tmp_path / "rollup2")
    b = spark.createDataFrame([("a", 4.0)], "k string, v double")
    assert rollup_apply(b, d, ["k"], ["v"], batch_id=0) is True
    # redelivery of the SAME batch id must not double-count
    assert rollup_apply(b, d, ["k"], ["v"], batch_id=0) is False
    got = rollup_values(read_rollup_state(spark, d), ["v"]).collect()[0]
    assert got.n == 1 and got.sum_v == 4.0


def test_rollup_streaming_twin(spark, tmp_path):
    from icnarc_to_philips_linkage_spark.operators.rollup import (
        read_rollup_state,
        rollup_values,
        start_rollup_stream,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, v double"
    ).write.parquet(src)
    stream = spark.readStream.schema("k string, v double").parquet(src)
    q = start_rollup_stream(stream, table, ["k"], ["v"], ckpt)
    q.awaitTermination(120)
    # second file → second micro-batch folds incrementally
    spark.createDataFrame([("a", 9.0)], "k string, v double").write.mode(
        "append"
    ).parquet(src)
    q2 = start_rollup_stream(
        spark.readStream.schema("k string, v double").parquet(src),
        table, ["k"], ["v"], ckpt,
    )
    q2.awaitTermination(120)
    got = {
        r.k: r
        for r in rollup_values(
            read_rollup_state(spark, table), ["v"]
        ).collect()
    }
    assert got["a"].n == 2 and got["a"].sum_v == 10.0
    assert got["b"].n == 1


def test_negative_samples_properties(spark):
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.createDataFrame([(i,) for i in range(1, 21)], "doc_id long")
    out = negative_samples(df, "doc_id", k=4, salt="s1").collect()
    assert len(out) == 20 * 4
    for r in out:
        assert r.negative_id != r.anchor_id  # never self
        assert 1 <= r.negative_id <= 20
    # deterministic: same salt reproduces, different salt diverges
    again = negative_samples(df, "doc_id", k=4, salt="s1").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = negative_samples(df, "doc_id", k=4, salt="s2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_negative_samples_rejects_degenerate_corpus(spark):
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        negative_samples(df, "doc_id", k=2)


def test_blocklist_filter_rate_decision(spark):
    from icnarc_to_philips_linkage_spark.operators.pii import blocklist_filter

    rows = [
        (1, "clean words " * 100),                       # 0 hits -> kept
        (2, "badword " * 10 + "ok"),                     # dense -> dropped
        (3, "lottery " + "benign filler words " * 200),  # dilute -> kept
        (4, ""),                                          # empty -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in blocklist_filter(df).collect()}
    assert out[1].kept and out[1].hit_rate_per_1k == 0.0
    assert not out[2].kept and out[2].n_profanity == 10
    assert out[3].kept and out[3].n_spamlike == 1  # length-normalized
    assert out[4].kept and out[4].n_tokens == 0


def test_knn_graph_every_node_sees_its_duplicate(spark):
    # identical vectors share a bucket and cosine 1.0 — each must list
    # the other as its top neighbor; graph covers ALL nodes (no query set)
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = similarity.knn_graph_lsh(df, k=2, n_planes=3, dim=4).collect()
    top = {}
    for r in out:
        top.setdefault(r.node_id, []).append((r.cos_sim, r.neighbor_id))
    assert max(top[1])[1] == 2 and max(top[2])[1] == 1
    assert max(top[3])[1] == 4 and max(top[4])[1] == 3
    assert max(top[1])[0] == 1.0


def test_rollup_avg_with_null_measures_matches_direct(spark, tmp_path):
    from icnarc_to_philips_linkage_spark.operators.rollup import (
        read_rollup_state,
        rollup_apply,
        rollup_values,
    )

    d = str(tmp_path / "rollup_nulls")
    b = spark.createDataFrame(
        [("a", None), ("a", 4.0), ("n", None)], "k string, v double"
    )
    rollup_apply(b, d, ["k"], ["v"], batch_id=0)
    got = {
        r.k: r
        for r in rollup_values(read_rollup_state(spark, d), ["v"]).collect()
    }
    # avg divides by NON-NULL count, exactly like F.avg
    assert got["a"].n == 2 and got["a"].avg_v == 4.0
    # all-NULL group: defined n, NULL avg (like F.avg over all NULLs)
    assert got["n"].n == 1 and got["n"].avg_v is None


def test_fragmentation_report_recurses_and_compaction_guards(spark, tmp_path):
    from icnarc_to_philips_linkage_spark.sources.layout import (
        compact_parquet,
        file_fragmentation_report,
    )

    part = str(tmp_path / "hive")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, d string"
    ).write.partitionBy("d").parquet(part)
    stats = file_fragmentation_report(spark, part)
    assert stats.n_files >= 2 and stats.total_bytes > 0
    assert stats.partitioned
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, part, str(tmp_path / "out"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no parquet"):
        compact_parquet(spark, str(empty), str(tmp_path / "out2"))


def test_association_rules_null_users_excluded(spark):
    from icnarc_to_philips_linkage_spark.operators.events import (
        association_rules,
    )

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (None, "x")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = association_rules(df).collect()[0]
    # the NULL user can never pair, so it must not dilute support
    assert r.support == 1.0 and r.n_ab == 2


def test_blocklist_escapes_regex_metachars(spark):
    from icnarc_to_philips_linkage_spark.operators.pii import blocklist_filter

    cats = (("lang", ("c++", "a.b")),)
    df = spark.createDataFrame(
        [(1, "i love c++ but axb is not a.b")], "doc_id long, text string"
    )
    out = blocklist_filter(df, categories=cats).collect()[0]
    # 'c++' matches literally; 'a.b' must NOT match 'axb'
    assert out.n_lang == 2


def test_concurrency_profile_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators.events import (
        concurrency_profile,
    )

    # sessions of 1h at 10:00, 10:30, 12:00 → hourly concurrency:
    # 10:00 bucket +2; 11:00 bucket: 10:00 ends (-1), 10:30 ends at
    # 11:30 (-1 lands in 11:00 bucket)... buckets: starts 10:00(+2),
    # 12:00(+1); ends 11:00(-1), 11:30->11:00(-1), 13:00(-1)
    rows = [
        ("2024-01-01 10:00:00",),
        ("2024-01-01 10:30:00",),
        ("2024-01-01 12:00:00",),
    ]
    df = spark.createDataFrame(rows, "t string").select(
        F.to_timestamp("t").alias("ts")
    )
    out = {
        r.bucket_start.hour: r.concurrent
        for r in concurrency_profile(df).collect()
    }
    assert out[10] == 2   # both morning sessions active
    assert out[11] == 0   # both ended (bucket-granular)
    assert out[12] == 1
    assert out[13] == 0   # everything closed


def test_key_skew_report_flags_hot_key(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        key_skew_report,
    )

    rows = [(0,)] * 90 + [(i,) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_report(df, "k", top_k=3).collect()
    assert out[0].k == 0 and out[0].rank == 1
    assert out[0].pct_of_total == 0.9
    # mean rows/key = 100/11; skew = 90 / (100/11) = 9.9
    assert out[0].skew_factor == pytest.approx(9.9)
    assert len(out) == 3


def test_column_profile_nulls_and_mode(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        column_profile,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None), (None, 3)],
        "s string, x int",
    )
    out = {r.col: r for r in column_profile(df, ["s", "x"]).collect()}
    assert out["s"].n_rows == 4 and out["s"].n_nulls == 1
    assert out["s"].n_distinct == 2 and out["s"].top_value == "a"
    assert out["s"].top_n == 2
    assert out["x"].n_nulls == 2 and out["x"].null_frac == 0.5


def test_weighted_reservoir_topk_properties(spark):
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        weighted_reservoir_topk,
    )

    rows = [(i, float(i % 10 + 1)) for i in range(200)] + [(999, 0.0), (998, None)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_reservoir_topk(df, "id", "w", k=20).collect()
    assert len(out) == 20
    assert [r.rank for r in out] == list(range(1, 21))
    picked = {r.id for r in out}
    assert 999 not in picked and 998 not in picked  # zero/NULL weight
    # deterministic
    again = {r.id for r in weighted_reservoir_topk(df, "id", "w", k=20).collect()}
    assert picked == again
    # heavier weights are overrepresented: mean weight of the sample
    # exceeds the population mean (statistical but deterministic here)
    pop_mean = sum((i % 10 + 1) for i in range(200)) / 200
    samp_mean = sum(r.weight for r in out) / 20
    assert samp_mean > pop_mean


def test_split_leakage_detects_planted_duplicates(spark):
    from icnarc_to_philips_linkage_spark.operators.checks import (
        split_leakage_report,
    )

    # 200 unique docs + every doc duplicated under a shifted id: with
    # an 80/20 split ~2*0.8*0.2=32% of digests straddle both splits
    docs = [(i, f"unique text {i}") for i in range(200)]
    dupes = [(1000 + i, f"unique text {i}") for i in range(200)]
    df = spark.createDataFrame(docs + dupes, "doc_id long, text string")
    r = split_leakage_report(df).collect()[0]
    assert r.n_docs == 400 and r.n_digests == 200
    assert r.n_leaked_digests > 20  # well above zero
    assert r.n_leaked_docs == 2 * r.n_leaked_digests
    # and a dup-free corpus reports zero
    clean = split_leakage_report(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).collect()[0]
    assert clean.n_leaked_digests == 0 and clean.leaked_doc_frac == 0.0


def test_concurrency_profile_respects_bucket_unit(spark):
    from icnarc_to_philips_linkage_spark.operators.events import (
        concurrency_profile,
    )

    rows = [("2024-01-01 10:00:00",), ("2024-01-01 10:20:00",)]
    df = spark.createDataFrame(rows, "t string").select(
        F.to_timestamp("t").alias("ts")
    )
    # minute resolution: sessions of 30min each → distinct start buckets
    out = concurrency_profile(
        df, duration="30 minutes", bucket_unit="minute"
    ).collect()
    starts = {r.bucket_start.minute for r in out if r.delta > 0}
    assert starts == {0, 20}  # hourly truncation would collapse to {0}


def test_split_leakage_null_text_not_a_phantom_digest(spark):
    from icnarc_to_philips_linkage_spark.operators.checks import (
        split_leakage_report,
    )

    rows = [(i, None) for i in range(50)] + [(100 + i, f"t{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = split_leakage_report(df).collect()[0]
    assert r.n_leaked_digests == 0  # NULL texts must not fake a leak
    assert r.n_docs == 50  # only non-NULL-text docs screened


def test_rollup_migrates_pre_cnt_state(spark, tmp_path):
    import os

    from icnarc_to_philips_linkage_spark.operators.rollup import (
        read_rollup_state,
        rollup_apply,
        rollup_values,
    )

    d = str(tmp_path / "legacy")
    os.makedirs(d)
    # hand-write a LEGACY state (no __cnt_v column) + pointer
    from decimal import Decimal

    spark.createDataFrame(
        [("a", 2, Decimal("6.0"), 1.0, 5.0)],
        "k string, __n long, __sum_v decimal(38,6), __min_v double, __max_v double",
    ).write.parquet(os.path.join(d, "v0"))
    with open(os.path.join(d, "_CURRENT"), "w") as f:
        f.write("v0")
    b = spark.createDataFrame([("a", 4.0)], "k string, v double")
    assert rollup_apply(b, d, ["k"], ["v"], batch_id=1)
    got = rollup_values(read_rollup_state(spark, d), ["v"]).collect()[0]
    assert got.n == 3 and got.sum_v == 10.0
    assert got.avg_v == pytest.approx(10.0 / 3, abs=1e-6)


def test_tokens_to_ids_and_key_skew_no_global_window_over_full_table(spark):
    from icnarc_to_philips_linkage_spark.operators.profile import (
        key_skew_report,
    )
    from icnarc_to_philips_linkage_spark.operators.text import tokens_to_ids
    from icnarc_to_philips_linkage_spark.plans.tables import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    plan = (
        tokens_to_ids(docs, vocab_size=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    ev = load(spark, SF_SMOKE, "events")
    plan2 = (
        key_skew_report(ev, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan2, plan2


def test_observed_filter_one_pass_metrics(spark):
    from icnarc_to_philips_linkage_spark.operators.checks import (
        observed_filter,
    )

    df = spark.range(1000).withColumn("v", F.col("id") % 10)
    kept, obs = observed_filter(df, F.col("v") < 3, "m1")
    n = kept.count()  # the action that materializes the observation
    assert n == 300
    got = obs.get
    assert got["n_seen"] == 1000 and got["n_kept"] == 300
    assert got["kept_frac"] == 0.3


def test_rollup_prune_versions_keeps_pointer_and_recent(spark, tmp_path):
    from icnarc_to_philips_linkage_spark.operators.rollup import (
        prune_versions,
        read_rollup_state,
        rollup_apply,
        rollup_values,
    )

    d = str(tmp_path / "r")
    for i in range(6):
        b = spark.createDataFrame([("a", float(i))], "k string, v double")
        rollup_apply(b, d, ["k"], ["v"], batch_id=i)
    removed = prune_versions(d, keep_last=2)
    assert removed == ["v0", "v1", "v2", "v3"]  # keeps v4 + pointed v5
    # state still readable and correct after the vacuum
    got = rollup_values(read_rollup_state(spark, d), ["v"]).collect()[0]
    assert got.n == 6 and got.sum_v == 15.0


def test_rolling_distinct_users_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators.events import (
        rolling_distinct_users,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 11:00:00"),
        (1, "2024-01-05 10:00:00"),  # same user again within window
        (3, "2024-01-20 10:00:00"),  # after an activity gap
    ]
    df = spark.createDataFrame(rows, "user_id long, t string").select(
        "user_id", F.to_timestamp("t").alias("ts")
    )
    out = {
        str(r.day): r.n_active
        for r in rolling_distinct_users(df, window_days=7).collect()
    }
    assert out["2024-01-01"] == 2          # users 1,2
    assert out["2024-01-07"] == 2          # both Jan-1 events still in window
    assert out["2024-01-08"] == 1          # Jan-1 aged out; user1's Jan-5 remains
    assert out["2024-01-12"] == 0          # gap day: explicit zero, not missing
    assert out["2024-01-20"] == 1          # user3 after the gap
    assert "2024-01-21" not in out         # clipped at max observed day
    assert len(out) == 20                  # full calendar spine Jan 1-20
    with pytest.raises(ValueError):
        rolling_distinct_users(df, window_days=0)
