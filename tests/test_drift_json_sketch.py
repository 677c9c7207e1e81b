"""Unit tests for the round-5 additions: PSI/KS drift detection,
semi-structured JSON extraction, normalized dedup, duplicated-passage
profiling, and the HLL/theta sketch accuracy reports.

The registered queries' DuckDB oracles (tests/test_oracle.py) prove
engine-vs-engine equality; these tests pin the SEMANTICS on small
hand-built frames where the expected values are computable by eye.
"""

from __future__ import annotations

import pytest

# drift/index sweeps with heavy fixtures: the heavy lane
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import (
    dedup_scale,
    drift,
    profile,
    semistructured,
)
from icnarc_to_philips_linkage_spark.operators.text import normalize_expr


# ------------------------------------------------------------------ drift


def test_psi_identical_slices_is_zero(spark):
    df = spark.range(200).select((F.col("id") % 50).cast("double").alias("v"))
    rep = drift.psi_report(df, df, "v", lo=0.0, hi=50.0, bins=10).collect()
    assert len(rep) == 10
    for r in rep:
        assert r["psi_total"] == 0.0
        assert r["ks_stat"] == 0.0
        assert r["psi_contrib"] == 0.0
        assert r["p_ref"] == r["p_cur"]


def test_psi_detects_shift(spark):
    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = spark.range(1000).select(
        ((F.col("id") % 100) * 0.4 + 60.0).alias("v")  # mass shifted right
    )
    rep = drift.psi_report(ref, cur, "v", lo=0.0, hi=100.0, bins=10).collect()
    assert rep[0]["psi_total"] > 0.25  # "action" threshold
    assert 0.0 < rep[0]["ks_stat"] <= 1.0


def test_psi_tagged_equals_two_frame(spark):
    df = spark.range(500).select(
        (F.col("id") % 80).cast("double").alias("v"),
        (F.col("id") % 3 == 0).alias("is_ref"),
    )
    two = drift.psi_report(
        df.filter("is_ref"), df.filter("NOT is_ref"), "v", 0.0, 80.0, 8
    )
    one = drift.psi_report_tagged(df, F.col("is_ref"), "v", 0.0, 80.0, 8)
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))
    # single-scan claim: the tagged plan reads the source once
    plan = one._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") <= 1


def test_psi_clamps_out_of_range_into_edge_buckets(spark):
    ref = spark.createDataFrame([(-5.0,), (50.0,), (999.0,)], ["v"])
    rep = drift.psi_report(ref, ref, "v", lo=0.0, hi=100.0, bins=10).collect()
    buckets = sorted(r["bucket"] for r in rep)
    assert buckets == [0, 5, 9]  # -5 → 0, 999 → 9, nothing dropped
    total_ref = sum(r["n_ref"] for r in rep)
    assert total_ref == 3


# ------------------------------------------------------------- JSON ops


def test_extract_json_fields_types_and_malformed(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "s": "x"}'), (2, "not json"), (3, None), (4, '{"s": "y"}')],
        ["id", "props"],
    )
    out = semistructured.extract_json_fields(
        df, "props", {"k": ("$.k", "int"), "s": ("$.s", "string")}
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["k"] == 7 and rows[1]["s"] == "x"
    assert rows[2]["k"] is None and rows[2]["s"] is None  # malformed → NULL
    assert rows[3]["k"] is None  # NULL payload → NULL
    assert rows[4]["k"] is None and rows[4]["s"] == "y"  # missing field → NULL
    assert dict(out.dtypes)["k"] == "int"


def test_json_stats_aggregates(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 1}'), ("a", '{"k": 3}'), ("a", "{}"), ("b", '{"k": 10}')],
        ["g", "props"],
    )
    rows = {
        r["g"]: r
        for r in semistructured.json_stats(df, "props", "$.k", "g").collect()
    }
    assert rows["a"]["n_rows"] == 3 and rows["a"]["n_with_value"] == 2
    assert rows["a"]["value_sum"] == 4.0 and rows["a"]["value_avg"] == 2.0
    assert rows["b"]["value_min"] == 10.0 and rows["b"]["value_max"] == 10.0


# --------------------------------------------- normalized / passage dedup


def test_normalize_expr_canonicalizes(spark):
    df = spark.createDataFrame(
        [("  Hello,   WORLD!! ",), ("hello world",), ("HELLO\tworld.",)],
        ["t"],
    )
    vals = [r[0] for r in df.select(normalize_expr("t")).collect()]
    assert vals == ["hello world", "hello world", "hello world"]


def test_normalized_exact_dedup_merges_variants(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat."), (2, "the  CAT sat"), (3, "a different doc")],
        ["doc_id", "text"],
    )
    out = dedup_scale.normalized_exact_dedup(df).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep == {1: 2, 3: 1}


def test_duplicated_passage_report_flags_shared_boilerplate(spark):
    boiler = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
    rows = [
        (1, boiler + " unique1 a b c d e f g"),
        (2, boiler + " unique2 h i j k l m n"),
        (3, "totally different text with no shared passages at all ok"),
        (4, "short doc"),  # < n tokens → whole text is the single gram
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    rep = {r["doc_id"]: r for r in
           dedup_scale.duplicated_passage_report(df, n=8).collect()}
    assert rep[1]["n_dup_grams"] >= 1 and rep[1]["dup_fraction"] > 0
    assert rep[2]["n_dup_grams"] >= 1
    assert rep[3]["n_dup_grams"] == 0 and rep[3]["dup_fraction"] == 0.0
    assert rep[4]["n_grams"] == 1 and rep[4]["n_dup_grams"] == 0
    # doc 1: 16 tokens → 9 grams, of which exactly the boilerplate one
    # (position 1) is shared; grams overlapping the unique tail differ.
    assert rep[1]["n_grams"] == 9
    assert rep[1]["n_dup_grams"] == 1
    assert rep[1]["dup_fraction"] == round(1 / 9, 6)


# ---------------------------------------------------------- retrieval


def test_bm25_ranking_semantics(spark):
    from icnarc_to_philips_linkage_spark.operators.retrieval import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark runs fast"),   # many hits, short
            (2, "spark is here"),                 # one hit
            (3, "nothing relevant at all"),       # no hits → absent
            (4, "spark spark word word word word word word word word"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_search(docs, ["spark"], top_k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids
    assert ids[0] == 1  # highest tf, shortest doc wins
    scores = {r["doc_id"]: r["score"] for r in out}
    # doc 2 (tf=1, dl=3) outranks doc 4 (tf=2, dl=10): k1=1.2 saturates
    # the extra hit while b=0.75 penalizes the longer document
    assert scores[1] > scores[2] > scores[4]
    assert all(r["n_hits"] == 1 for r in out)  # one query term matched


def test_postings_index_bm25_parity_and_pushdown(spark, tmp_path):
    """Persisted inverted index: scoring a data-side term set against
    the bucketed postings table must (a) equal the literal-folding
    ``bm25_search`` on the same corpus/terms and (b) reach the postings
    scan with the term predicate pushed down (row-group skipping on the
    term-sorted layout)."""
    from icnarc_to_philips_linkage_spark.operators import retrieval
    from icnarc_to_philips_linkage_spark.plans.tables import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    terms = ["spark", "vector", "stream"]
    table = "postings_idx_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_stats")
    retrieval.write_postings_index(docs, table, str(tmp_path / "postings"))
    try:
        q = spark.createDataFrame([(t,) for t in terms], ["term"])
        got = retrieval.bm25_query_index(spark, table, q, top_k=20)
        want = retrieval.bm25_search(docs, terms, top_k=20)
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [In(term" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_stats")


def test_containment_detects_quotation(spark):
    from icnarc_to_philips_linkage_spark.operators.retrieval import (
        containment_pairs,
    )

    quote = "q1 q2 q3 q4 q5 q6 q7 q8 q9"  # 9 tokens → 2 8-grams
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, "intro words here then " + quote + " and a long tail t1 t2 t3"),
            (3, "unrelated content entirely different words throughout here ok"),
        ],
        ["doc_id", "text"],
    )
    out = containment_pairs(docs, n=8, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    assert (1, 2) in pairs and len(pairs) == 1
    r = pairs[(1, 2)]
    assert r["cont_a_in_b"] == 1.0  # the quote is fully contained
    assert r["cont_b_in_a"] < 1.0  # but not vice versa


# --------------------------------------------------- Fellegi–Sunter


def test_fs_score_weights_and_decisions(spark):
    import math

    from icnarc_to_philips_linkage_spark.operators.fuzzy import fs_score

    pairs = spark.createDataFrame(
        [(1, "a", "a"), (2, "a", "b"), (3, None, "a")], ["id", "l", "r"]
    )
    m, u = {"f": 0.9}, {"f": 0.1}
    w_a, w_d = math.log2(9.0), math.log2(1.0 / 9.0)
    out = {
        r["id"]: r
        for r in fs_score(
            pairs, {"f": F.col("l") == F.col("r")}, m, u,
            upper=1.0, lower=-1.0,
        ).collect()
    }
    assert out[1]["agree_f"] is True and out[1]["decision"] == "match"
    assert out[1]["match_weight"] == round(w_a, 6)
    assert out[2]["agree_f"] is False and out[2]["decision"] == "non_match"
    assert out[2]["match_weight"] == round(w_d, 6)
    # NULL field value → disagreement weight, not NULL propagation
    assert out[3]["agree_f"] is False and out[3]["decision"] == "non_match"


# -------------------------------------------------------- winsorization


def test_winsorize_report_bounds_and_counts(spark):
    # group x: 1..100 → p05=5.95, p95=95.05 → 5 below, 5 above
    rows = [("x", float(i)) for i in range(1, 101)] + [("y", 7.0)] * 4
    df = spark.createDataFrame(rows, ["g", "v"])
    # default is the mergeable approx sketch (scale path): bounds are
    # actual data elements near the requested ranks
    approx = {r["g"]: r for r in
              profile.winsorize_report(df, "g", "v").collect()}
    assert 1.0 <= approx["x"]["lo_bound"] <= 10.0
    assert 90.0 <= approx["x"]["hi_bound"] <= 100.0
    out = {r["g"]: r for r in
           profile.winsorize_report(df, "g", "v", exact=True).collect()}
    x = out["x"]
    assert x["n_rows"] == 100 and x["n_below"] == 5 and x["n_above"] == 5
    assert x["lo_bound"] == 5.95 and x["hi_bound"] == 95.05
    assert x["value_sum"] == 5050.0
    y = out["y"]  # constant group: bounds collapse, nothing outside
    assert y["n_below"] == 0 and y["n_above"] == 0
    assert y["lo_bound"] == y["hi_bound"] == 7.0


def test_rolling_zscore_flags_planted_spike(spark):
    from datetime import datetime

    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    rows = (
        # user 1: stable-ish series then a big spike at minute 9
        [(1, i, t(i), 10.0 + (i % 3)) for i in range(9)]
        + [(1, 9, t(9), 500.0)]
        # user 2: constant series — std 0, never flagged
        + [(2, 100 + i, t(i), 5.0) for i in range(10)]
        # user 3: spike but with only 3 trailing points — min_points guard
        + [(3, 200, t(0), 1.0), (3, 201, t(1), 1.5), (3, 202, t(2), 99.0)]
    )
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    out = rolling_zscore_anomalies(
        df, "user_id", "ts", "value", window_seconds=3600
    ).collect()
    flagged = {(r["user_id"], r["event_id"]) for r in out}
    assert (1, 9) in flagged
    assert all(u == 1 for u, _ in flagged)  # users 2 and 3 never flag
    z = {r["event_id"]: r["z"] for r in out}[9]
    assert z > 2.0


def test_mutual_information_extremes(spark):
    import math

    # independent uniform 2x2 → every contribution exactly 0
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(10)], ["x", "y"]
    )
    rows = profile.mutual_information(ind, "x", "y").collect()
    assert all(r["mi_contrib"] == 0.0 and r["mi_total"] == 0.0 for r in rows)
    # perfectly dependent binary → MI = ln 2
    dep = spark.createDataFrame(
        [("a", "a")] * 10 + [("b", "b")] * 10, ["x", "y"]
    )
    got = profile.mutual_information(dep, "x", "y").collect()[0]["mi_total"]
    assert got == round(math.log(2), 6)


# ------------------------------------------------------- event analytics


def test_funnel_requires_strict_order(spark):
    from datetime import datetime

    from icnarc_to_philips_linkage_spark.operators.events import funnel_steps

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    rows = [
        # user 1: full ordered funnel
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: click BEFORE view — click/purchase must not count
        (2, t(0), "click"), (2, t(1), "view"), (2, t(2), "purchase"),
        # user 3: view only
        (3, t(0), "view"),
        # user 4: purchase first, then view+click — purchase not counted
        (4, t(0), "purchase"), (4, t(1), "view"), (4, t(2), "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["step"]: r for r in
           funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert out["view"]["n_users"] == 4
    assert out["click"]["n_users"] == 2  # users 1 and 4
    assert out["purchase"]["n_users"] == 1  # user 1 only
    assert out["purchase"]["pct_of_first"] == 0.25
    # wait for user 2: view at t1 exists, but no click strictly after it
    # single-exchange claim: all step windows share one user partitioning
    plan = funnel_steps(df, ["view", "click", "purchase"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_retention_cohort_math(spark):
    from datetime import datetime

    from icnarc_to_philips_linkage_spark.operators.events import (
        retention_cohorts,
    )

    w0, w1 = datetime(2024, 1, 1, 12), datetime(2024, 1, 10, 12)  # Mon, next-week Wed
    rows = [
        (1, w0), (2, w0), (1, w1),           # cohort wk0: 2 users, 1 returns
        (3, w1),                              # cohort wk1: 1 user
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(str(r["cohort_week"]), r["week_offset"]): r
           for r in retention_cohorts(df).collect()}
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention_rate"] == 0.5
    assert out[("2024-01-08", 0)]["retention_rate"] == 1.0
    assert len(out) == 3


# ------------------------------------------------------------- sketches


def test_hll_accuracy_report_small_exact(spark):
    df = spark.createDataFrame(
        [(g, i % 7) for g in ("x", "y") for i in range(50)], ["g", "k"]
    )
    rows = {r["scope"]: r for r in
            profile.hll_accuracy_report(df, "g", "k").collect()}
    assert rows["x"]["exact_distinct"] == 7
    assert rows["__ALL__"]["exact_distinct"] == 7
    assert all(r["within_bound"] for r in rows.values())


def test_theta_set_cardinalities_inclusion_exclusion(spark):
    # A = {0..59}, B = {40..99}: |A∩B| = 20, |A∪B| = 100, |A\B| = 40
    rows = [("A", i) for i in range(60)] + [("B", i) for i in range(40, 100)]
    df = spark.createDataFrame(rows, ["flag", "k"])
    rep = {r["scope"]: r for r in
           profile.theta_set_cardinalities(df, "flag", "k", "A", "B").collect()}
    assert rep["a"]["exact_distinct"] == 60
    assert rep["b"]["exact_distinct"] == 60
    assert rep["union"]["exact_distinct"] == 100
    assert rep["intersection"]["exact_distinct"] == 20
    assert rep["difference"]["exact_distinct"] == 40
    assert all(r["within_bound"] for r in rep.values())


def test_wasserstein_scales_with_shift_distance(spark):
    """W1 distinguishes a near shift from a far shift of the SAME mass
    — the property PSI is blind to."""
    from pyspark.sql import functions as F

    from icnarc_to_philips_linkage_spark.operators.drift import (
        wasserstein_report,
    )

    def frame(cur_value):
        ref = [(1, 5.0)] * 100
        cur = [(0, float(cur_value))] * 100
        return spark.createDataFrame(ref + cur, "tag int, v double")

    near = wasserstein_report(
        frame(15.0), F.col("tag") == 1, "v", lo=0.0, hi=100.0, bins=10
    ).collect()[0].w1_total
    far = wasserstein_report(
        frame(95.0), F.col("tag") == 1, "v", lo=0.0, hi=100.0, bins=10
    ).collect()[0].w1_total
    assert far > near * 5  # 9 buckets away vs 1 bucket away
    # identical distributions → zero
    same = wasserstein_report(
        frame(5.0), F.col("tag") == 1, "v", lo=0.0, hi=100.0, bins=10
    ).collect()[0].w1_total
    assert same == 0.0
