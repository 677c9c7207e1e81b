"""Round-9 contract tests: the ADVICE.md r8 fixes.

- quantile_normalize NULL pass-through (the documented contract is
  now implemented, not just claimed)
- gd_train unscaled-feature guard (ValueError instead of silent
  quantizer degradation past 2^53)
- forecast_eval densify (gap-free grid keeps the seasonal row-lag
  calendar-aligned on sparse series)
- mann_whitney_u / kruskal_wallis now rank via global_prefix_sums —
  re-pin the hand-computed values through the new path
"""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# quantile_normalize: NULL pass-through
# ---------------------------------------------------------------------------


def test_quantile_normalize_null_rows_pass_through(spark):
    """Rows with NULL value or NULL source appear in the output with
    NULL v_norm and take no part in either distribution."""
    from icnarc_to_philips_linkage_spark.operators.scale import (
        quantile_normalize,
    )

    rows = [
        ("a", 1, 10),
        ("a", 2, 20),
        ("b", 3, 10),
        ("b", 4, 20),
        ("a", 5, None),  # NULL value
        (None, 6, 30),  # NULL source
    ]
    df = spark.createDataFrame(rows, "src string, id long, v long")
    out = quantile_normalize(df, "src", "v", "id").collect()
    assert len(out) == 6  # nothing dropped
    by_id = {r.id: r for r in out}
    assert by_id[5].v_norm is None and by_id[6].v_norm is None
    # the NULL rows did not join the pooled distribution: pooled is
    # {10,10,20,20}, so every non-null v_norm is 10 or 20 (id 6's
    # v=30 would otherwise be the pooled max)
    assert {by_id[i].v_norm for i in (1, 2, 3, 4)} <= {10, 20}


# ---------------------------------------------------------------------------
# gd_train: pre-scaling guard
# ---------------------------------------------------------------------------


def test_gd_train_unscaled_feature_raises(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    rows = [(float(i) * 1e7, i % 2) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "x double, y int")
    with pytest.raises(ValueError, match="Pre-scale"):
        regression.gd_train(df, ["x"], "y", iters=1)


def test_gd_train_scaled_feature_passes_guard(spark):
    from icnarc_to_philips_linkage_spark.operators import regression

    rows = [(float(i) / 10.0, i % 2) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "x double, y int")
    w = regression.gd_train(df, ["x"], "y", iters=2)
    assert len(w) == 2 and all(isinstance(x, float) for x in w)


# ---------------------------------------------------------------------------
# forecast_eval: densify
# ---------------------------------------------------------------------------


def test_forecast_eval_densify_fills_gaps_with_zero(spark):
    """A sparse daily series: days 0,1,3 present, day 2 missing.
    Without densify the season-1 'lag' pairs (1,3) as adjacent;
    with densify='1 day' day 2 exists with n=0, so the lag pairs
    are (0,1),(1,2),(2,3) over the filled grid."""
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        forecast_eval,
    )

    d0 = dt.datetime(2024, 1, 1)
    rows = [
        ("g", d0, 5),
        ("g", d0 + dt.timedelta(days=1), 7),
        ("g", d0 + dt.timedelta(days=3), 9),
    ]
    df = spark.createDataFrame(rows, "g string, t timestamp, n long")

    sparse = forecast_eval(df, "g", "t", "n", season=1).collect()[0]
    # sparse: errors |7-5| + |9-7| = 4 over 2 forecasts
    assert sparse.n_naive == 2 and sparse.mae_naive == 2.0

    dense = forecast_eval(
        df, "g", "t", "n", season=1, densify="1 day"
    ).collect()[0]
    # filled series 5,7,0,9: errors |7-5|+|0-7|+|9-0| = 18 over 3
    assert dense.n_naive == 3
    assert dense.mae_naive == 6.0


def test_forecast_eval_densify_noop_on_gap_free_grid(spark):
    """densify must be a no-op when the grid is already gap-free."""
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        forecast_eval,
    )

    d0 = dt.datetime(2024, 3, 1)
    ys = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [("g", d0 + dt.timedelta(days=i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t timestamp, n long")
    a = forecast_eval(df, "g", "t", "n", season=3).collect()[0]
    b = forecast_eval(df, "g", "t", "n", season=3, densify="1 day").collect()[
        0
    ]
    assert a == b


# ---------------------------------------------------------------------------
# MWU / KW through global_prefix_sums: re-pin hand values
# ---------------------------------------------------------------------------


def test_mann_whitney_hand_values_via_prefix_sums(spark):
    """Groups a=[1,2,4], b=[3,5]: ranks 1..5, R_a = 1+2+4 = 7,
    U_a = 7 - 3*4/2 = 1."""
    from icnarc_to_philips_linkage_spark.operators import profile

    rows = [("a", 1), ("a", 2), ("a", 4), ("b", 3), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert (out.n_a, out.n_b, out.u_a) == (3, 2, 1.0)


def test_mann_whitney_ties_averaged(spark):
    """All values tied: U_a = n_a*n_b/2 exactly, variance 0 -> NULL z."""
    from icnarc_to_philips_linkage_spark.operators import profile

    rows = [("a", 7)] * 3 + [("b", 7)] * 2
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert out.u_a == 3.0  # 3*2/2
    assert out.z is None


def test_kruskal_wallis_hand_values_via_prefix_sums(spark):
    """Three groups, no ties: H = 12/(n(n+1)) * sum(R_g^2/n_g) - 3(n+1)."""
    from icnarc_to_philips_linkage_spark.operators import profile

    groups = {"a": [1, 4], "b": [2, 5], "c": [3, 6]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    out = profile.kruskal_wallis(df, "g", "v").collect()[0]
    # ranks: 1..6; R_a=1+4=5, R_b=2+5=7, R_c=3+6=9
    n = 6
    h = 12.0 / (n * (n + 1)) * (25 / 2 + 49 / 2 + 81 / 2) - 3 * (n + 1)
    assert out.k == 3 and out.n == 6
    assert out.h_stat == round(h, 6)


# ---------------------------------------------------------------------------
# remove_duplicate_spans (Lee et al. 2022 action half)
# ---------------------------------------------------------------------------

SPAN = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


def test_span_removal_planted_copy_survives_exactly_once(spark):
    """A 10-token span planted in 3 docs (incl. twice in one doc):
    the output corpus contains it exactly once — in the minimal-id
    document — and unique text is untouched."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        remove_duplicate_spans,
    )

    rows = [
        (1, "alpha beta " + SPAN + " gamma delta"),
        (2, "intro words here " + SPAN + " closing remark now"),
        (3, "unique content with no duplicated passage at all present"),
        (4, SPAN + " " + SPAN),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(df, n=8).collect()}
    corpus = " ".join(out[i].text_dedup for i in sorted(out))
    assert corpus.count(SPAN) == 1
    assert SPAN in out[1].text_dedup  # keeper = min doc_id
    assert out[1].n_removed == 0
    assert out[2].text_dedup == "intro words here closing remark now"
    assert out[2].n_removed == 10
    assert out[3].text_dedup == rows[2][1]  # unique doc untouched
    assert out[4].text_dedup == "" and out[4].n_removed == 20


def test_span_removal_short_docs_pass_through(spark):
    """Documents below the n-token threshold have no n-grams and are
    never cut, even when exact duplicates of each other."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        remove_duplicate_spans,
    )

    rows = [(1, "tiny dup text"), (2, "tiny dup text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_spans(df, n=8).collect()
    assert all(r.text_dedup == "tiny dup text" for r in out)
    assert all(r.n_removed == 0 for r in out)


def test_span_removal_within_doc_repeat_keeps_first(spark):
    """A single doc repeating its own 8-gram: the first occurrence is
    the keeper, the later one is cut."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        remove_duplicate_spans,
    )

    eight = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, eight + " filler middle words go here now " + eight)],
        "doc_id long, text string",
    )
    out = remove_duplicate_spans(df, n=8).collect()[0]
    assert out.text_dedup.count(eight) == 1
    assert out.text_dedup.startswith(eight)
    assert out.n_removed == 8


# ---------------------------------------------------------------------------
# paragraph_dedup (C4-style)
# ---------------------------------------------------------------------------

BOILER = "subscribe to our newsletter for more updates"


def test_paragraph_dedup_cross_doc_boilerplate_survives_once(spark):
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        paragraph_dedup,
    )

    rows = [
        (1, "first doc body text\n\n" + BOILER + "\n\nmore unique content"),
        (2, "second doc opening\n\n" + BOILER),
        (3, "Subscribe to our Newsletter, for more updates!!"),
        (4, BOILER),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    corpus = "\n\n".join(out[i].text_dedup for i in sorted(out))
    assert corpus.count(BOILER) == 1
    assert BOILER in out[1].text_dedup  # keeper = min (doc_id, idx)
    assert out[2].text_dedup == "second doc opening"
    # normalized variant (case + punctuation) merges into the digest
    assert out[3].text_dedup == "" and out[3].n_removed == 1
    assert out[4].text_dedup == ""


def test_paragraph_dedup_within_doc_repeat(spark):
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        paragraph_dedup,
    )

    df = spark.createDataFrame(
        [(1, "same para\n\nsame para\n\nother para")],
        "doc_id long, text string",
    )
    out = paragraph_dedup(df).collect()[0]
    assert out.text_dedup == "same para\n\nother para"
    assert (out.n_paras, out.n_removed) == (3, 1)


def test_token_window_paragraphs_tumbling_shape(spark):
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        token_window_paragraphs,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    rows = sorted(
        token_window_paragraphs(df, window=3).collect(),
        key=lambda r: r.para_idx,
    )
    assert [(r.para_idx, r.para) for r in rows] == [
        (1, "a b c"),
        (2, "d e f"),
        (3, "g"),
    ]


# ---------------------------------------------------------------------------
# bpe_encode (tokenizer deployment)
# ---------------------------------------------------------------------------


def _py_bpe_apply(word: str, merges: list) -> list:
    """Pure-Python replay of the engine's left-to-right merge fold."""
    syms = list(word)
    for left, right in merges:
        out: list = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_round_trip_vs_own_training(spark):
    """Encode the training corpus with its OWN trained merges and
    compare every document's token stream against a pure-Python
    replay of (train's merge list, encode's fold)."""
    from icnarc_to_philips_linkage_spark.operators import text as T

    rows = [
        (1, "low lower lowest low low"),
        (2, "newer newest new news low"),
        (3, "widest wider wide low lower"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r.left, r.right) for r in T.bpe_train(df, n_merges=6).collect()
    ]
    assert len(merges) == 6
    got = {r.doc_id: r for r in T.bpe_encode(df, merges).collect()}
    for doc_id, txt in rows:
        words = txt.split()
        toks = [t for w in words for t in _py_bpe_apply(w, merges)]
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_tokens == len(toks)
        assert got[doc_id].tokens_str == " ".join(toks)


def test_bpe_encode_empty_merges_is_char_split(spark):
    from icnarc_to_philips_linkage_spark.operators import text as T

    df = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    out = T.bpe_encode(df, []).collect()[0]
    assert out.tokens_str == "a b c"
    assert (out.n_words, out.n_tokens) == (2, 3)


# ---------------------------------------------------------------------------
# mad_outlier_report fused exact paths
# ---------------------------------------------------------------------------


def test_mad_exact_raw_equals_collapsed_with_ties_and_nulls(spark):
    """The one-shuffle raw-array exact plan and the (g,v,c)-collapsed
    fold plan must agree exactly — including tied values, NULLs
    (counted in n, excluded from medians), and both parities of N."""
    from icnarc_to_philips_linkage_spark.operators.profile import (
        mad_outlier_report,
    )

    rows = (
        [("a", float(v)) for v in [1, 2, 2, 2, 3, 9, 50]]
        + [("a", None)]
        + [("b", float(v)) for v in [10, 10, 20, 40]]
        + [("c", 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    kw = dict(k=2.0, exact=True, rank_check_eps=0.4)
    a = sorted(
        mad_outlier_report(df, "g", "v", exact_collapse=True, **kw).collect()
    )
    b = sorted(
        mad_outlier_report(df, "g", "v", exact_collapse=False, **kw).collect()
    )
    assert a == b
    byg = {r.g: r for r in a}
    assert byg["a"].n == 8  # NULL row counted in n
    assert byg["a"].med == 2.0  # median over the 7 non-null values
    # group a devs sorted: 0,0,0,1,1,7,48 -> mad = 1
    assert byg["a"].mad == 1.0
    assert byg["a"].n_outliers == 2  # 9 and 50 beyond 2*mad
    assert byg["c"].mad == 0.0 and byg["c"].n_outliers == 0


def test_mad_exact_matches_percentile_reference(spark):
    """Even-N interpolation: fused med/mad must equal Spark's own
    percentile() on the same data."""
    from icnarc_to_philips_linkage_spark.operators.profile import (
        mad_outlier_report,
    )
    from pyspark.sql import functions as F

    rows = [("g", float(v)) for v in [3, 1, 4, 1, 5, 9, 2, 6]]
    df = spark.createDataFrame(rows, "g string, v double")
    ref_med = df.agg(F.expr("percentile(v, 0.5)")).collect()[0][0]
    out = mad_outlier_report(
        df, "g", "v", exact=True, exact_collapse=False
    ).collect()[0]
    assert out.med == round(ref_med, 6)


# ---------------------------------------------------------------------------
# moore_lewis_scores
# ---------------------------------------------------------------------------


def test_moore_lewis_matches_python_replay(spark):
    """Hand replay of the smoothed char-trigram cross-entropy
    difference on a tiny corpus."""
    import math
    from collections import Counter

    from icnarc_to_philips_linkage_spark.operators.text import (
        moore_lewis_scores,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "abcabc", True),
        (2, "abcxyz", False),
        (3, "xyzxyz", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom boolean")
    out = {
        r.doc_id: r
        for r in moore_lewis_scores(df, F.col("dom"), n=3).collect()
    }

    def grams(t):
        return [t[i : i + 3] for i in range(len(t) - 2)]

    all_c = Counter(g for _, t, _ in rows for g in grams(t))
    in_c = Counter(g for _, t, d in rows if d for g in grams(t))
    v = len(all_c)
    all_tot, in_tot = sum(all_c.values()), sum(in_c.values())
    for doc_id, t, dom in rows:
        gs = grams(t)
        bits_in = -sum(
            math.log2((in_c[g] + 1) / (in_tot + v)) for g in gs
        ) / len(gs)
        bits_out = -sum(
            math.log2((all_c[g] + 1) / (all_tot + v)) for g in gs
        ) / len(gs)
        r = out[doc_id]
        assert r.in_domain == dom and r.n_grams == len(gs)
        assert abs(r.bits_in - bits_in) < 1e-5
        assert abs(r.bits_out - bits_out) < 1e-5
        assert abs(r.ce_diff - (bits_in - bits_out)) < 1e-5
    # the in-domain doc must look most in-domain-like
    assert out[1].ce_diff < out[2].ce_diff < out[3].ce_diff


def test_moore_lewis_short_doc_null_bits(spark):
    from icnarc_to_philips_linkage_spark.operators.text import (
        moore_lewis_scores,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "ab", True), (2, "abcdef", False)],
        "doc_id long, text string, dom boolean",
    )
    out = {
        r.doc_id: r
        for r in moore_lewis_scores(df, F.col("dom"), n=3).collect()
    }
    assert out[1].n_grams == 0 and out[1].bits_in is None
    assert out[2].n_grams == 4


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_split_by_terciles(spark):
    """Nine docs in one source with three distinct score levels (three
    stereotyped, three mixed, three unusual): head must hold the
    lowest-bits docs and every bucket must count 3."""
    from icnarc_to_philips_linkage_spark.operators.text import (
        ccnet_perplexity_buckets,
    )

    common = "aaaaaaaaaaaaaaaa"
    mixed = "aaaabbbbaaaabbbb"
    rare = "qwxzjvkpqwxzjvkp"
    rows = [(i, "s0", t) for i, t in enumerate(
        [common] * 3 + [mixed] * 3 + [rare] * 3
    )]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.bucket: r for r in ccnet_perplexity_buckets(df).collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert all(out[b].n_docs == 3 for b in out)
    assert out["head"].mean_bits < out["middle"].mean_bits
    assert out["middle"].mean_bits < out["tail"].mean_bits


# ---------------------------------------------------------------------------
# winnowing (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_long_span_surfaces(spark):
    """Any shared run of >= w+k-1 tokens must share a fingerprint
    (the paper's guarantee), and unique docs share nothing."""
    from icnarc_to_philips_linkage_spark.operators.text import (
        winnow_overlap_report,
    )

    span = "one two three four five six seven eight nine ten"  # 10 >= 8
    rows = [
        (1, "alpha beta gamma " + span + " delta"),
        (2, "unrelated prefix here " + span + " suffix"),
        (3, "completely different text with no shared content anywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in winnow_overlap_report(df, k=5, w=4).collect()}
    assert out[1].n_shared >= 1 and out[2].n_shared >= 1
    assert out[3].n_shared == 0


def test_winnow_density_bound(spark):
    """Winnowing keeps roughly 2/(w+1) of positions — assert the
    selected set is much smaller than the gram count on a long doc."""
    from icnarc_to_philips_linkage_spark.operators.text import (
        winnow_fingerprints,
    )

    words = " ".join(f"w{i * 7919 % 1000}x{i}" for i in range(400))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    r = winnow_fingerprints(df, k=5, w=4).collect()[0]
    assert r.n_grams == 396
    # expectation 2/(w+1) = 0.4; allow generous slack both ways
    assert 0.2 * r.n_grams < len(r.fingerprints) < 0.6 * r.n_grams


def test_winnow_replay_pure_python(spark):
    """Exact replay: rightmost-min per window over md5 hex hashes."""
    import hashlib

    from icnarc_to_philips_linkage_spark.operators.text import (
        winnow_fingerprints,
    )

    text = "a b c a b c d e f a b"
    k, w = 3, 2
    toks = text.split()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    sel = set()
    for i in range(len(hs) - w + 1):
        win = list(enumerate(hs))[i : i + w]
        best = min(win, key=lambda t: (t[1], -t[0]))
        sel.add((best[1], best[0] + 1))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = winnow_fingerprints(df, k=k, w=w).collect()[0]
    got = {(x.h, x.p) for x in r.fingerprints}
    assert got == sel


# ---------------------------------------------------------------------------
# sq8 scalar quantization
# ---------------------------------------------------------------------------


def test_sq8_dequantize_bounds_and_identity(spark):
    from icnarc_to_philips_linkage_spark.operators.similarity import (
        sq8_dequantized,
        sq8_train,
    )

    rows = [(i, [float(i), 0.5, -1.0 + i]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, maxs = sq8_train(df)
    assert mins == [0.0, 0.5, -1.0] and maxs == [3.0, 0.5, 2.0]
    out = {r.vec_id: r.embedding for r in sq8_dequantized(df, mins, maxs).collect()}
    for i in range(4):
        # endpoints reconstruct exactly; constant dim -> mn
        assert abs(out[i][0] - float(i)) < 3.0 / 255 + 1e-9
        assert out[i][1] == 0.5
    assert out[0][0] == 0.0 and out[3][0] == 3.0  # exact at the ends


def test_sq8_recall_near_perfect_on_spread_vectors(spark):
    from icnarc_to_philips_linkage_spark.operators.similarity import (
        sq8_recall,
    )

    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 5")
    out = sq8_recall(df, q, k=3).collect()[0]
    assert out.n_queries == 5
    assert out.mean_recall >= 0.8  # 8-bit noise rarely flips top-3
    assert 0 < out.mse < 1e-3


# ---------------------------------------------------------------------------
# containment_prefix_join
# ---------------------------------------------------------------------------


def test_containment_quote_in_page_directed(spark):
    """A short quote fully inside a long page: containment(quote→page)
    = 1.0 even though Jaccard is far below threshold; the reverse
    direction does not qualify."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        containment_prefix_join,
    )

    quote = "to be or not to be that is the question"
    page = (
        "many other words surround the famous line here "
        + quote
        + " and the page continues with plenty more unrelated content"
        " covering several additional topics entirely"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, page), (3, "completely unrelated text words")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r.containment
        for r in containment_prefix_join(df, threshold=0.8).collect()
    }
    assert out[(1, 2)] == 1.0
    assert (2, 1) not in out  # page not contained in quote
    assert all(3 not in k for k in out)


def test_containment_completeness_vs_brute_force(spark):
    """Prefix-filtered result must equal brute-force all-pairs on a
    corpus engineered to stress prefix boundaries (heavy overlap)."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        containment_prefix_join,
    )

    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(14):
        toks = [vocab[(d * 3 + j) % 12] for j in range(4 + d % 5)]
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.6
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_prefix_join(df, threshold=t).collect()
    }
    sets = {d: set(txt.split()) for d, txt in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            # exact rational qualify: 5*common >= 3*|A|
            if len(sets[a] & sets[b]) * 5 >= 3 * len(sets[a]):
                want[(a, b)] = round(c, 6)
    assert got == want


def test_mwu_partition_invariant(spark):
    from icnarc_to_philips_linkage_spark.operators import profile

    rows = [("a", i * 3 % 17) for i in range(40)] + [
        ("b", i * 5 % 23) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    r1 = profile.mann_whitney_u(df.repartition(1), "g", "v", "a", "b")
    r7 = profile.mann_whitney_u(df.repartition(7), "g", "v", "a", "b")
    assert r1.collect() == r7.collect()
