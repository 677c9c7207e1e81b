"""Round-10 batch: ADVICE-r9 degenerate-input fixes, then the new
operators (Bradley-Terry, Theil-Sen, A-ES reservoir, McNemar/DeLong).
"""

from __future__ import annotations

import pytest


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
