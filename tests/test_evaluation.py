"""Unit tests for operators/evaluation.py — hand-computed expectations
on tiny frames (the registry queries get the full DuckDB differential
in test_oracle.py; these pin the arithmetic itself)."""

from __future__ import annotations

import pytest

from icnarc_to_philips_linkage_spark.operators import evaluation


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


class TestRocAuc:
    def test_perfect_separation(self, spark):
        df = _df(
            spark,
            [(0.9, True), (0.8, True), (0.2, False), (0.1, False)],
        )
        row = evaluation.roc_auc(df, "score", "label").collect()[0]
        assert (row.n_pos, row.n_neg, row.auc) == (2, 2, 1.0)

    def test_ties_average_rank(self, spark):
        # scores: 0.5(T), 0.5(F), 0.3(F): ranks asc 0.3->1, tied 0.5
        # block avg rank 2.5; U = 2.5 - 1 = 1.5; AUC = 1.5/2 = 0.75
        df = _df(spark, [(0.5, True), (0.5, False), (0.3, False)])
        row = evaluation.roc_auc(df, "score", "label").collect()[0]
        assert (row.n_pos, row.n_neg) == (1, 2)
        assert row.auc == pytest.approx(0.75)

    def test_hand_computed_mixed(self, spark):
        # pos scores {0.8, 0.4}, neg {0.6, 0.2}: pairs won 3 of 4
        df = _df(
            spark,
            [(0.8, True), (0.4, True), (0.6, False), (0.2, False)],
        )
        assert evaluation.roc_auc(df, "score", "label").collect()[0].auc \
            == pytest.approx(0.75)

    def test_degenerate_single_class_null_auc(self, spark):
        df = _df(spark, [(0.8, True), (0.4, True)])
        row = evaluation.roc_auc(df, "score", "label").collect()[0]
        assert (row.n_pos, row.n_neg) == (2, 0)
        assert row.auc is None

    def test_null_rows_excluded(self, spark):
        df = _df(
            spark,
            [(0.9, True), (0.1, False), (None, True), (0.5, None)],
        )
        row = evaluation.roc_auc(df, "score", "label").collect()[0]
        assert (row.n_pos, row.n_neg, row.auc) == (1, 1, 1.0)

    def test_partition_invariance(self, spark):
        rows = [
            (round(0.1 + 0.07 * (i % 9), 3), i % 3 == 0)
            for i in range(200)
        ]
        a = evaluation.roc_auc(
            _df(spark, rows).repartition(1), "score", "label"
        ).collect()[0]
        b = evaluation.roc_auc(
            _df(spark, rows).repartition(13), "score", "label"
        ).collect()[0]
        assert a == b


class TestPrThresholds:
    def test_confusion_counts(self, spark):
        df = _df(
            spark,
            [(0.9, True), (0.7, False), (0.4, True), (0.1, False)],
        )
        out = {
            r.threshold: r
            for r in evaluation.pr_at_thresholds(
                df, "score", "label", [0.5]
            ).collect()
        }
        r = out[0.5]
        assert (r.tp, r.fp, r.fn, r.tn) == (1, 1, 1, 1)
        assert r.precision == pytest.approx(0.5)
        assert r.recall == pytest.approx(0.5)
        assert r.f1 == pytest.approx(0.5)
        assert r.accuracy == pytest.approx(0.5)

    def test_zero_predicted_positive_null_precision(self, spark):
        df = _df(spark, [(0.2, True), (0.1, False)])
        r = evaluation.pr_at_thresholds(
            df, "score", "label", [0.9]
        ).collect()[0]
        assert (r.tp, r.fp) == (0, 0)
        assert r.precision is None and r.f1 is None
        assert r.recall == 0.0

    def test_empty_grid_raises(self, spark):
        with pytest.raises(ValueError):
            evaluation.pr_at_thresholds(
                _df(spark, [(0.5, True)]), "score", "label", []
            )

    def test_grid_cardinality(self, spark):
        df = _df(spark, [(0.5, True), (0.4, False)] * 10)
        out = evaluation.pr_at_thresholds(
            df, "score", "label", [0.1, 0.5, 0.9]
        )
        assert out.count() == 3


class TestCalibrationBins:
    def test_bins_and_ece(self, spark):
        # bin 0: p=0.05 x2 (1 pos) -> mean_p 0.05, pos_rate 0.5,
        #   ece 0.45 * 2/4; bin 9: p=0.95 x2 (2 pos) -> gap 0.05 * 2/4
        df = _df(
            spark,
            [(0.05, True), (0.05, False), (0.95, True), (0.95, True)],
        )
        out = {
            r.bin: r
            for r in evaluation.calibration_bins(
                df, "score", "label", bins=10
            ).collect()
        }
        assert set(out) == {0, 9}
        assert out[0].mean_p == pytest.approx(0.05)
        assert out[0].pos_rate == pytest.approx(0.5)
        assert out[0].ece_contrib == pytest.approx(0.225)
        assert out[9].ece_contrib == pytest.approx(0.025)

    def test_prob_one_clamps_into_top_bin(self, spark):
        df = _df(spark, [(1.0, True), (0.0, False)])
        bins = {
            r.bin
            for r in evaluation.calibration_bins(
                df, "score", "label", bins=10
            ).collect()
        }
        assert bins == {0, 9}

    def test_bad_bins_raises(self, spark):
        with pytest.raises(ValueError):
            evaluation.calibration_bins(
                _df(spark, [(0.5, True)]), "score", "label", bins=0
            )


@pytest.mark.slow  # 5 greedy rounds x 2 lam settings (~30 s); the
# full differential runs in test_oracle.py's slow lane anyway
class TestMmrRerank:
    def _emb(self, spark):
        # query 100 -> [1,0,0,0]; docs: 0 & 1 near-identical high-rel,
        # 2 orthogonal-ish but relevant. Greedy MMR must NOT pick both
        # twins before doc 2.
        rows = [
            (0, [0.99, 0.10, 0.0, 0.0]),
            (1, [0.99, 0.11, 0.0, 0.0]),
            (2, [0.70, 0.0, 0.70, 0.0]),
            (100, [1.0, 0.0, 0.0, 0.0]),
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_diversifies_vs_pure_relevance(self, spark):
        from icnarc_to_philips_linkage_spark.operators.retrieval import (
            mmr_rerank,
        )

        emb = self._emb(spark)
        q = emb.filter("vec_id = 100")
        corpus = emb.filter("vec_id < 100")
        out = mmr_rerank(corpus, q, k=3, pool=3, lam=0.5).collect()
        order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
        # rank1 = most relevant twin (0 by id tie/sim), rank2 must jump
        # to the diverse doc 2, twin 1 drops to rank3
        assert order[0] == 0
        assert order[1] == 2
        assert order[2] == 1
        # pure relevance (lam=1.0) keeps the twins together
        rel = mmr_rerank(corpus, q, k=3, pool=3, lam=1.0).collect()
        rel_order = [
            r.neighbor_id for r in sorted(rel, key=lambda r: r.rank)
        ]
        assert rel_order[:2] == [1, 0] or rel_order[:2] == [0, 1]

    def test_rank_count_and_bad_lam(self, spark):
        import pytest as _pytest

        from icnarc_to_philips_linkage_spark.operators.retrieval import (
            mmr_rerank,
        )

        emb = self._emb(spark)
        q = emb.filter("vec_id = 100")
        corpus = emb.filter("vec_id < 100")
        out = mmr_rerank(corpus, q, k=5, pool=3, lam=0.7)
        # pool smaller than k: emits only pool rows... (k rounds, but
        # later rounds find no remaining candidates)
        assert out.count() == 3
        with _pytest.raises(ValueError):
            mmr_rerank(corpus, q, lam=1.5)


class TestRocAucBy:
    def test_groups_match_global_per_slice(self, spark):
        rows = [
            ("en", 0.9, True), ("en", 0.8, False), ("en", 0.7, True),
            ("de", 0.6, True), ("de", 0.5, True), ("de", 0.4, False),
        ]
        df = spark.createDataFrame(
            rows, "lang string, score double, label boolean"
        )
        by = {
            r.lang: r
            for r in evaluation.roc_auc_by(
                df, "score", "label", ["lang"]
            ).collect()
        }
        for lang in ("en", "de"):
            solo = evaluation.roc_auc(
                df.filter(df.lang == lang), "score", "label"
            ).collect()[0]
            assert (by[lang].n_pos, by[lang].n_neg, by[lang].auc) == (
                solo.n_pos, solo.n_neg, solo.auc,
            )

    def test_single_class_group_null(self, spark):
        df = spark.createDataFrame(
            [("x", 0.9, True), ("x", 0.1, True), ("y", 0.5, True),
             ("y", 0.4, False)],
            "g string, score double, label boolean",
        )
        by = {
            r.g: r
            for r in evaluation.roc_auc_by(
                df, "score", "label", ["g"]
            ).collect()
        }
        assert by["x"].auc is None
        assert by["y"].auc == 1.0


class TestSelectTokenBudget:
    def _docs(self, spark):
        rows = [
            (1, 0.9, 100), (2, 0.8, 200), (3, 0.7, 150),
            (4, 0.6, 300), (5, 0.5, 50),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, p_quality double, n_tokens long"
        )

    def test_greedy_whole_doc_boundary(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            select_token_budget,
        )

        # budget 400: takes 100 + 200 = 300; doc 3 (150) would reach
        # 450 > 400 -> dropped along with everything after
        out = select_token_budget(self._docs(spark), 400).collect()
        got = {r.doc_id: r.cum_tokens for r in out}
        assert got == {1: 100, 2: 300}

    def test_partition_invariance(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            select_token_budget,
        )

        docs = self._docs(spark)
        a = sorted(
            (r.doc_id, r.cum_tokens)
            for r in select_token_budget(docs, 500, partitions=1).collect()
        )
        b = sorted(
            (r.doc_id, r.cum_tokens)
            for r in select_token_budget(
                docs.repartition(7), 500, partitions=7
            ).collect()
        )
        assert a == b == [(1, 100), (2, 300), (3, 450)]

    def test_excludes_null_quality_and_zero_tokens(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            select_token_budget,
        )

        docs = spark.createDataFrame(
            [(1, None, 100), (2, 0.9, 0), (3, 0.8, None), (4, 0.7, 60)],
            "doc_id long, p_quality double, n_tokens long",
        )
        out = select_token_budget(docs, 1000).collect()
        assert [(r.doc_id, r.cum_tokens) for r in out] == [(4, 60)]

    def test_tie_breaks_on_id(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            select_token_budget,
        )

        docs = spark.createDataFrame(
            [(9, 0.5, 40), (2, 0.5, 40), (5, 0.5, 40)],
            "doc_id long, p_quality double, n_tokens long",
        )
        out = select_token_budget(docs, 80).collect()
        assert sorted(r.doc_id for r in out) == [2, 5]

    def test_bad_budget_raises(self, spark):
        import pytest as _pytest

        from icnarc_to_philips_linkage_spark.operators.sampling import (
            select_token_budget,
        )

        with _pytest.raises(ValueError):
            select_token_budget(self._docs(spark), 0)


class TestKsSeparation:
    def test_hand_computed(self, spark):
        # pos at {0.8, 0.6}, neg at {0.4, 0.2}: full separation, KS=1
        # at the largest neg score
        df = _df(
            spark,
            [(0.8, True), (0.6, True), (0.4, False), (0.2, False)],
        )
        r = evaluation.ks_separation(df, "score", "label").collect()[0]
        assert (r.n_pos, r.n_neg) == (2, 2)
        assert r.ks == 1.0
        assert r.ks_score == 0.4

    def test_interleaved_partial_gap(self, spark):
        # scores asc: 0.1(N) 0.2(P) 0.3(N) 0.4(P):
        # cum fractions after each: pos 0,.5,.5,1 / neg .5,.5,1,1
        # gaps: .5, 0, .5, 0 -> KS .5 at smallest peak score 0.1
        df = _df(
            spark,
            [(0.1, False), (0.2, True), (0.3, False), (0.4, True)],
        )
        r = evaluation.ks_separation(df, "score", "label").collect()[0]
        assert r.ks == pytest.approx(0.5)
        assert r.ks_score == 0.1

    def test_degenerate_single_class(self, spark):
        df = _df(spark, [(0.5, True), (0.3, True)])
        r = evaluation.ks_separation(df, "score", "label").collect()[0]
        assert r.ks is None and r.ks_score is None

    def test_partition_invariance(self, spark):
        rows = [
            (round(0.05 * (i % 19), 3), (i * 7) % 3 == 0)
            for i in range(150)
        ]
        a = evaluation.ks_separation(
            _df(spark, rows).repartition(1), "score", "label"
        ).collect()[0]
        b = evaluation.ks_separation(
            _df(spark, rows).repartition(13), "score", "label"
        ).collect()[0]
        assert a == b
