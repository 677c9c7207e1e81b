"""Round-11 scale smokes (VERDICT r10 task #7 + the round-11 pairing
discipline: every new operator ships a 100M-row smoke with a
closed-form planted assertion).

- bhfdr: 100M rows -> exactly 1000 per-key tests whose p-values are
  EXACT functions of planted per-key success counts (each key owns
  exactly 100k rows; successes are a deterministic id-range slice, so
  p_k = s_k / 100000 is bit-identical between the engine and the
  pure-Python replay). The BH step-up rejected set, ranks, and
  q-values are then asserted against the closed-form Python BH on the
  same 1000 exact doubles. Corpus-scale cost: the one 100M -> 1000-key
  aggregation; the rank/step-up windows run on the 1000-row frame.
- dunn: 100M rows, 4 groups x 25M. Groups a/b/c carry the IDENTICAL
  value multiset (25k copies of each of 1000 values); group d is
  shifted strictly above. Closed form: mean_rank(a)=mean_rank(b)=
  mean_rank(c)=(N-n_d+1)/2 EXACTLY, mean_rank(d)=N-(n_d-1)/2 EXACTLY,
  z(a,b)=0 exactly, z(x,d) < 0 with p ~ 0.
- pairedboot: 100M scored rows, scorer 1 separates perfectly and
  scorer 2 is a single constant. EVERY Poisson replicate then has
  auc1 = 1.0 and auc2 = 0.5 exactly (perfect separation survives any
  nonnegative reweighting; an all-tied score is 0.5 under the
  tie-aware rank-sum for any weights), so delta_auc = ci_lo = ci_hi =
  delta_med = 0.5 EXACT.

Run: python scale_smoke_r11.py   (SMOKE_ONLY=bhfdr,dunn,pairedboot
selects a subset).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def _python_bh(ps: list[tuple[str, float]], alpha: float):
    """Closed-form BH replay: same step-up + monotone q as bh_fdr."""
    srt = sorted(ps, key=lambda kv: (kv[1], kv[0]))
    m = len(srt)
    imax = 0
    for i, (_, p) in enumerate(srt, 1):
        if p <= alpha * i / m:
            imax = i
    qs = [None] * m
    run = 1.0
    for i in range(m, 0, -1):
        run = min(run, min(srt[i - 1][1] * m / i, 1.0))
        qs[i - 1] = run
    return srt, imax, qs


def main() -> int:
    only = set(
        s for s in os.environ.get("SMOKE_ONLY", "").split(",") if s
    )

    def want(tag: str) -> bool:
        return not only or tag in only

    from icnarc_to_philips_linkage_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke-r11",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    n100 = 100_000_000

    from icnarc_to_philips_linkage_spark.operators import (
        evaluation as ev,
        profile as pr,
    )

    if want("bhfdr"):
        # key k owns ids ≡ k (mod 1000); the quotient id//1000 spans
        # 0..99999 exactly once per key, so "success iff quotient <
        # s_k" plants s_k EXACTLY: s_k = k+1 for k < 100 (tiny p),
        # 50000 + k otherwise (p ≈ 0.5)
        key = F.pmod(F.col("id"), F.lit(1000))
        quot = (F.col("id") - key) / 1000
        s_k = F.when(key < 100, key + 1).otherwise(key + 50000)
        rows = spark.range(n100).select(
            key.cast("int").alias("k"),
            (quot < s_k).cast("long").alias("success"),
        )
        t = time.time()
        tests = rows.groupBy("k").agg(
            (F.sum("success").cast("double") / F.lit(100000.0)).alias(
                "p"
            )
        )
        out = {
            r.k: r
            for r in ev.bh_fdr(
                tests, "k", "p", alpha=0.05
            ).collect()
        }
        timings["bh_fdr_100m_rows"] = round(time.time() - t, 2)
        expected = [
            (k, ((k + 1) if k < 100 else (k + 50000)) / 100000.0)
            for k in range(1000)
        ]
        srt, imax, qs = _python_bh(
            [(str(k), p) for k, p in expected], 0.05
        )
        n_rejected = sum(1 for r in out.values() if r.rejected)
        print(
            "bh_fdr_100m_rows", timings["bh_fdr_100m_rows"],
            "m", len(out), "rejected", n_rejected,
            "expected_rejected", imax, flush=True,
        )
        assert len(out) == 1000 and n_rejected == imax, (
            n_rejected, imax,
        )
        for i, (kk, p) in enumerate(srt, 1):
            r = out[int(kk)]
            assert r.rank == i and r.m_tests == 1000, r
            assert abs(r.q_value - round(qs[i - 1], 9)) < 1e-9, (r, qs[i - 1])
            assert r.rejected == (i <= imax), r

    if want("dunn"):
        g = F.pmod(F.col("id"), F.lit(4))
        v = F.pmod((F.col("id") - g) / 4, F.lit(1000)).cast("long")
        rows = spark.range(n100).select(
            F.concat(F.lit("g"), g.cast("string")).alias("g"),
            F.when(g == 3, v + 1000).otherwise(v).alias("v"),
        )
        t = time.time()
        out = {
            (r.group_a, r.group_b): r
            for r in pr.dunn_posthoc(rows, "g", "v").collect()
        }
        timings["dunn_100m_rows"] = round(time.time() - t, 2)
        n, nd = n100, n100 // 4
        low_mean = (n - nd + 1) / 2.0  # groups g0..g2 share a multiset
        high_mean = n - (nd - 1) / 2.0  # g3 occupies the top nd ranks
        print(
            "dunn_100m_rows", timings["dunn_100m_rows"],
            "pairs", len(out),
            "mr(g0)", out[("g0", "g1")].mean_rank_a,
            "mr(g3)", out[("g0", "g3")].mean_rank_b,
            "z(g0,g1)", out[("g0", "g1")].z, flush=True,
        )
        assert len(out) == 6
        assert out[("g0", "g1")].mean_rank_a == low_mean
        assert out[("g0", "g1")].mean_rank_b == low_mean
        assert out[("g0", "g3")].mean_rank_b == high_mean
        assert out[("g0", "g1")].z == 0.0
        assert out[("g1", "g2")].z == 0.0
        for a in ("g0", "g1", "g2"):
            r = out[(a, "g3")]
            assert r.z < -1000 and r.p_value < 1e-6, r

    if want("pairedboot"):
        h = F.pmod(F.xxhash64("id", F.lit(31)), F.lit(1000))
        scored = spark.range(n100).select(
            F.col("id").alias("k"),
            h.cast("double").alias("s1"),
            F.lit(0.5).alias("s2"),
            (h >= 500).cast("int").alias("y"),
        )
        t = time.time()
        r = ev.paired_bootstrap_delta_auc(
            scored, "s1", "s2", "y", "k"
        ).collect()[0]
        timings["paired_boot_delta_100m"] = round(time.time() - t, 2)
        print(
            "paired_boot_delta_100m", timings["paired_boot_delta_100m"],
            "delta", r.delta_auc, "ci", (r.ci_lo, r.ci_hi), flush=True,
        )
        assert r.auc_1 == 1.0 and r.auc_2 == 0.5
        assert r.delta_auc == 0.5
        assert r.ci_lo == 0.5 and r.ci_hi == 0.5 and r.delta_med == 0.5

    # ---- round-11 batch-2 operators, same closed-form discipline
    from icnarc_to_philips_linkage_spark.operators import (
        drift as dr,
        text as tx,
    )

    if want("friedman"):
        # 20M blocks × 5 treatments; value = treatment ordinal ⇒
        # every block ranks (1..5) ⇒ R_j = n·j and χ² = 4n EXACTLY
        rows = spark.range(n100).select(
            (F.col("id") / 5).cast("long").alias("b"),
            F.concat(
                F.lit("t"), F.pmod(F.col("id"), F.lit(5)).cast("string")
            ).alias("t"),
            F.pmod(F.col("id"), F.lit(5)).cast("double").alias("v"),
        )
        t = time.time()
        r = pr.friedman_test(rows, "b", "t", "v").collect()[0]
        timings["friedman_100m_cells"] = round(time.time() - t, 2)
        nb = n100 // 5
        print(
            "friedman_100m_cells", timings["friedman_100m_cells"],
            "chi2", r.chi2_f, "expected", 4.0 * nb, flush=True,
        )
        assert r.k == 5 and r.n_blocks == nb
        assert r.chi2_f == 4.0 * nb, r

    if want("cochranq"):
        # same blocks; success iff treatment ordinal < 2 ⇒ Q = 4n
        rows = spark.range(n100).select(
            (F.col("id") / 5).cast("long").alias("b"),
            F.concat(
                F.lit("t"), F.pmod(F.col("id"), F.lit(5)).cast("string")
            ).alias("t"),
            (F.pmod(F.col("id"), F.lit(5)) < 2).alias("x"),
        )
        t = time.time()
        r = pr.cochran_q(rows, "b", "t", "x").collect()[0]
        timings["cochran_q_100m_cells"] = round(time.time() - t, 2)
        nb = n100 // 5
        print(
            "cochran_q_100m_cells", timings["cochran_q_100m_cells"],
            "q", r.q_stat, "expected", 4.0 * nb, flush=True,
        )
        assert r.n_blocks == nb and r.n_success == 2 * nb
        assert r.q_stat == 4.0 * nb, r

    if want("jonck"):
        # values strictly separated by group ⇒ JT = all cross pairs
        g = F.pmod(F.col("id"), F.lit(4))
        rows = spark.range(n100).select(
            F.concat(F.lit("g"), g.cast("string")).alias("g"),
            (
                g * 1000
                + F.pmod((F.col("id") - g) / 4, F.lit(1000))
            ).cast("long").alias("v"),
        )
        t = time.time()
        r = pr.jonckheere_trend(
            rows, "g", "v", ["g0", "g1", "g2", "g3"]
        ).collect()[0]
        timings["jonckheere_100m_rows"] = round(time.time() - t, 2)
        nd = n100 // 4
        p_pairs = 6 * nd * nd  # C(4,2) ordered group pairs
        print(
            "jonckheere_100m_rows", timings["jonckheere_100m_rows"],
            "jt", r.jt_stat, "expected", float(p_pairs), "z", r.z,
            flush=True,
        )
        assert r.jt_stat == float(p_pairs) and r.z > 1000

    if want("mood"):
        # identical multiset per group ⇒ χ² = 0 EXACTLY
        g = F.pmod(F.col("id"), F.lit(4))
        rows = spark.range(n100).select(
            F.concat(F.lit("g"), g.cast("string")).alias("g"),
            F.pmod((F.col("id") - g) / 4, F.lit(1000))
            .cast("long")
            .alias("v"),
        )
        t = time.time()
        r = pr.mood_median_test(rows, "g", "v").collect()[0]
        timings["mood_median_100m_rows"] = round(time.time() - t, 2)
        print(
            "mood_median_100m_rows", timings["mood_median_100m_rows"],
            "median", r.grand_median, "chi2", r.chi2, flush=True,
        )
        assert r.n == n100 and r.grand_median == 499 and r.chi2 == 0.0

    if want("cmh"):
        # id = q·20 + arm·10 + s is a bijection: 10 strata × 2 arms ×
        # 5M rows, outcome = (q % 100) < 30 (exposed) / 20 (control)
        # ⇒ per stratum a=1.5M b=3.5M c=1M d=4M; OR_MH = 12/7 EXACT
        s = F.pmod(F.col("id"), F.lit(10))
        arm = F.pmod((F.col("id") - s) / 10, F.lit(2))
        q_ = (F.col("id") - s - arm * 10) / 20
        rows = spark.range(n100).select(
            F.concat(F.lit("s"), s.cast("string")).alias("s"),
            (arm == 0).alias("e"),
            (
                F.pmod(q_, F.lit(100))
                < F.when(arm == 0, 30).otherwise(20)
            ).alias("o"),
        )
        t = time.time()
        r = ev.cmh_test(rows, "s", "e", "o").collect()[0]
        timings["cmh_100m_rows"] = round(time.time() - t, 2)
        print(
            "cmh_100m_rows", timings["cmh_100m_rows"],
            "or", r.mh_or, "chi2", r.cmh_chi2, flush=True,
        )
        assert r.n_strata == 10 and r.n == n100
        assert r.mh_or == round(12.0 / 7.0, 6) and r.cmh_chi2 > 100000

    if want("hl"):
        # perfectly calibrated planted rates ⇒ O1 = E1 per bin ⇒
        # HL χ² = 0 EXACTLY (and Murphy REL = 0 on the same frame)
        b = F.pmod(F.col("id"), F.lit(10))
        qq = (F.col("id") - b) / 10
        rows = spark.range(n100).select(
            (b.cast("double") * 0.1 + 0.05).alias("p"),
            (F.pmod(qq, F.lit(1000)) < (b * 100 + 50)).cast("int")
            .alias("y"),
        )
        t = time.time()
        r = ev.hosmer_lemeshow(rows, "p", "y", bins=10).collect()[0]
        t_hl = round(time.time() - t, 2)
        timings["hosmer_lemeshow_100m_rows"] = t_hl
        t = time.time()
        d2 = ev.brier_decomposition(rows, "p", "y", bins=10).collect()[0]
        timings["brier_decomp_100m_rows"] = round(time.time() - t, 2)
        print(
            "hosmer_lemeshow_100m_rows", t_hl, "chi2", r.hl_chi2,
            "| brier_decomp", timings["brier_decomp_100m_rows"],
            "rel", d2.reliability, "brier", d2.brier, flush=True,
        )
        assert r.n == n100 and r.n_bins_used == 10 and r.hl_chi2 == 0.0
        assert d2.reliability == 0.0
        # bin-constant scores ⇒ Murphy identity exact
        assert abs(
            d2.brier - (d2.reliability - d2.resolution + d2.uncertainty)
        ) < 1e-8

    if want("js"):
        # uniform 0-9 vs uniform 2-11 on a 12-bucket grid ⇒
        # JSD = 0.2·ln 2 (two disjoint buckets each side)
        import math

        rows = spark.range(n100).select(
            (F.pmod(F.col("id"), F.lit(2)) == 0).alias("r"),
            (
                F.pmod((F.col("id") / 2).cast("long"), F.lit(10))
                + F.when(F.pmod(F.col("id"), F.lit(2)) == 0, 0)
                .otherwise(2)
            ).cast("double").alias("v"),
        )
        t = time.time()
        r = dr.js_divergence(
            rows, F.col("r"), "v", 0.0, 12.0, bins=12
        ).collect()[0]
        timings["js_divergence_100m_rows"] = round(time.time() - t, 2)
        print(
            "js_divergence_100m_rows",
            timings["js_divergence_100m_rows"],
            "jsd", r.js_divergence, "expected",
            round(0.2 * math.log(2), 6), flush=True,
        )
        assert r.n_ref == r.n_cur == n100 // 2
        assert abs(r.js_divergence - 0.2 * math.log(2)) < 1e-6

    if want("zipf"):
        # two-point frequency vocabulary with EXACT planted counts:
        # 500k words × 132 + 500k words × 68 = 100M tokens; the OLS
        # replays in Python over the 1M (rank, freq) points with the
        # operator's own 1e-6 quantization
        import math

        v_half, f_hi, f_lo = 500_000, 132, 68
        cut = v_half * f_hi  # 66M positions of high-freq words
        tok = F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda j: F.when(
                F.col("id") * 10 + j < cut,
                F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") * 10 + j, F.lit(v_half))
                    .cast("string"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("x"),
                    F.pmod(
                        F.col("id") * 10 + j - cut, F.lit(v_half)
                    ).cast("string"),
                )
            ),
        )
        docs = spark.range(n100 // 10).select(
            F.concat_ws(" ", tok).alias("text")
        )
        t = time.time()
        r = tx.zipf_slope(docs).collect()[0]
        timings["zipf_slope_100m_tokens"] = round(time.time() - t, 2)
        qz = lambda x: math.floor(x * 1e6 + 0.5)  # noqa: E731
        sx = sy = sxy = sxx = 0
        for rank in range(1, 2 * v_half + 1):
            f = f_hi if rank <= v_half else f_lo
            lx, ly = math.log(rank), math.log(f)
            sx += qz(lx)
            sy += qz(ly)
            sxy += qz(lx * ly)
            sxx += qz(lx * lx)
        v = float(2 * v_half)
        sxd, syd, sxyd, sxxd = (x / 1e6 for x in (sx, sy, sxy, sxx))
        cov = sxyd - sxd * syd / v
        varx = sxxd - sxd * sxd / v
        print(
            "zipf_slope_100m_tokens", timings["zipf_slope_100m_tokens"],
            "slope", r.slope, "expected~", round(cov / varx, 4),
            flush=True,
        )
        assert r.vocab_size == 2 * v_half and r.n_tokens == n100
        assert abs(r.slope - cov / varx) < 2e-4, (r.slope, cov / varx)

    # ---- round-11 batch-3 operators
    from icnarc_to_philips_linkage_spark.operators import (
        retrieval as rt,
        timeseries as tso,
    )

    if want("page"):
        # perfect ascending trend in every block ⇒ L = n·Σc² = 55n
        rows = spark.range(n100).select(
            (F.col("id") / 5).cast("long").alias("b"),
            F.concat(
                F.lit("t"), F.pmod(F.col("id"), F.lit(5)).cast("string")
            ).alias("t"),
            F.pmod(F.col("id"), F.lit(5)).cast("double").alias("v"),
        )
        t = time.time()
        r = pr.page_l_trend(
            rows, "b", "t", "v", [f"t{i}" for i in range(5)]
        ).collect()[0]
        timings["page_trend_100m_cells"] = round(time.time() - t, 2)
        nb = n100 // 5
        print(
            "page_trend_100m_cells", timings["page_trend_100m_cells"],
            "L", r.l_stat, "expected", 55.0 * nb, "z", r.z, flush=True,
        )
        assert r.n_blocks == nb and r.l_stat == 55.0 * nb
        assert r.z > 1000 and r.p_value_one_sided < 1e-6

    if want("cvm"):
        # identical per-group multisets ⇒ every ECDF gap 0 ⇒ T = 0
        rows = spark.range(n100).select(
            (F.pmod(F.col("id"), F.lit(2)) == 0).alias("is_a"),
            F.pmod((F.col("id") / 2).cast("long"), F.lit(10000)).alias(
                "v"
            ),
        ).select(
            F.when(F.col("is_a"), "a").otherwise("b").alias("g"), "v"
        )
        t = time.time()
        r = pr.cvm_two_sample_exact(rows, "g", "v", "a", "b").collect()[
            0
        ]
        timings["cvm_100m_rows"] = round(time.time() - t, 2)
        print(
            "cvm_100m_rows", timings["cvm_100m_rows"],
            "t_stat", r.t_stat, flush=True,
        )
        assert r.n_a == r.n_b == n100 // 2 and r.t_stat == 0.0

    if want("gwet"):
        # raters always agree over 5 categories ⇒ Pa = 1, AC1 = 1
        c = F.concat(
            F.lit("c"), F.pmod(F.col("id"), F.lit(5)).cast("string")
        )
        rows = spark.range(n100).select(
            c.alias("r1"), c.alias("r2")
        )
        t = time.time()
        r = ev.gwet_ac1(rows, "r1", "r2").collect()[0]
        timings["gwet_ac1_100m_rows"] = round(time.time() - t, 2)
        print(
            "gwet_ac1_100m_rows", timings["gwet_ac1_100m_rows"],
            "ac1", r.ac1, flush=True,
        )
        assert r.n == n100 and r.n_categories == 5
        assert r.p_agree == 1.0 and r.ac1 == 1.0

    if want("ql"):
        # 10M docs × 10 tokens; doc 0 carries 5 'hot' tokens, every
        # 1000th other doc carries 1 ⇒ cf/total/dl all exact: the
        # top-1 score replays in closed form under the 6dp rounds
        import math

        n_docs, tpd = 10_000_000, 10
        is_planted = (
            F.pmod(F.col("id"), F.lit(1000)) == 0
        ) & (F.col("id") > 0)
        tok = F.transform(
            F.sequence(F.lit(0), F.lit(tpd - 1)),
            lambda j: F.when(
                (F.col("id") == 0) & (j < 5), F.lit("hot")
            )
            .when(is_planted & (j == 0), F.lit("hot"))
            .otherwise(
                F.concat_ws(
                    "_",
                    F.lit("f"),
                    F.col("id").cast("string"),
                    j.cast("string"),
                )
            ),
        )
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", tok).alias("text"),
        )
        t = time.time()
        top = rt.ql_search(docs, ["hot"], mu=2000.0, top_k=3).collect()
        timings["ql_dirichlet_100m_tokens"] = round(time.time() - t, 2)
        cf = 5 + (n_docs // 1000 - 1)
        total = n_docs * tpd
        w = math.log((5 + 2000.0 * (cf / total)) / (tpd + 2000.0))
        want_score = (
            math.floor(w * 1e6 + 0.5) / 1e6
            if w >= 0
            else -math.floor(-w * 1e6 + 0.5) / 1e6
        )
        print(
            "ql_dirichlet_100m_tokens",
            timings["ql_dirichlet_100m_tokens"],
            "top1", top[0].doc_id, "score", top[0].score,
            "expected", round(want_score, 6), flush=True,
        )
        assert top[0].doc_id == 0 and top[0].n_hits == 1
        assert abs(top[0].score - want_score) < 2e-6

    if want("seasonalmk"):
        # day d of 364 gets exactly 13000 + d rows per key ⇒ within
        # every weekday the 52 weekly counts strictly ascend ⇒
        # S = 7·C(52,2) per key, no within-season ties
        import math

        grid = spark.range(20 * 364).select(
            F.concat(
                F.lit("k"),
                (F.col("id") / 364).cast("long").cast("string"),
            ).alias("k"),
            F.pmod(F.col("id"), F.lit(364)).cast("int").alias("day"),
        )
        events = grid.select(
            "k",
            "day",
            F.explode(
                F.sequence(F.lit(1), F.lit(13000) + F.col("day"))
            ).alias("__i"),
        )
        t = time.time()
        daily = events.groupBy("k", "day").agg(
            F.count(F.lit(1)).alias("n")
        )
        daily = daily.withColumn(
            "wd", F.pmod(F.col("day"), F.lit(7))
        )
        out = tso.seasonal_mann_kendall(
            daily, "k", "wd", "day", "n"
        ).collect()
        timings["seasonal_mk_96m_events"] = round(time.time() - t, 2)
        s_want = 7 * (52 * 51 // 2)
        var18 = 7 * (52 * 51 * 109)
        z_want = (s_want - 1) / math.sqrt(var18 / 18.0)
        print(
            "seasonal_mk_96m_events", timings["seasonal_mk_96m_events"],
            "keys", len(out), "s", out[0].s_stat,
            "expected_s", s_want, flush=True,
        )
        assert len(out) == 20
        for r in out:
            assert r.n_obs == 364 and r.n_seasons == 7
            assert r.s_stat == s_want
            assert abs(r.z - z_want) < 1e-4

    # ---- round-11 batch-4 operators
    if want("runs"):
        # flag alternates within every key ⇒ R = n EXACTLY per key
        rows = spark.range(n100).select(
            F.concat(
                F.lit("k"),
                F.pmod(F.col("id"), F.lit(20)).cast("string"),
            ).alias("k"),
            (F.col("id") / 20).cast("long").alias("t"),
            (F.pmod((F.col("id") / 20).cast("long"), F.lit(2)) == 0)
            .alias("x"),
        )
        t = time.time()
        out = pr.runs_test(rows, "k", "t", "x").collect()
        timings["runs_test_100m_rows"] = round(time.time() - t, 2)
        nk = n100 // 20
        print(
            "runs_test_100m_rows", timings["runs_test_100m_rows"],
            "keys", len(out), "runs", out[0].n_runs,
            "expected", nk, flush=True,
        )
        assert len(out) == 20
        for r in out:
            assert r.n == nk and r.n_runs == nk and r.z > 1000

    if want("ljungbox"):
        # day d gets exactly 13000 + (d%7)·1000 rows per key — a
        # strong planted weekly cycle whose Q replays in closed form
        import math

        grid = spark.range(20 * 364).select(
            F.concat(
                F.lit("k"),
                (F.col("id") / 364).cast("long").cast("string"),
            ).alias("k"),
            F.pmod(F.col("id"), F.lit(364)).cast("int").alias("day"),
        )
        events = grid.select(
            "k",
            "day",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.lit(13000)
                    + F.pmod(F.col("day"), F.lit(7)) * 1000,
                )
            ).alias("__i"),
        )
        t = time.time()
        daily = events.groupBy("k", "day").agg(
            F.count(F.lit(1)).alias("n")
        )
        out = tso.ljung_box(daily, "k", "day", "n", lags=5).collect()
        timings["ljung_box_116m_events"] = round(time.time() - t, 2)
        cs = [(13000 + (d % 7) * 1000) * 100 for d in range(364)]
        n = len(cs)
        sx = sum(cs)
        sxx = sum(c * c for c in cs)
        c0n2 = n * n * sxx - n * sx * sx
        qq = 0.0
        for kk in range(1, 6):
            sxy = sum(cs[t_] * cs[t_ - kk] for t_ in range(kk, n))
            head = sum(cs[t_] for t_ in range(kk, n))
            tail = sum(cs[t_ - kk] for t_ in range(kk, n))
            ckn2 = (
                n * n * sxy - n * sx * (head + tail)
                + (n - kk) * sx * sx
            )
            rr = ckn2 / c0n2
            qq += rr * rr / (n - kk)
        q_want = n * (n + 2) * qq
        print(
            "ljung_box_116m_events", timings["ljung_box_116m_events"],
            "q", out[0].q_stat, "expected", round(q_want, 6),
            flush=True,
        )
        assert len(out) == 20
        for r in out:
            assert r.n == 364 and abs(r.q_stat - q_want) < 1e-4

    if want("ngrams"):
        # half the docs are ONE shared 10-token template, half are
        # all-unique fillers ⇒ every distinct count is closed-form
        n_docs, tpd = 10_000_000, 10
        is_tmpl = F.pmod(F.col("id"), F.lit(2)) == 0
        tok = F.transform(
            F.sequence(F.lit(0), F.lit(tpd - 1)),
            lambda j: F.when(
                is_tmpl, F.concat(F.lit("tmpl"), j.cast("string"))
            ).otherwise(
                F.concat_ws(
                    "_",
                    F.lit("u"),
                    F.col("id").cast("string"),
                    j.cast("string"),
                )
            ),
        )
        docs = spark.range(n_docs).select(
            F.concat_ws(" ", tok).alias("text")
        )
        from icnarc_to_philips_linkage_spark.operators import (
            text as tx2,
        )

        t = time.time()
        out = {
            r.n: r
            for r in tx2.distinct_ngram_diversity(docs).collect()
        }
        timings["distinct_ngrams_100m_tokens"] = round(
            time.time() - t, 2
        )
        uniq = n_docs // 2
        print(
            "distinct_ngrams_100m_tokens",
            timings["distinct_ngrams_100m_tokens"],
            "d1", out[1].distinct_ngrams,
            "expected", tpd + uniq * tpd, flush=True,
        )
        for n in (1, 2, 3):
            span = tpd - n + 1
            assert out[n].total_ngrams == n_docs * span
            assert out[n].distinct_ngrams == span + uniq * span, out[n]

    if want("heaps"):
        # source s: N = 1e6·4^s tokens over vocab V = 1000·2^s ⇒
        # V = N^0.5 · 10^(3−3) exactly in log-space ⇒ β = 0.5
        import math

        tpd = 10
        bounds = [0]
        for s in range(4):
            bounds.append(bounds[-1] + 1_000_000 * 4 ** s // tpd)
        src_expr = None
        for s in range(4):
            cond = (F.col("id") >= bounds[s]) & (
                F.col("id") < bounds[s + 1]
            )
            pick = F.lit(f"s{s}")
            src_expr = (
                F.when(cond, pick)
                if src_expr is None
                else src_expr.when(cond, pick)
            )
        vocab_expr = (
            F.when(F.col("id") < bounds[1], 1000)
            .when(F.col("id") < bounds[2], 2000)
            .when(F.col("id") < bounds[3], 4000)
            .otherwise(8000)
        )
        tok = F.transform(
            F.sequence(F.lit(0), F.lit(tpd - 1)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(F.col("id") * tpd + j, vocab_expr).cast(
                    "string"
                ),
            ),
        )
        docs = spark.range(bounds[-1]).select(
            src_expr.alias("source"),
            F.concat_ws(" ", tok).alias("text"),
        )
        from icnarc_to_philips_linkage_spark.operators import (
            text as tx3,
        )

        t = time.time()
        r = tx3.heaps_law_fit(docs, "source").collect()[0]
        timings["heaps_fit_85m_tokens"] = round(time.time() - t, 2)
        print(
            "heaps_fit_85m_tokens", timings["heaps_fit_85m_tokens"],
            "beta", r.beta, "r2", r.r2, flush=True,
        )
        assert r.n_groups == 4
        assert abs(r.beta - 0.5) < 1e-3 and r.r2 > 0.9999

    if want("poissonrate"):
        # exactly 20M clicks vs 80M others at exposures 1:4 ⇒ the
        # conditional z is 0.0 EXACT (c1 = N·p0 on the nose)
        rows = spark.range(n100).select(
            (F.pmod(F.col("id"), F.lit(5)) == 0).alias("g")
        )
        t = time.time()
        r = ev.poisson_two_rate(rows, "g", 1.0, 4.0).collect()[0]
        timings["poisson_rate_100m_rows"] = round(time.time() - t, 2)
        print(
            "poisson_rate_100m_rows",
            timings["poisson_rate_100m_rows"],
            "z", r.z, "rates", (r.rate_1, r.rate_2), flush=True,
        )
        assert r.n_events_1 == n100 // 5
        assert r.rate_1 == r.rate_2 and r.z == 0.0

    if want("oddsratio"):
        # id%10 slices plant (a,b,c,d) = (30,20,10,40)M ⇒ OR = 6 EXACT
        m = F.pmod(F.col("id"), F.lit(10))
        rows = spark.range(n100).select(
            (m < 5).alias("e"),
            ((m < 3) | ((m >= 5) & (m < 6))).alias("o"),
        )
        t = time.time()
        r = ev.odds_ratio_woolf(rows, "e", "o").collect()[0]
        timings["odds_ratio_100m_rows"] = round(time.time() - t, 2)
        import math

        orr = 6.0
        half = 1.96 * math.sqrt(
            1 / 3e7 + 1 / 2e7 + 1 / 1e7 + 1 / 4e7
        )
        print(
            "odds_ratio_100m_rows", timings["odds_ratio_100m_rows"],
            "or", r.odds_ratio, "ci", (r.ci_lo, r.ci_hi), flush=True,
        )
        assert (r.a, r.b, r.c, r.d) == (
            30_000_000, 20_000_000, 10_000_000, 40_000_000,
        )
        assert r.odds_ratio == 6.0
        assert abs(r.ci_lo - math.exp(math.log(orr) - half)) < 1e-5
        assert abs(r.ci_hi - math.exp(math.log(orr) + half)) < 1e-5

    if want("dispersion"):
        # values 0..4 uniform per key ⇒ mean 2, sample var 2.5·n/(n−1)
        rows = spark.range(n100).select(
            F.concat(
                F.lit("k"),
                F.pmod(F.col("id"), F.lit(20)).cast("string"),
            ).alias("k"),
            F.pmod((F.col("id") / 20).cast("long"), F.lit(5))
            .cast("double")
            .alias("v"),
        )
        t = time.time()
        out = pr.dispersion_index(rows, "k", "v").collect()
        timings["dispersion_100m_rows"] = round(time.time() - t, 2)
        nk = n100 // 20
        var_s = 2.0 * nk / (nk - 1.0)  # population var 2 exactly
        print(
            "dispersion_100m_rows", timings["dispersion_100m_rows"],
            "vmr", out[0].vmr, "expected", round(var_s / 2.0, 6),
            flush=True,
        )
        assert len(out) == 20
        for r in out:
            assert r.n == nk and r.mean == 2.0
            assert abs(r.vmr - var_s / 2.0) < 1e-6

    print(json.dumps({"timings_sec": timings}))
    spark.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
