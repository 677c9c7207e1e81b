"""Round-10 scale smokes: the round-9 corpus-heavy dedup family at
~100M-token scale (VERDICT r9 task #1) — exact-substring span removal,
paragraph-granularity C4 dedup, winnowing overlap, and the exact
containment join. Same inline-generation discipline as scale_smoke.py
(spark.range + hash-derived features, parquet scratch dir, noop sink),
with PLANTED duplication whose expected counts are known in closed form
so every smoke doubles as an exactness check at scale.

Corpus A (span/paragraph/winnow): N_DOCS docs x 40 tokens. Docs with
id % 10 < 3 start with a 20-token shared template (50 templates keyed
by xxhash64(id,3) % 50); every other token is a doc-unique md5-derived
string, so the ONLY cross-document n-gram/paragraph/fingerprint
collisions are the planted templates:
  - span removal (n=8): non-keeper template docs lose exactly the 20
    covered positions -> sum(n_removed) = (n_template_docs - 50) * 20
  - paragraph C4 (20-token tumbling windows): window 1 of non-keeper
    template docs is cut -> sum(n_removed) = n_template_docs - 50
  - winnowing (k=5, w=4, shared run 20 >= w+k-1): exactly the
    n_template_docs docs report n_shared > 0

Corpus B (containment, t=0.8): N_B docs x 20 tokens from a 25M vocab
(posting lists ~Poisson(4)); docs with id % 100 == 1 instead carry the
FIRST 10 tokens of doc id-1 -> containment(A->B) = 1.0, reverse 0.5
(not emitted) -> exactly N_B/100 planted directed pairs.

Batch 2 (round-10 statistics/sampling ops with corpus-scale inputs):
bt, delong, wilcoxon, kendall, reservoir, theilsen — each with a
closed-form ride-along (lower-id-always-wins strength ordering;
perfect-separation auc1 = 1.0; all-|d|=1 W+ = pos*(n+1)/2; y = x
tau_b = 1.0; exactly k rows per stratum; full 366-day grids).

Run: python scale_smoke_r10.py [n_docs_corpus_a]   (default 2.5M ->
100M tokens). SMOKE_ONLY=span,para,winnow,containment,bt,delong,
wilcoxon,kendall,reservoir,theilsen selects a subset.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    only = set(
        s for s in os.environ.get("SMOKE_ONLY", "").split(",") if s
    )

    def want(tag: str) -> bool:
        return not only or tag in only

    from icnarc_to_philips_linkage_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke-r10",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="scale-smoke-r10-")
    timings: dict[str, float] = {}
    n_tmpl_docs = (n_docs // 10) * 3  # id % 10 in {0,1,2}

    # ---- corpus A: 40 tokens/doc, 20-token planted template prefix
    need_a = any(want(x) for x in ("span", "para", "winnow"))
    T = 40
    tmpl_id = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(50))
    is_tmpl = F.pmod(F.col("id"), F.lit(10)) < 3
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(T)),
        lambda i: F.when(
            is_tmpl & (i <= 20),
            F.concat_ws("_", F.lit("s"), tmpl_id.cast("string"),
                        i.cast("string")),
        ).otherwise(
            F.substring(
                F.md5(
                    F.concat_ws("x", F.col("id").cast("string"),
                                i.cast("string"))
                ),
                1,
                10,
            )
        ),
    )
    if need_a:
        t0 = time.time()
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
        ).write.mode("overwrite").parquet(f"{d}/docs_a")
        gen_a = round(time.time() - t0, 1)
        docs_a = spark.read.parquet(f"{d}/docs_a")
        print(f"corpus A: {n_docs} docs x {T} tokens "
              f"({n_docs * T} tokens), gen {gen_a}s", flush=True)

    from icnarc_to_philips_linkage_spark.operators import dedup_scale, text

    if want("span"):
        t = time.time()
        out = dedup_scale.remove_duplicate_spans(docs_a, n=8)
        agg = out.agg(
            F.sum("n_removed").alias("rm"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        timings["span_removal_100m_tokens"] = round(time.time() - t, 2)
        expect = (n_tmpl_docs - 50) * 20
        print(
            "span_removal_100m_tokens",
            timings["span_removal_100m_tokens"],
            "docs", agg.n, "removed", agg.rm, "expected", expect,
            flush=True,
        )
        assert agg.n == n_docs and agg.rm == expect, (agg, expect)

    if want("para"):
        t = time.time()
        paras = dedup_scale.token_window_paragraphs(docs_a, window=20)
        out = dedup_scale.paragraph_dedup_exploded(paras)
        agg = out.agg(
            F.sum("n_removed").alias("rm"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        timings["paragraph_c4_100m_tokens"] = round(time.time() - t, 2)
        expect = n_tmpl_docs - 50
        print(
            "paragraph_c4_100m_tokens",
            timings["paragraph_c4_100m_tokens"],
            "docs", agg.n, "removed_paras", agg.rm, "expected", expect,
            flush=True,
        )
        assert agg.n == n_docs and agg.rm == expect, (agg, expect)

    if want("winnow"):
        t = time.time()
        out = text.winnow_overlap_report(docs_a, k=5, w=4)
        agg = out.agg(
            F.sum((F.col("n_shared") > 0).cast("long")).alias("sh"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        timings["winnow_overlap_100m_tokens"] = round(time.time() - t, 2)
        print(
            "winnow_overlap_100m_tokens",
            timings["winnow_overlap_100m_tokens"],
            "docs", agg.n, "docs_sharing", agg.sh,
            "expected", n_tmpl_docs, flush=True,
        )
        assert agg.n == n_docs and agg.sh == n_tmpl_docs, (
            agg, n_tmpl_docs,
        )

    if want("containment"):
        n_b, s, vocab = 5_000_000, 20, 25_000_000
        planted = F.pmod(F.col("id"), F.lit(100)) == 1
        base = F.when(planted, F.col("id") - 1).otherwise(F.col("id"))
        size_b = F.when(planted, F.lit(10)).otherwise(F.lit(s))
        tok_b = F.transform(
            F.sequence(F.lit(0), size_b - 1),
            lambda j: F.concat(
                F.lit("v"),
                F.pmod(
                    F.xxhash64(base * s + j, F.lit(9)), F.lit(vocab)
                ).cast("string"),
            ),
        )
        t0 = time.time()
        spark.range(n_b).select(
            F.col("id").alias("doc_id"), tok_b.alias("toks")
        ).write.mode("overwrite").parquet(f"{d}/docs_b")
        gen_b = round(time.time() - t0, 1)
        docs_b = spark.read.parquet(f"{d}/docs_b")
        print(f"corpus B: {n_b} docs x {s} tokens, vocab {vocab}, "
              f"gen {gen_b}s", flush=True)
        t = time.time()
        pairs = dedup_scale.containment_prefix_join(
            docs_b, set_col="toks", threshold=0.8
        )
        agg = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    (F.col("id_a") == F.col("id_b") + 1)
                    & (F.col("containment") == 1.0)
                ).cast("long")
            ).alias("planted"),
        ).collect()[0]
        timings["containment_5m_docs"] = round(time.time() - t, 2)
        print(
            "containment_5m_docs", timings["containment_5m_docs"],
            "pairs", agg.n, "planted_found", agg.planted,
            "expected_planted", n_b // 100, flush=True,
        )
        assert agg.planted == n_b // 100, (agg, n_b // 100)

    # ---- batch 2: the round-10 statistics/sampling operators whose
    # inputs are corpus-scale (the bounded-grain tail is free; the
    # corpus pass is what these time). Each carries a closed-form
    # exactness ride-along.
    from icnarc_to_philips_linkage_spark.operators import (
        evaluation as ev,
        profile as pr,
        sampling as sa,
        timeseries as tso,
    )

    n100 = 100_000_000

    if want("bt"):
        # pairs: items 0..4 drawn per row; LOWER id always wins ->
        # strict strength ordering; n_games sums to 2 per pair
        i1 = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5))
        i2 = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5))
        pairs = (
            spark.range(n100)
            .filter(i1 != i2)
            .select(
                F.least(i1, i2).cast("string").alias("winner"),
                F.greatest(i1, i2).cast("string").alias("loser"),
            )
        )
        t = time.time()
        rows = {
            r.item: r
            for r in ev.bradley_terry_strengths(
                pairs, items=[str(i) for i in range(5)]
            ).collect()
        }
        timings["bradley_terry_100m_pairs"] = round(time.time() - t, 2)
        s = [rows[str(i)].strength or 0.0 for i in range(5)]
        n_games_total = sum(rows[str(i)].n_games for i in range(5))
        print(
            "bradley_terry_100m_pairs",
            timings["bradley_terry_100m_pairs"],
            "strengths", s, "games2x", n_games_total, flush=True,
        )
        assert all(a > b for a, b in zip(s, s[1:])), s
        assert abs(sum(x for x in s if x) - 1.0) < 1e-6

    if want("delong"):
        # s1 separates perfectly (auc1 = 1.0 exactly); s2 is noise
        h = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000))
        scored = spark.range(n100).select(
            h.cast("double").alias("s1"),
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(1000))
            .cast("double")
            .alias("s2"),
            (h >= 500).alias("y"),
        )
        t = time.time()
        r = ev.delong_paired_auc(scored, "s1", "s2", "y").collect()[0]
        timings["delong_100m_scored"] = round(time.time() - t, 2)
        print(
            "delong_100m_scored", timings["delong_100m_scored"],
            "auc1", r.auc1, "auc2", r.auc2, "z", r.z, flush=True,
        )
        assert r.auc1 == 1.0 and abs(r.auc2 - 0.5) < 0.001 and r.z > 0

    if want("wilcoxon"):
        # every |d| = 1, 60% positive: W+ = pos*(n+1)/2 EXACTLY
        n_w = 50_000_000
        pos_row = F.pmod(F.xxhash64("id", F.lit(5)), F.lit(5)) < 3
        pairs = spark.range(n_w).select(
            F.when(pos_row, 1).otherwise(0).cast("long").alias("a"),
            F.when(pos_row, 0).otherwise(1).cast("long").alias("b"),
        )
        t = time.time()
        r = ev.wilcoxon_signed_rank(pairs, "a", "b").collect()[0]
        timings["wilcoxon_50m_pairs"] = round(time.time() - t, 2)
        n_pos = pairs.filter(F.col("a") == 1).count()
        expect_w = n_pos * (n_w + 1) / 2.0
        print(
            "wilcoxon_50m_pairs", timings["wilcoxon_50m_pairs"],
            "w_plus", r.w_plus, "expected", expect_w, "z", r.z,
            flush=True,
        )
        assert r.n_nonzero == n_w and r.w_plus == expect_w and r.z > 0

    if want("kendall"):
        # y = x exactly -> tau_b = 1.0 on the 50-cell grid
        x = F.pmod(F.xxhash64("id", F.lit(6)), F.lit(50))
        rows_df = spark.range(n100).select(
            x.alias("x"), x.alias("y")
        )
        t = time.time()
        r = pr.kendall_tau_b(rows_df, "x", "y").collect()[0]
        timings["kendall_100m_rows"] = round(time.time() - t, 2)
        print(
            "kendall_100m_rows", timings["kendall_100m_rows"],
            "tau", r.tau_b, "n", r.n, flush=True,
        )
        assert r.n == n100 and r.tau_b == 1.0

    if want("reservoir"):
        rows_df = spark.range(n100).select(
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(20))
            .cast("string")
            .alias("st"),
            F.col("id"),
            (1 + F.pmod(F.xxhash64("id", F.lit(8)), F.lit(9))).alias(
                "w"
            ),
        )
        t = time.time()
        out = sa.stratified_reservoir_topk(
            rows_df, "st", "id", "w", k=100
        )
        agg = out.groupBy("st").agg(
            F.count(F.lit(1)).alias("n"), F.max("rank").alias("mr")
        ).collect()
        timings["reservoir_100m_rows_20_strata"] = round(
            time.time() - t, 2
        )
        print(
            "reservoir_100m_rows_20_strata",
            timings["reservoir_100m_rows_20_strata"],
            "strata", len(agg), flush=True,
        )
        assert len(agg) == 20
        assert all(a.n == 100 and a.mr == 100 for a in agg), agg

    if want("theilsen"):
        # 100M events -> (20 keys x 366 days) grid; per-key daily
        # volumes are near-uniform so the Sen slope is ~0
        ev100 = spark.range(n100).select(
            F.pmod(F.xxhash64("id", F.lit(9)), F.lit(20))
            .cast("string")
            .alias("k"),
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                F.pmod(F.xxhash64("id", F.lit(10)), F.lit(366)).cast(
                    "int"
                ),
            ).alias("day"),
        )
        daily = ev100.groupBy("k", "day").agg(
            F.count(F.lit(1)).alias("n")
        )
        t = time.time()
        out = tso.theil_sen_slope(daily, "k", "day", "n").collect()
        timings["theil_sen_100m_events"] = round(time.time() - t, 2)
        print(
            "theil_sen_100m_events", timings["theil_sen_100m_events"],
            "keys", len(out),
            "max_abs_slope", max(abs(r.sen_slope) for r in out),
            flush=True,
        )
        assert len(out) == 20
        assert all(r.n_obs == 366 and r.n_pairs == 66795 for r in out)

    # ---- batch 3: the remaining round-10 ops with corpus-scale
    # inputs (all collapse to bounded grains in one aggregation; the
    # smoke prices that corpus pass). Closed-form ride-alongs again.
    from icnarc_to_philips_linkage_spark.operators import text as txt

    if want("cox"):
        # higher activity -> systematically shorter durations: beta > 0
        x = (
            F.pmod(F.xxhash64("id", F.lit(11)), F.lit(50)) / 50.0
        )
        noise = F.pmod(F.xxhash64("id", F.lit(12)), F.lit(60))
        subj = spark.range(n100).select(
            (
                F.lit(360) - F.floor(x * 300).cast("int") + noise.cast("int")
            ).alias("t"),
            x.alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(10)) < 8)
            .cast("int")
            .alias("e"),
        )
        t = time.time()
        r = tso.cox_ph_single(subj, "t", "e", "x").collect()[0]
        timings["cox_100m_subjects"] = round(time.time() - t, 2)
        print(
            "cox_100m_subjects", timings["cox_100m_subjects"],
            "beta", r.beta, "hr", r.hazard_ratio,
            "events", r.n_events, flush=True,
        )
        assert r.n_subjects == n100 and r.beta > 0.5

    if want("cuped"):
        xv = F.pmod(F.xxhash64("id", F.lit(14)), F.lit(1000)) / 100.0
        nz = F.pmod(F.xxhash64("id", F.lit(15)), F.lit(100)) / 100.0
        rows_df = spark.range(n100).select(
            F.when(F.col("id") % 2 == 0, "A").otherwise("B")
            .alias("variant"),
            (2.0 * xv + nz).alias("y"),
            xv.alias("x"),
        )
        t = time.time()
        out = {
            r.variant: r
            for r in ev.cuped_adjusted_means(
                rows_df, "y", "x", "variant"
            ).collect()
        }
        timings["cuped_100m_rows"] = round(time.time() - t, 2)
        print(
            "cuped_100m_rows", timings["cuped_100m_rows"],
            "rho2", out["A"].rho2, "theta", out["A"].theta, flush=True,
        )
        assert out["A"].rho2 > 0.99  # y = 2x + small noise
        # no planted lift: adjusted gap ~ 0
        assert abs(out["A"].mean_adjusted - out["B"].mean_adjusted) < 0.01

    if want("cramers"):
        # b == a exactly -> V = 1.0 EXACT via the o2/(rc) identity
        a = F.pmod(F.xxhash64("id", F.lit(16)), F.lit(5)).cast("string")
        rows_df = spark.range(n100).select(a.alias("a"), a.alias("b"))
        t = time.time()
        r = pr.cramers_v(rows_df, "a", "b").collect()[0]
        timings["cramers_100m_rows"] = round(time.time() - t, 2)
        print(
            "cramers_100m_rows", timings["cramers_100m_rows"],
            "v", r.cramers_v, "n", r.n, flush=True,
        )
        assert r.n == n100 and r.cramers_v == 1.0

    if want("gtest"):
        # perfect diagonal, uniform 5 levels: G = 2n·ln(5) (each cell
        # contributes (n/5)·ln(5), 6dp-rounded per cell)
        import math

        a = F.pmod(F.xxhash64("id", F.lit(17)), F.lit(5)).cast("string")
        rows_df = spark.range(n100).select(a.alias("a"), a.alias("b"))
        t = time.time()
        r = pr.g_test_independence(rows_df, "a", "b").collect()[0]
        timings["gtest_100m_rows"] = round(time.time() - t, 2)
        print(
            "gtest_100m_rows", timings["gtest_100m_rows"],
            "g", r.g_stat, "expected~", 2 * n100 * math.log(5.0),
            flush=True,
        )
        assert abs(r.g_stat - 2 * n100 * math.log(5.0)) < 1000

    if want("twoprop"):
        g = F.pmod(F.xxhash64("id", F.lit(18)), F.lit(2)) == 0
        s = F.when(
            g, F.pmod(F.xxhash64("id", F.lit(19)), F.lit(10)) < 3
        ).otherwise(F.pmod(F.xxhash64("id", F.lit(19)), F.lit(10)) < 2)
        rows_df = spark.range(n100).select(g.alias("g"), s.alias("s"))
        t = time.time()
        r = ev.two_proportion_z(rows_df, "g", "s").collect()[0]
        timings["two_prop_100m_rows"] = round(time.time() - t, 2)
        print(
            "two_prop_100m_rows", timings["two_prop_100m_rows"],
            "p1", r.p1, "p2", r.p2, "z", r.z, flush=True,
        )
        assert abs(r.p1 - 0.3) < 0.001 and abs(r.p2 - 0.2) < 0.001
        assert r.z > 100  # a 10-point lift at 50M per arm

    if want("vocab"):
        # 10M docs x 10 tokens; 10% of positions are structurally
        # unique singletons -> f1 = 10M exactly (common vocab 1M with
        # ~90 draws/word adds no singletons)
        n_docs_v, tpd = 10_000_000, 10
        toks_v = F.transform(
            F.sequence(F.lit(0), F.lit(tpd - 1)),
            lambda i: F.when(
                F.pmod(F.xxhash64("id", i), F.lit(10)) == 0,
                F.concat_ws(
                    "_", F.lit("u"), F.col("id").cast("string"),
                    i.cast("string"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64("id", i, F.lit(20)),
                        F.lit(1_000_000),
                    ).cast("string"),
                )
            ),
        )
        docs_v = spark.range(n_docs_v).select(
            F.concat_ws(" ", toks_v).alias("text")
        )
        t = time.time()
        r = txt.vocab_richness_report(docs_v).collect()[0]
        timings["vocab_richness_100m_tokens"] = round(time.time() - t, 2)
        n_singletons_expected = docs_v.select(
            F.explode(F.split("text", " ")).alias("w")
        ).filter(F.col("w").startswith("u")).count()
        print(
            "vocab_richness_100m_tokens",
            timings["vocab_richness_100m_tokens"],
            "f1", r.f1_singletons, "expected", n_singletons_expected,
            "chao1", r.chao1_estimate, flush=True,
        )
        assert r.n_tokens == n_docs_v * tpd
        assert r.f1_singletons == n_singletons_expected
        assert r.chao1_estimate > r.vocab_size

    if want("isotonic"):
        # monotone planted rates -> the PAV fit equals the raw rates
        sb = F.pmod(F.xxhash64("id", F.lit(21)), F.lit(20)).cast("int")
        yv = (
            F.pmod(F.xxhash64("id", F.lit(22)), F.lit(100))
            < (sb * 4 + 5)
        )
        rows_df = spark.range(n100).select(sb.alias("sb"), yv.alias("y"))
        t = time.time()
        out = ev.isotonic_calibration_grid(rows_df, "sb", "y").collect()
        timings["isotonic_100m_rows"] = round(time.time() - t, 2)
        print(
            "isotonic_100m_rows", timings["isotonic_100m_rows"],
            "bins", len(out), flush=True,
        )
        assert len(out) == 20
        for r in out:
            assert abs(r.iso_rate - r.raw_rate) < 1e-9, r

    print(json.dumps({
        "n_docs_corpus_a": n_docs,
        "timings_sec": timings,
    }))
    shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
