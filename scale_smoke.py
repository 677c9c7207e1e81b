"""Scale smoke: generate a ~100M-row synthetic events table (≈170× the
sf0.1 bench) in a scratch dir and time representative operators on it.
Not part of the driver bench — evidence that the plans hold far past the
test scale factors. Run: python scale_smoke.py [n_rows]."""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    from icnarc_to_philips_linkage_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="scale-smoke-")
    t0 = time.time()
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1704067200000000) + F.col("id") * 50_000
            ).alias("ts"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("click", "view", "purchase", "error", "signup")]),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100000)) / 100.0).alias("value"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events")
    )
    gen_sec = round(time.time() - t0, 1)
    e = spark.read.parquet(f"{d}/events")

    timings = {}

    def bench(name, df):
        t = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t, 2)

    bench(
        "hash_agg_per_type",
        e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sv"),
        ),
    )
    bench(
        "window_topk_per_user_sample",
        e.filter(F.col("user_id") < 10_000)
        .groupBy("user_id")
        .agg(F.max("value").alias("mx"))
        .orderBy(F.desc("mx"), "user_id")
        .limit(100),
    )
    bench(
        "distinct_users",
        e.agg(F.approx_count_distinct("user_id", 0.01).alias("u")),
    )
    from icnarc_to_philips_linkage_spark.operators.timeseries import asof_join

    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    bench(
        "asof_join_clicks_purchases",
        asof_join(clicks, purchases, "user_id", "ts", "pts", "value"),
    )
    bench(
        "dedup_merge_user_day",
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
            F.min("ts"), F.max("ts"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
            F.count(F.lit(1)),
        ),
    )
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        resample_interpolate,
    )

    # 50k-user slice: the grid explode is keys × span/step by design
    # (100M rows over ~58 days × 1M users would be a 1.4B-row grid —
    # the slice keeps the smoke bounded while driving the same plan)
    bench(
        "resample_interp_hourly_50k_users",
        resample_interpolate(
            e.filter(F.col("user_id") < 50_000),
            key="user_id", ts_col="ts", value_col="value",
            tiebreak="event_id",
        ),
    )
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        lsh_bands,
        minhash_signatures_arr,
        shingle_sets,
    )

    # synthetic text corpus of ~30-word docs — exercises the map-only
    # signature path + band unpivot (cost is md5-bound: ~230 digests/doc)
    docs = spark.range(min(n // 200, 500_000)).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda i: F.conv(
                    F.substring(F.md5(F.concat(F.col("id"), i)), 1, 4), 16, 10
                ),
            ),
            " ",
        ).alias("text"),
    )
    bench(
        "minhash_bands_500k_docs",
        lsh_bands(minhash_signatures_arr(shingle_sets(docs))),
    )
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        interval_join,
    )

    # ~20M purchase windows (1-24h) × ~20M clicks: the bucketed equi
    # path — interval explode fan-out ≤ 2 at the 1-day bucket
    iv = purchases.select(
        F.col("user_id"),
        F.col("pts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("pts")
            + (F.lit(1) + F.pmod(F.unix_micros("pts"), F.lit(24)))
            * F.lit(3_600_000_000)
        ).alias("iv_end"),
    )
    bench(
        "interval_join_clicks_in_purchase_windows",
        interval_join(
            clicks, iv, point_ts="ts", start_col="s", end_col="iv_end",
            key="user_id", bucket="1 day",
        ).groupBy("user_id").agg(F.count(F.lit(1)).alias("n")),
    )
    from icnarc_to_philips_linkage_spark.operators.text import tfidf_top_terms

    bench("tfidf_top3_500k_docs", tfidf_top_terms(docs, k=3))

    # skewed join: ~20% of fact rows share ONE key (hot key = 20M rows).
    # Three physical answers, all timed: AQE skew-split on the sort-merge
    # join (the adaptive default), explicit salting (guaranteed layout),
    # and — for contrast — AQE disabled via a merge hint on a
    # non-splittable shuffled-hash join is omitted because a 20M-row
    # single task makes the smoke take minutes by design.
    # (Grouped SUM/COUNT is deliberately NOT the demo: map-side partial
    # aggregation already absorbs key skew for algebraic aggregates.)
    from icnarc_to_philips_linkage_spark.operators.scale import salted_join

    skewed = e.withColumn(
        "sk_user",
        F.when(F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(5)) == 0, F.lit(0))
        .otherwise(F.col("user_id")),
    ).select("sk_user", "value")
    dim = (
        spark.range(1_000_000)
        .select(F.col("id").alias("sk_user"))
        .withColumn("grp", F.pmod("sk_user", F.lit(100)).cast("int"))
    )
    joined = skewed.join(dim.hint("merge"), "sk_user").groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")
    )
    bench("skewed_join_aqe_skew_split", joined)
    bench(
        "skewed_join_salted",
        salted_join(skewed, dim, "sk_user", salts=32).groupBy("grp").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )

    # distributed global ordinal over the full table: the single-
    # partition row_number() would push all n rows through ONE sorting
    # task; global_rank's range exchange + offset map keeps every task
    # partition-local (this smoke is the existence proof at 100M rows)
    from icnarc_to_philips_linkage_spark.operators.scale import global_rank

    # global_rank's expensive phase is EAGER (checkpoint + counts
    # collect at construction), so time the call itself, not just the
    # returned frame's final agg
    t = time.time()
    gr = global_rank(e.select("event_id", "value"), ["value", "event_id"])
    gr.agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("max_rank")
    ).collect()
    timings["global_rank_full_table"] = round(time.time() - t, 2)
    print("global_rank_full_table", timings["global_rank_full_table"], flush=True)

    # truncated EWMA: 20 lag terms, one window pass over 1M user keys
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        ewma_window,
    )

    bench(
        "ewma_window_20lags",
        ewma_window(e, "user_id", "ts", "value", tiebreak="event_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("ewma"), 2).alias("m")),
    )
    # round-6 ops at full scale: the CMS collapses map-side to ≤1024
    # cells per task before its only exchange; the transition matrix's
    # lead window shuffles once on user_id (1M bounded partitions); the
    # chi-square reduces to a 5×24 grid; the bootstrap's 4× replicate
    # fan-out is map-only (md5-bound) with one (replicate × partition)
    # partial-agg exchange
    from icnarc_to_philips_linkage_spark.operators.events import (
        transition_matrix,
    )
    from icnarc_to_philips_linkage_spark.operators.profile import (
        chi_square_independence,
        countmin_sketch,
    )
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        poisson_bootstrap_means,
    )

    bench("countmin_sketch_user_ids", countmin_sketch(e, "user_id"))
    bench("transition_matrix_full", transition_matrix(e))
    bench(
        "chi_square_type_by_hour",
        chi_square_independence(
            e.withColumn("hour", F.hour("ts")), "event_type", "hour"
        ),
    )
    bench(
        "poisson_bootstrap_4rep",
        poisson_bootstrap_means(e, "event_id", "value", replicates=4),
    )
    # OHLC at full scale: one map-combined aggregation over (user, hour)
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        ohlc_bars,
    )

    bench("ohlc_bars_full", ohlc_bars(e))
    # grouped two-level rank over 8 giant groups — the per-group window
    # alternative would funnel ~12.5M rows through each of 8 tasks
    from icnarc_to_philips_linkage_spark.operators.scale import (
        grouped_global_rank,
    )

    t = time.time()
    gr8 = grouped_global_rank(
        e.select("event_id", "value").withColumn(
            "g", F.pmod("event_id", F.lit(8)).cast("int")
        ),
        ["g"],
        ["value", "event_id"],
    )
    gr8.groupBy("g").agg(F.max("rank")).collect()
    timings["grouped_rank_8_groups"] = round(time.time() - t, 2)
    print("grouped_rank_8_groups", timings["grouped_rank_8_groups"], flush=True)
    # PageRank on a synthetic 10M-edge / 1M-node graph: 3 integer-exact
    # iterations with the node-sized tables broadcast in-loop
    from icnarc_to_philips_linkage_spark.operators.graph import pagerank

    edges10m = spark.range(10_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(1_000_000)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(1_000_000)).alias("dst"),
    )
    t = time.time()
    pr = pagerank(edges10m, iterations=3)
    pr.agg(F.count(F.lit(1)), F.max("rank")).collect()
    timings["pagerank_10m_edges_3iter"] = round(time.time() - t, 2)
    print("pagerank_10m_edges_3iter", timings["pagerank_10m_edges_3iter"], flush=True)
    # suffix ordering at ~2M token positions (7.4× the sf0.1 corpus):
    # 50k docs × 40 tokens, ~2% full-doc duplicates planted via seed
    # collisions so the tied rank classes survive every doubling round
    # (unique-text corpora early-exit immediately and prove nothing)
    from icnarc_to_philips_linkage_spark.operators.suffixes import (
        longest_repeated_sequences,
    )

    sdocs = spark.range(min(n // 2000, 50_000)).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.pmod(
                                    F.xxhash64("id"),
                                    F.lit(min(n // 2000, 50_000) * 49 // 50),
                                ),
                                i,
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ),
            ),
            " ",
        ).alias("text"),
    )
    t = time.time()
    lr = longest_repeated_sequences(sdocs, top_k=10).collect()
    timings["suffix_longest_repeats_2m_positions"] = round(time.time() - t, 2)
    print(
        "suffix_longest_repeats_2m_positions",
        timings["suffix_longest_repeats_2m_positions"],
        "top_lcp",
        lr[0].lcp_tokens,
        flush=True,
    )
    # exact OSA-1 join over 1M synthetic identifiers (67× the bench's
    # 15k names): deletion-neighborhood candidate generation stays
    # O(rows·len) keys; the substr transposition check is map-side
    from icnarc_to_philips_linkage_spark.operators.fuzzy import (
        osa1_neighborhood_join,
    )

    names = spark.range(min(n // 100, 1_000_000)).select(
        F.col("id").alias("nid"),
        F.concat(
            F.lit("user"), F.lpad(F.col("id").cast("string"), 8, "0")
        ).alias("name"),
    )
    rnames = names.select(
        F.col("nid").alias("rid"), F.col("name").alias("rname")
    )
    t = time.time()
    n_osa = (
        osa1_neighborhood_join(names, rnames, "name", "rname")
        .filter(F.col("nid") < F.col("rid"))
        .count()
    )
    timings["osa1_join_1m_names"] = round(time.time() - t, 2)
    print(
        "osa1_join_1m_names", timings["osa1_join_1m_names"],
        "pairs", n_osa, flush=True,
    )
    # cross-corpus R-S PPJoin at 1M train docs × 2k bench docs (67× /
    # 20× the sf0.1 corpora): 1000 bench docs are planted near-copies
    # of train docs (2 of 24 token positions re-salted → Jaccard
    # 22/26 ≈ 0.846 ≥ the 0.8 threshold); a 50-token shared template
    # pool (1 in 3 positions) makes frequency ordering earn its keep.
    # Exactness check rides along: pairs == planted_found == 1000.
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        jaccard_prefix_join_rs,
    )

    n_tr = min(n // 100, 1_000_000)

    def _tokset(seed_col, salt):
        return F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda i: F.when(
                i % 3 == F.lit(0),
                F.concat(
                    F.lit("common"),
                    F.pmod(
                        F.xxhash64(seed_col + i, F.lit(7)), F.lit(50)
                    ).cast("string"),
                ),
            ).otherwise(
                F.substring(F.md5(F.concat(seed_col, F.lit(salt), i)), 1, 8)
            ),
        )

    spark.range(n_tr).select(
        F.col("id").alias("doc_id"), _tokset(F.col("id"), "t").alias("toks")
    ).write.mode("overwrite").parquet(f"{d}/rs_train")
    spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 1000,
            F.transform(
                _tokset(F.col("id") * 37, "t"),
                lambda tkn, i: F.when(
                    (i == 5) | (i == 11),
                    F.substring(
                        F.md5(F.concat(F.col("id"), F.lit("b"), i)), 1, 8
                    ),
                ).otherwise(tkn),
            ),
        )
        .otherwise(_tokset(F.col("id") + 10_000_000, "b"))
        .alias("toks"),
    ).write.mode("overwrite").parquet(f"{d}/rs_bench")
    tr_docs = spark.read.parquet(f"{d}/rs_train")
    be_docs = spark.read.parquet(f"{d}/rs_bench")
    t = time.time()
    rs_pairs = jaccard_prefix_join_rs(
        tr_docs, be_docs, id_col="doc_id", set_col="toks", threshold=0.8
    )
    n_rs = rs_pairs.count()
    timings["ssjoin_rs_1m_x_2k_docs"] = round(time.time() - t, 2)
    n_rs_planted = rs_pairs.filter(
        F.col("id_l") == F.col("id_r") * 37
    ).count()
    print(
        "ssjoin_rs_1m_x_2k_docs", timings["ssjoin_rs_1m_x_2k_docs"],
        "pairs", n_rs, "planted_found", n_rs_planted, flush=True,
    )
    # exact tie-aware ROC AUC over the full n rows: score on the 1e-6
    # grid (the classifier's emission grid), label a biased coin whose
    # bias rises linearly with score — the construction's theoretical
    # AUC is 2/3, so the printed value doubles as a correctness check.
    # The one ordered pass runs over the ≤ 1e6+1-row distinct-score
    # aggregate, never the corpus (operators/evaluation.py).
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        roc_auc,
    )

    scored = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(1_000_001)) / 1_000_000.0).alias(
            "score"
        ),
        (
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2_000_000))
            < F.pmod(F.xxhash64("id"), F.lit(1_000_001)) + F.lit(500_000)
        ).alias("label"),
    )
    t = time.time()
    auc_row = roc_auc(scored, "score", "label").collect()[0]
    timings["roc_auc_full_table"] = round(time.time() - t, 2)
    print(
        "roc_auc_full_table", timings["roc_auc_full_table"],
        "auc", auc_row.auc, flush=True,
    )
    # MMR rerank over a 2M-vector corpus (130× the sf0.1 embeddings):
    # 10 queries, pool 50, k 10 — the k unrolled greedy rounds operate
    # on the parameter-bounded pooled frame (queries × pool rows); the
    # corpus pays exactly one kNN scan. Row count doubles as the
    # correctness ride-along: 10 queries × k selections.
    from icnarc_to_philips_linkage_spark.operators.retrieval import (
        mmr_rerank,
    )

    n_vec = min(n // 50, 2_000_000)
    dim_s = 32
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim_s - 1)),
            lambda j: F.pmod(F.xxhash64("id", j), F.lit(1000)) / 500.0
            - 1.0,
        ).alias("embedding"),
    )
    emb.write.mode("overwrite").parquet(f"{d}/mmr_emb")
    emb = spark.read.parquet(f"{d}/mmr_emb")
    mmr_q = emb.filter(F.col("vec_id") < 10)
    t = time.time()
    n_mmr = mmr_rerank(emb, mmr_q, k=10, pool=50, lam=0.7).count()
    timings["mmr_rerank_2m_corpus"] = round(time.time() - t, 2)
    print(
        "mmr_rerank_2m_corpus", timings["mmr_rerank_2m_corpus"],
        "rows", n_mmr, flush=True,
    )
    # token-budget selection over the full n docs: quality-ordered
    # greedy keep under a 10%-of-corpus token budget via the two-level
    # distributed prefix sum (no single-task global window). Ride-along
    # checks: the kept token sum respects the budget, and no kept doc
    # could be swapped out for the budget to admit the best dropped doc
    # (checked coarsely: kept_tokens + min dropped doc > budget).
    from icnarc_to_philips_linkage_spark.operators.sampling import (
        select_token_budget,
    )

    docs_tb = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(900)) + 100).alias(
            "n_tokens"
        ),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(1_000_001))
         / 1_000_000.0).alias("p_quality"),
    )
    budget = int(n * 550 * 0.10)  # E[n_tokens] ≈ 549.5
    t = time.time()
    kept_tb = select_token_budget(docs_tb, budget)
    tb_row = kept_tb.agg(
        F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    timings["token_budget_select_full_table"] = round(time.time() - t, 2)
    print(
        "token_budget_select_full_table",
        timings["token_budget_select_full_table"],
        "kept_docs", tb_row.docs, "kept_tokens", tb_row.tok,
        "budget", budget, "within", bool(tb_row.tok <= budget),
        flush=True,
    )
    # quality-aware survivor selection over a 10M-row cluster frame
    # (clusters of 5): the argmax window partitions by cluster_id —
    # partition sizes are duplicate-group sizes, never corpus-scale.
    # Ride-along: exactly one keeper per cluster.
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        keep_best_per_cluster,
    )

    n_cl = min(n // 10, 10_000_000)
    cl = spark.range(n_cl).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 5).cast("long").alias("cluster_id"),
    )
    qual = spark.range(n_cl).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1_000_001))
         / 1_000_000.0).alias("p_quality"),
    )
    t = time.time()
    n_keep = (
        keep_best_per_cluster(cl, qual)
        .filter(F.col("keep"))
        .count()
    )
    timings["keep_best_10m_pairs"] = round(time.time() - t, 2)
    print(
        "keep_best_10m_pairs", timings["keep_best_10m_pairs"],
        "keepers", n_keep, "clusters", (n_cl + 4) // 5, flush=True,
    )

    # ---------------- round 8: vocab coverage, kappa, band stats,
    # matryoshka truncation

    # vocabulary coverage at 100M token occurrences (5M docs x 20
    # tokens, 200k distinct tokens, vocab = top 50k): the top-k is
    # TakeOrderedAndProject over the 200k-row count frame, the vocab
    # broadcasts back onto the exploded occurrence stream.
    from icnarc_to_philips_linkage_spark.operators.text import (
        vocab_coverage,
    )

    vdocs = spark.range(n // 20).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(20)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64("id", i), F.lit(200_000)),
                ),
            ),
        ).alias("text"),
        F.concat(
            F.lit("s"), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(4))
        ).alias("source"),
    )
    t = time.time()
    vc_rows = vocab_coverage(vdocs, vocab_k=50_000).collect()
    timings["vocab_coverage_100m_tokens"] = round(time.time() - t, 2)
    vc_tot = sum(r.total_tokens for r in vc_rows)
    print(
        "vocab_coverage_100m_tokens",
        timings["vocab_coverage_100m_tokens"],
        "sources", len(vc_rows), "total_tokens", vc_tot,
        "oov_rate_s0", [r.oov_rate for r in vc_rows if r.source == "s0"],
        flush=True,
    )

    # Cohen's kappa over the full 100M-row events frame: two
    # independent 5-class labelings -> kappa ~ 0; the printed exact
    # value doubles as a cross-run determinism check of the
    # decimal(38,0) arithmetic (n^2 = 1e16).
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        cohens_kappa,
    )

    lab = e.select(
        F.col("event_type").alias("a"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ("click", "view", "purchase", "error", "signup")]),
            (F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(5)) + 1)
            .cast("int"),
        ).alias("b"),
    )
    t = time.time()
    kp = cohens_kappa(lab, "a", "b").collect()[0]
    timings["cohens_kappa_100m_rows"] = round(time.time() - t, 2)
    print(
        "cohens_kappa_100m_rows", timings["cohens_kappa_100m_rows"],
        "n", kp.n, "kappa", kp.kappa, flush=True,
    )

    # LSH band tuning stats on the 50k-doc near-dup corpus (10x the
    # sf0.1 documents table): all four (b, r) splits of one persisted
    # signature, measured raw comparisons + distinct candidate pairs.
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        lsh_band_stats,
    )

    t = time.time()
    bs_rows = lsh_band_stats(
        sdocs, n=3, k=8, band_configs=(1, 2, 4, 8)
    ).collect()
    timings["lsh_band_stats_50k_docs"] = round(time.time() - t, 2)
    print(
        "lsh_band_stats_50k_docs", timings["lsh_band_stats_50k_docs"],
        {r.n_bands: (r.raw_comparisons, r.candidate_pairs)
         for r in bs_rows},
        flush=True,
    )

    # Matryoshka truncation recall at a 2M-vector dim-32 corpus
    # (130x the sf0.1 embeddings): ground truth once, two truncated
    # arms; the corpus streams three times, never shuffles.
    from icnarc_to_philips_linkage_spark.operators.similarity import (
        matryoshka_recall,
    )

    mvec = spark.range(2_000_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: (
                F.pmod(F.xxhash64("id", i), F.lit(2001)) - 1000
            ).cast("float") / 1000.0,
        ).alias("embedding"),
    )
    mq = mvec.filter(F.col("vec_id") < 10)
    t = time.time()
    mr = {
        r.trunc_dim: r.mean_recall
        for r in matryoshka_recall(
            mvec, mq, k=5, trunc_dims=(32, 8)
        ).collect()
    }
    timings["matryoshka_recall_2m_corpus"] = round(time.time() - t, 2)
    print(
        "matryoshka_recall_2m_corpus",
        timings["matryoshka_recall_2m_corpus"],
        "recall_full_dim", mr.get(32), "recall_dim8", mr.get(8),
        flush=True,
    )
    assert mr.get(32) == 1.0, mr


    # ---------------- round 8 session 2: holt, brier, kcenter, triangles

    # Holt forecast over the FULL event table: 100M rows collapse to
    # ~1.4k hourly buckets x 5 types before the fold — the register
    # shape (pre-aggregate, then a map-side struct fold).
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        holt_linear,
    )

    hourly = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) DIV 3600000000").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("nn"))
    t = time.time()
    hrows = holt_linear(hourly, "event_type", "hr", "nn").collect()
    timings["holt_forecast_100m_events"] = round(time.time() - t, 2)
    print(
        "holt_forecast_100m_events",
        timings["holt_forecast_100m_events"],
        "types", len(hrows),
        "forecast_click",
        [r.forecast for r in hrows if r.event_type == "click"],
        flush=True,
    )

    # Exact Brier over 100M scored rows: micro-unit integer squared
    # errors, decimal accumulation — the printed value is the
    # determinism ride-along.
    from icnarc_to_philips_linkage_spark.operators.evaluation import (
        brier_score,
    )

    scored_b = e.select(
        (F.pmod(F.xxhash64("event_id", F.lit(11)), F.lit(1_000_001))
         / 1_000_000.0).alias("p"),
        (F.pmod(F.xxhash64("event_id", F.lit(12)), F.lit(3)) < 1)
        .alias("y"),
    )
    t = time.time()
    br = brier_score(scored_b, "p", "y").collect()[0]
    timings["brier_100m_rows"] = round(time.time() - t, 2)
    print(
        "brier_100m_rows", timings["brier_100m_rows"],
        "n", br.n, "brier", br.brier, flush=True,
    )

    # k-center greedy over the 2M-vector corpus: 6 rounds, each a
    # map-only broadcast-center distance update + TakeOrdered argmax.
    from icnarc_to_philips_linkage_spark.operators.similarity import (
        kcenter_coreset,
    )

    t = time.time()
    kc = sorted(
        kcenter_coreset(mvec, k=6).collect(), key=lambda r: r.round
    )
    timings["kcenter_2m_corpus"] = round(time.time() - t, 2)
    radii = [r.dist_at_selection for r in kc[1:]]
    print(
        "kcenter_2m_corpus", timings["kcenter_2m_corpus"],
        "radii", radii, flush=True,
    )
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii

    # triangle census of a 10M-edge hash-random graph on 1M nodes
    # (avg degree 20): the degree-ordered orientation keeps the wedge
    # join bounded even with the heavy tail.
    from icnarc_to_philips_linkage_spark.operators.graph import (
        triangle_count,
    )

    tedges = spark.range(10_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(21)), F.lit(1_000_000))
        .cast("string").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(22)), F.lit(1_000_000))
        .cast("string").alias("dst"),
    )
    t = time.time()
    tr = triangle_count(tedges).collect()[0]
    timings["triangles_10m_edges"] = round(time.time() - t, 2)
    print(
        "triangles_10m_edges", timings["triangles_10m_edges"],
        "nodes", tr.n_nodes, "edges", tr.n_edges,
        "triangles", tr.n_triangles, "transitivity", tr.transitivity,
        flush=True,
    )

    print(
        json.dumps(
            {"n_rows": n, "gen_sec": gen_sec, "timings_sec": timings}
        )
    )
    shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
