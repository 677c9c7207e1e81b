"""Regenerate PLANS.md: execute each flagship query at sf0.001 and
capture its AQE-final physical plan. Run: python tools/gen_plans.py
(rewrites PLANS.md in place; section commentary lives here so the doc
stays in sync with the plans)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS: list[tuple[str, str]] = [
    (
        "q1_pricing_summary",
        "One codegen'd scan+partial-agg stage, one exchange, final agg. "
        "Decimal sums inside the hash aggregate.",
    ),
    (
        "j8_star_3way",
        "Dim⋈fact⋈dim chain: both dimension sides broadcast; the fact "
        "table streams and never shuffles.",
    ),
    (
        "j4_cohort_semi",
        "Cohort restriction plans as a broadcast left-semi join — the "
        "events side streams.",
    ),
    (
        "o2_top_k",
        "TOP 100 ORDER BY plans as TakeOrderedAndProject — per-partition "
        "top-k then merge, no global sort.",
    ),
    (
        "ts_asof_join",
        "Union-and-window as-of join: both sides project to a common "
        "shape, union, ONE exchange on the key, one running-frame window "
        "pass. No range-join explosion.",
    ),
    (
        "dedup_minhash_lsh",
        "Array-set formulation: shingle sets and the k MinHash mins are "
        "pure projections (array_min over transform — no per-doc "
        "aggregate); band unpivot feeds the candidate equi-join "
        "(broadcast at this SF, shuffle-on-(band, hash) at scale); the "
        "only corpus-keyed exchange left is the candidate-pair DISTINCT, "
        "and Jaccard verification intersects the two cached shingle "
        "arrays per candidate pair.",
    ),
    (
        "ts_interval_join",
        "Point-in-interval range join: intervals explode to the coarse "
        "time buckets they cover, points map to one bucket each, and "
        "containment runs as a shuffled equi-join on (bucket, key) plus "
        "an exact filter — no BroadcastNestedLoopJoin, no "
        "CartesianProduct anywhere in the plan.",
    ),
    (
        "decontam_report",
        "Benchmark decontamination: both sides reduce to distinct "
        "13-gram sets map-side; the benchmark gram set broadcasts, so "
        "the training side never shuffles before the overlap join — "
        "only the per-doc count aggregate exchanges.",
    ),
    (
        "eval_roc_auc",
        "Exact tie-aware ROC AUC: the corpus collapses to per-distinct-"
        "score (count, positives) pairs in ONE hash aggregate; the "
        "cumulative rank window and the final 1-row reduction run over "
        "the score-grid-bounded frame (≤ 1e6+1 rows at 6dp), so the "
        "corpus is scanned once and never sorted.",
    ),
    (
        "dedup_incremental",
        "Incremental ingest with Bloom prefilter: a bitmap built over "
        "the incoming batch's digests (DataFrame aggregates only) is "
        "broadcast and prunes the existing-corpus side BEFORE the anti "
        "join's exchange; the anti join stays the exact confirmation, "
        "and the within-batch keeper aggregate reuses the join's digest "
        "partitioning — no third exchange.",
    ),
    (
        "ts_resample_interp",
        "Segment formulation: one scan of events, one (key, bucket) hash "
        "aggregate, ONE sort for the lead() window, then "
        "explode(sequence(bucket, next_bucket - step)) emits each "
        "bucket's grid slice with the interpolation neighbors already on "
        "the row — no spans re-aggregation, no grid-to-observation join, "
        "no descending second window pass.",
    ),
    (
        "sim_pq_index_probe",
        "Persisted IVF-PQ probe: codebooks and cell centroids load from "
        "their tiny side tables (no training in the plan), queries "
        "route against the broadcast centroid frame, and the "
        "cell-bucketed codes table streams from its buckets into a "
        "broadcast hash join with the routed queries — the corpus side "
        "never hash-partitions.",
    ),
    (
        "web_url_canonicalize",
        "URL canonicalization is one codegen projection over the scan — "
        "the entire regexp/array normalization chain fuses into the "
        "file-scan stage; zero exchanges.",
    ),
    (
        "text_vocab_coverage",
        "Vocabulary build is TakeOrderedAndProject over the token counts "
        "(per-partition top-k, merge on the driver side of the take — "
        "never a global sort); the k-row vocab BROADCASTS back onto the "
        "exploded token stream for the coverage aggregation.",
    ),
    (
        "quality_gopher_rules",
        "All seven Gopher-style rules fuse into the scan projection (one "
        "tokenization, one line split, zero UDFs); the only exchange is "
        "the final per-source aggregation.",
    ),
    (
        "graph_knn_triangles",
        "Triangle census: degrees join back onto the undirected edge "
        "set, the wedge self-join keys on the ORIENTED source (each "
        "wedge rooted at its min-(degree, node) corner), and the "
        "closing membership check is one more hash join — every "
        "exchange keys on node ids, no wedge ever materializes twice.",
    ),
    (
        "sim_kcenter_coreset",
        "k-center greedy: each round is a map-only broadcast-center "
        "distance projection (crossJoin with a 1-row frame, least() "
        "fold into the running min-dist column) + a limit-1 TakeOrdered "
        "argmax; the localCheckpoint per round pins lineage so the "
        "final plan is k-bounded, not 2^k.",
    ),
    (
        "dedup_span_removal",
        "Lee-et-al. span removal: the positional gram table is the only "
        "corpus-sized intermediate; keeper selection is one md5-uniform "
        "groupBy(gram) with map-side partial agg; coverage explodes "
        "map-side (×n, duplicates only) and the final cut is ONE "
        "doc-grain equi-join + higher-order filter — the token stream "
        "itself never rides a collect_list.",
    ),
    (
        "text_bpe_encode",
        "Trained-merge application: the merge folds run over the "
        "DISTINCT-WORD vocabulary only (localCheckpointed every 3 "
        "merges to bound expression depth); the corpus pays one "
        "BroadcastHashJoin of the encoded vocabulary onto its word "
        "stream plus a doc-grain reassembly aggregate.",
    ),
    (
        "dedup_winnow_overlap",
        "Winnowing: fingerprint selection (per-window rightmost-min "
        "folds) is entirely inside the scan-stage projection — zero "
        "exchanges before the winnowed ~2/(w+1)-density stream; the "
        "only shuffles are the hash-grain distinct-doc count and the "
        "left-semi join back.",
    ),
    (
        "sample_moore_lewis",
        "Cross-entropy difference selection: ONE gram explode feeds "
        "both LMs (the in-domain model is a conditional sum inside the "
        "same alphabet-bounded aggregate); both models broadcast; "
        "scoring is one broadcast join + per-doc weighted mean.",
    ),
    (
        "ml_gd_cartography",
        "Dataset cartography: all five trajectory snapshots are plan "
        "LITERALS, so per-example confidence/variability over five "
        "sigmoids is one codegen'd projection — the whole query is one "
        "corpus scan plus a single (bucket, y)-bounded aggregation "
        "exchange.",
    ),
    (
        "ml_gd_conformal",
        "Split conformal: the calibration quantile comes from the "
        "rounded-score-grain frame (bounded by the feature grid) via "
        "one ordered pass; q-hat rides back as a broadcast 1-row frame "
        "and coverage is one conditional aggregation — no corpus joins.",
    ),
    (
        "graph_ra_links",
        "Resource-allocation link prediction: wedge join on the kNN "
        "edge frame's shared-target key, in-degree weights broadcast, "
        "known-adjacent pairs leave via anti-join, final selection is "
        "TakeOrderedAndProject. Hub targets excluded up front bound "
        "the wedge fanout.",
    ),
    (
        "retrieval_rocchio_prf",
        "Two-pass PRF: pass 1 is the literal-folded BM25 (no postings "
        "shuffle); expansion statistics are one vocabulary-bounded "
        "(doc, term) aggregation with the feedback slice broadcast; "
        "pass 2 joins the postings grain against the <=8-term weighted "
        "query broadcast. Score sums are exact 2e6-grid integers.",
    ),
    (
        "sim_margin_bitext",
        "Ratio-margin bitext mining: the query slice broadcasts onto "
        "the corpus ONCE; both sides' kNN averages aggregate that same "
        "pair frame (integer micro-unit sums); the margin projection "
        "and per-query top-m reuse the two-level topk merge — no "
        "second corpus pass.",
    ),
    (
        "fuzzy_fs_em",
        "Fellegi-Sunter EM: the pair corpus collapses to 2^K pattern "
        "counts in one aggregation (supplier side broadcasts into the "
        "blocked join); ten EM iterations are driver expressions — "
        "nothing else touches the data.",
    ),
    (
        "eval_auc_bootstrap",
        "Poisson-bootstrap AUC: per-row md5 replication weights, 21 "
        "rank sums (point + 20 resamples) in ONE bounded score-grain "
        "pass — the same plan shape as a single AUC.",
    ),
    (
        "emb_pca_power",
        "Power iteration: each of the 4 iterations is one literal-"
        "direction projection + one 64-decimal map-combined "
        "aggregation; the output frame is dim driver literals.",
    ),
]

SF = "/root/testdata/sf0.001"
MAX_LINES = 60
MAX_WIDTH = 200


HAND_MARKER = "<!-- hand-authored sections below: preserved by gen_plans.py -->"


def main() -> int:
    from icnarc_to_philips_linkage_spark.plans.registry import all_queries
    from icnarc_to_philips_linkage_spark.session import get_spark

    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out = [
        "# PLANS — final physical plans of flagship queries (sf0.001, "
        "post-AQE where executed)",
        "",
        "Regenerate: `python tools/gen_plans.py` — pasted from Spark's "
        "executedPlan after a full collect (AQE-final).",
    ]
    for name, blurb in SECTIONS:
        fn, _ = queries[name]
        df = fn(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = []
        for line in plan.splitlines():
            if "== Initial Plan ==" in line:
                break
            lines.append(line[:MAX_WIDTH])
            if len(lines) >= MAX_LINES:
                break
        out += ["", f"## {name}", "", blurb, "", "```", *lines, "```"]
        spark.catalog.clearCache()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "PLANS.md")
    # PLANS.md also carries hand-authored sections (streaming shapes,
    # round notes) the generator does not know about — everything from
    # the marker down survives regeneration verbatim
    tail = ""
    if os.path.exists(path):
        prev = open(path).read()
        if HAND_MARKER in prev:
            tail = prev[prev.index(HAND_MARKER):]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
        if tail:
            f.write("\n" + tail)
    print(f"PLANS.md regenerated: {len(SECTIONS)} sections"
          + (" (+ hand-authored tail preserved)" if tail else ""))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
