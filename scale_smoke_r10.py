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

Run: python scale_smoke_r10.py [n_docs_corpus_a]   (default 2.5M ->
100M tokens). SMOKE_ONLY=span,para,winnow,containment selects a subset.
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
    t0 = time.time()
    spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text")
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

    print(json.dumps({
        "n_docs_corpus_a": n_docs,
        "timings_sec": timings,
    }))
    shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
