"""Round-12 scale smokes (the round-10 pairing discipline: every new
operator ships a 100M-row smoke with a closed-form planted assertion).

- runs_seg: the r11 runs-test corpus (100M rows, 20 fat keys x 5M,
  flag alternates within every key => R = n_k EXACTLY) through the
  NEW skew-immune segmented path (segments=32) AND the default
  per-key-window path, timed side by side — the VERDICT r11 task-5
  adjudication. Identical closed-form result required from both.
- ngrams_approx: the r11 ngrams corpus (100M tokens: half template,
  half unique filler => every exact distinct count closed-form)
  through distinct_ngram_diversity_approx — totals must be EXACT,
  HLL++ estimates within 3x rsd of the closed form.

Run: python scale_smoke_r12.py   (SMOKE_ONLY=runs_seg,... selects a
subset).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def main() -> int:
    only = set(
        s for s in os.environ.get("SMOKE_ONLY", "").split(",") if s
    )

    def want(tag: str) -> bool:
        return not only or tag in only

    from icnarc_to_philips_linkage_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke-r12",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    n100 = 100_000_000

    from icnarc_to_philips_linkage_spark.operators import (
        profile as pr,
    )

    if want("runs_seg"):
        # flag alternates within every key => R = n EXACTLY per key
        rows = spark.range(n100).select(
            F.concat(
                F.lit("k"),
                F.pmod(F.col("id"), F.lit(20)).cast("string"),
            ).alias("k"),
            (F.col("id") / 20).cast("long").alias("t"),
            (F.pmod((F.col("id") / 20).cast("long"), F.lit(2)) == 0)
            .alias("x"),
        )
        nk = n100 // 20
        t = time.time()
        out = pr.runs_test(rows, "k", "t", "x", segments=32).collect()
        timings["runs_test_seg32_100m_rows"] = round(time.time() - t, 2)
        assert len(out) == 20
        for r in out:
            assert r.n == nk and r.n_runs == nk, r
        t = time.time()
        out2 = pr.runs_test(rows, "k", "t", "x").collect()
        timings["runs_test_default_100m_rows"] = round(
            time.time() - t, 2
        )
        assert sorted(
            (r.k, r.n, r.n_runs, r.z) for r in out
        ) == sorted((r.k, r.n, r.n_runs, r.z) for r in out2)
        print(
            "runs_test seg32",
            timings["runs_test_seg32_100m_rows"],
            "default",
            timings["runs_test_default_100m_rows"],
            "runs",
            out[0].n_runs,
            "expected",
            nk,
            flush=True,
        )

    if want("ngrams_approx"):
        # half the docs are ONE shared 10-token template, half are
        # all-unique fillers => every exact distinct count closed-form
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
            text as tx,
        )

        rsd = 0.02
        t = time.time()
        out = {
            r.n: r
            for r in tx.distinct_ngram_diversity_approx(
                docs, rsd=rsd
            ).collect()
        }
        timings["distinct_ngrams_approx_100m_tokens"] = round(
            time.time() - t, 2
        )
        uniq = n_docs // 2
        print(
            "distinct_ngrams_approx_100m_tokens",
            timings["distinct_ngrams_approx_100m_tokens"],
            "d1",
            out[1].distinct_ngrams_approx,
            "exact",
            tpd + uniq * tpd,
            flush=True,
        )
        for n in (1, 2, 3):
            span = tpd - n + 1
            exact = span + uniq * span
            assert out[n].total_ngrams == n_docs * span, out[n]
            got = out[n].distinct_ngrams_approx
            assert abs(got - exact) / exact <= 3 * rsd, (n, got, exact)

    print(json.dumps({"timings_sec": timings}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
