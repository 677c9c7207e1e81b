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
- perm: 100M pairs, every d = +1 => T_obs = n exactly; no 64-bit md5
  sign band reaches |T_b| = n => p = 1/65 EXACT, mean_diff = 1.0.
- qr: 100M rows over 10 planted (x, y) cells — per-row quantized
  subgradient contributions are identical within a cell, so a pure-
  Python 10-cell replay reproduces the whole trajectory EXACTLY.
- hellinger: ref uniform over 10 buckets vs cur uniform over 5 =>
  BC = 5*sqrt(0.02) closed form (sqrt is exactly rounded).
- kendallw: the friedman corpus (identical within-block ordering) =>
  W = 1 EXACT, chi2 = 4n.
- na: 100M subjects / 365 durations — the 365-row exact-integer risk
  table makes a pure-Python sequential fold replay cum_hazard
  BIT-EXACTLY at every duration.
- gehan: even/odd cohorts share the duration distribution exactly =>
  every time's u = n*d1 - d*n1 = 0 => U = 0, z = 0 EXACT.

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

    if want("perm"):
        # every pair's d = +1 => T_obs = n on the 1e-6 grid; no md5
        # sign band can reach |T_b| = n => p = 1/65 EXACT, mean = 1.0
        from icnarc_to_philips_linkage_spark.operators import (
            evaluation as ev,
        )

        rows = spark.range(n100).select(
            F.col("id").cast("string").alias("k"),
            (F.col("id") % 7 + 1).cast("double").alias("b"),
            (F.col("id") % 7 + 2).cast("double").alias("a"),
        )
        t = time.time()
        r = ev.paired_permutation_test(
            rows, "a", "b", "k", n_resamples=64
        ).collect()[0]
        timings["perm_paired_100m_pairs"] = round(time.time() - t, 2)
        print(
            "perm_paired_100m_pairs",
            timings["perm_paired_100m_pairs"],
            "p", r.p_value, "mean", r.mean_diff, flush=True,
        )
        assert r.n_pairs == n100 and r.mean_diff == 1.0
        assert abs(r.p_value - 1.0 / 65.0) < 1e-9

    if want("qr"):
        # 10 planted (x, y) cells x 10M rows each: per-row quantized
        # contributions are identical within a cell, so the pure-
        # Python cell replay is EXACT for the whole 100M-row fit
        import math as m

        from icnarc_to_philips_linkage_spark.operators import (
            regression as rg,
        )

        rows = spark.range(n100).select(
            (F.pmod(F.col("id"), F.lit(10)) / 10.0).alias("x"),
            (F.pmod(F.col("id"), F.lit(10)) / 10.0).alias("y"),
        )
        tau, lr, iters = 0.75, 0.5, 8
        t = time.time()
        got = rg.quantile_gd_train_trajectory(
            rows, ["x"], "y", tau=tau, lr=lr, iters=iters
        )
        timings["quantile_gd_100m_rows"] = round(time.time() - t, 2)
        cells = [(v / 10.0, v / 10.0, n100 // 10) for v in range(10)]
        w = [0.0, 0.0]
        want_traj = []
        for _ in range(iters):
            sums = [0, 0]
            n = 0
            for x, y, cnt in cells:
                z = w[0] * 1.0 + w[1] * x
                resid = (1.0 if y < z else 0.0) - tau
                for j, xj in enumerate((1.0, x)):
                    v = resid * xj
                    q = 0 if v == 0 else (
                        (1 if v > 0 else -1)
                        * m.floor(abs(v) * 1e12 + 0.5)
                    )
                    sums[j] += cnt * int(q)
                n += cnt
            w = [
                w[j] - lr * (float(sums[j]) / 1e12) / n
                for j in range(2)
            ]
            want_traj.append(list(w))
        print(
            "quantile_gd_100m_rows",
            timings["quantile_gd_100m_rows"],
            "w", got[-1], flush=True,
        )
        assert got == want_traj

    if want("hellinger"):
        # ref uniform over buckets 0-9, cur uniform over 0-4 =>
        # BC = 5*sqrt(0.1*0.2) EXACT closed form
        import math as m

        from icnarc_to_philips_linkage_spark.operators import (
            drift as dr,
        )

        rows = spark.range(n100).select(
            (F.pmod(F.col("id"), F.lit(2)) == 0).alias("ref"),
            F.when(
                F.pmod(F.col("id"), F.lit(2)) == 0,
                F.pmod(F.col("id") / 2, F.lit(10)) + 0.5,
            )
            .otherwise(F.pmod(F.col("id") / 2, F.lit(5)) + 0.5)
            .alias("v"),
        )
        t = time.time()
        r = dr.hellinger_distance(
            rows, F.col("ref"), "v", lo=0.0, hi=10.0, bins=10
        ).collect()[0]
        timings["hellinger_100m_rows"] = round(time.time() - t, 2)
        bc = 5.0 * m.sqrt(0.1 * 0.2)
        print(
            "hellinger_100m_rows", timings["hellinger_100m_rows"],
            "bc", r.bhattacharyya, "expected", bc, flush=True,
        )
        assert abs(r.bhattacharyya - bc) < 1e-9
        assert abs(r.hellinger - m.sqrt(1.0 - bc)) < 1e-9

    if want("kendallw"):
        # the friedman corpus (identical within-block ordering) =>
        # perfect concordance: W = 1 EXACT, chi2 = 4n
        rows = spark.range(n100).select(
            (F.col("id") / 5).cast("long").alias("b"),
            F.concat(
                F.lit("t"), F.pmod(F.col("id"), F.lit(5)).cast("string")
            ).alias("t"),
            F.pmod(F.col("id"), F.lit(5)).cast("double").alias("v"),
        )
        t = time.time()
        r = pr.kendall_w(rows, "b", "t", "v").collect()[0]
        timings["kendall_w_100m_cells"] = round(time.time() - t, 2)
        print(
            "kendall_w_100m_cells", timings["kendall_w_100m_cells"],
            "W", r.w, "chi2", r.chi2_f, flush=True,
        )
        assert r.w == 1.0 and r.chi2_f == 4.0 * (n100 // 5)

    if want("na"):
        # 100M subjects over 365 duration days, all observed: the
        # 365-row risk table is exact integers, so a pure-Python
        # sequential fold over it replays cum_hazard BIT-EXACTLY
        from icnarc_to_philips_linkage_spark.operators import (
            timeseries as tso,
        )

        rows = spark.range(n100).select(
            (F.pmod(F.col("id"), F.lit(365)) + 1).alias("duration"),
            F.lit(1).alias("observed"),
        )
        t = time.time()
        out = sorted(
            tso.nelson_aalen(rows, "duration", "observed").collect(),
            key=lambda r: r.duration,
        )
        timings["nelson_aalen_100m_subjects"] = round(time.time() - t, 2)
        counts = [
            n100 // 365 + (1 if d <= n100 % 365 else 0)
            for d in range(1, 366)
        ]
        n_risk = sum(counts)
        h = 0.0
        for i, r in enumerate(out):
            assert r.n_events == counts[i] and r.n_risk == n_risk
            h = h + float(counts[i]) / float(n_risk)
            assert r.cum_hazard == h, (r.duration, r.cum_hazard, h)
            n_risk -= counts[i]
        print(
            "nelson_aalen_100m_subjects",
            timings["nelson_aalen_100m_subjects"],
            "H(365)", out[-1].cum_hazard, flush=True,
        )

    if want("gehan"):
        # even/odd groups share the duration distribution EXACTLY =>
        # every time's u = n*d1 - d*n1 = 0 => U = 0, z = 0
        from icnarc_to_philips_linkage_spark.operators import (
            timeseries as tso,
        )

        rows = spark.range(n100).select(
            F.col("id").alias("subj"),
            ((F.col("id") / 2).cast("long") % 365 + 1).alias("duration"),
            F.lit(1).alias("observed"),
        )
        t = time.time()
        r = tso.logrank_test(
            rows, "duration", "observed",
            F.col("subj") % 2 == 0, weight="gehan",
        ).collect()[0]
        timings["logrank_gehan_100m_subjects"] = round(
            time.time() - t, 2
        )
        print(
            "logrank_gehan_100m_subjects",
            timings["logrank_gehan_100m_subjects"],
            "U", r.u_g, "z", r.z, flush=True,
        )
        assert r.n_subjects == n100 and r.u_g == 0.0 and r.z == 0.0

    print(json.dumps({"timings_sec": timings}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
