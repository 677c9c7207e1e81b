"""Round-12 batch-2 scale smokes (the round-10 pairing discipline:
every new operator ships a 100M-row smoke with a closed-form planted
assertion).

- jb: 4 groups x 25M, values cycling {1..5} exactly 5M each => all
  power sums exact in doubles, skewness = 0 EXACTLY, excess kurtosis
  = 6.8/4 - 3 = -1.3, JB = n/6 * (1.69/4) (pure-Python replay).
- bartlett: 50M cycling {1,2,3,4,5} vs 50M cycling {2,4,6,8,10} =>
  exact integer power sums; T replayed in pure Python floats.
- cohd: 50M cycling {1,3} vs 50M cycling {2,6} => means 2/4, sample
  variances n/(n-1) and 4n/(n-1); d replayed in pure Python.
- ad: both samples draw the SAME 100-value grid with equal counts =>
  every pooled-cell gap D = 0 => A^2 = 0 EXACTLY.
- dw: 20 keys x 5M, values alternating 1,5 in time order =>
  DW = 4(n-1)/n per key (exact integer quadratic forms).
- pettitt: 20 keys x 5M, level shift 0->1 at the midpoint h =>
  U_t = -t*h for t <= h => K = h^2 EXACTLY at t_split = h, p = 0.
- harrell: 1000 day cells x 100k subjects, all events observed,
  score = 999 - day => every comparable pair concordant => C = 1,
  n_comparable = C(1000,2) * 1e10 EXACTLY.
- ccc: y = x => CCC = 1 and r = 1 EXACTLY; y = x + 1 => CCC =
  2*vx2/(2*vx2 + n^2) (pure-Python replay on exact integers).
- cronbach: 20M units x 5 items, every item score = unit mod 10 =>
  item variances sum to exactly 1/5 of the total => alpha = 1.

Run: python scale_smoke_r12b.py   (SMOKE_ONLY=jb,... selects a
subset).
"""

from __future__ import annotations

import json
import math
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
        app_name="scale-smoke-r12b",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    n100 = 100_000_000

    from icnarc_to_philips_linkage_spark.operators import (
        profile as pr,
    )
    from icnarc_to_philips_linkage_spark.operators import (
        evaluation as ev,
    )
    from icnarc_to_philips_linkage_spark.operators import (
        timeseries as ts,
    )

    if want("jb"):
        # group g = id%4, value cycles {1..5} within each group =>
        # every group holds exactly 5M of each value
        rows = spark.range(n100).select(
            F.pmod(F.col("id"), F.lit(4)).cast("int").alias("g"),
            (
                F.pmod((F.col("id") / 4).cast("long"), F.lit(5)) + 1
            ).alias("v"),
        )
        t = time.time()
        out = pr.jarque_bera(rows, "g", "v").collect()
        timings["jarque_bera_100m_rows"] = round(time.time() - t, 2)
        n = n100 // 4
        jb = n / 6.0 * (0.0 + (6.8 / 4.0 - 3.0) ** 2 / 4.0)
        exp_jb = math.floor(jb * 1e6 + 0.5) / 1e6
        assert len(out) == 4
        for r in out:
            assert r.n == n and r.skewness == 0.0, r
            assert r.excess_kurtosis == -1.3, r
            assert abs(r.jb_stat - exp_jb) < 1e-4, (r.jb_stat, exp_jb)
            assert r.p_value == 0.0, r
        print(
            "jarque_bera_100m_rows",
            timings["jarque_bera_100m_rows"],
            "jb", out[0].jb_stat, "expected", exp_jb, flush=True,
        )

    if want("bartlett"):
        # group a cycles {1,2,3,4,5}; group b cycles {2,4,6,8,10}
        half = n100 // 2
        is_a = F.pmod(F.col("id"), F.lit(2)) == 0
        base_v = F.pmod((F.col("id") / 2).cast("long"), F.lit(5)) + 1
        rows = spark.range(n100).select(
            F.when(is_a, F.lit("a")).otherwise(F.lit("b")).alias("g"),
            F.when(is_a, base_v).otherwise(base_v * 2).alias("v"),
        )
        t = time.time()
        r = pr.bartlett_test(rows, "g", "v").collect()[0]
        timings["bartlett_100m_rows"] = round(time.time() - t, 2)
        # pure-Python replay on the exact integer sums
        ni = float(half)
        cyc = [1, 2, 3, 4, 5]
        exp_t = None
        qss = qln = qinv = 0
        for mult in (1, 2):
            s1 = ni / 5 * sum(v * mult for v in cyc)
            s2 = ni / 5 * sum((v * mult) ** 2 for v in cyc)
            var = (ni * s2 - s1 * s1) / (ni * (ni - 1.0))
            qss += math.floor((ni - 1.0) * var * 1e9 + 0.5)
            qln += math.floor((ni - 1.0) * math.log(var) * 1e9 + 0.5)
            qinv += math.floor(1.0 / (ni - 1.0) * 1e9 + 0.5)
        nn, kk = float(n100), 2.0
        pooled = (qss / 1e9) / (nn - kk)
        num = (nn - kk) * math.log(pooled) - qln / 1e9
        corr = 1.0 + (qinv / 1e9 - 1.0 / (nn - kk)) / (3.0 * (kk - 1.0))
        exp_t = math.floor(num / corr * 1e6 + 0.5) / 1e6
        assert r.k == 2 and r.n == n100 and r.dof == 1
        assert abs(r.t_stat - exp_t) < 1e-3, (r.t_stat, exp_t)
        print(
            "bartlett_100m_rows", timings["bartlett_100m_rows"],
            "T", r.t_stat, "expected", exp_t, flush=True,
        )

    if want("cohd"):
        # a cycles {1,3} (mean 2), b cycles {2,6} (mean 4)
        half = n100 // 2
        is_a = F.pmod(F.col("id"), F.lit(2)) == 0
        odd = F.pmod((F.col("id") / 2).cast("long"), F.lit(2))
        rows = spark.range(n100).select(
            F.when(is_a, F.lit("a")).otherwise(F.lit("b")).alias("g"),
            F.when(is_a, 1 + 2 * odd).otherwise(2 + 4 * odd).alias(
                "v"
            ),
        )
        t = time.time()
        r = pr.cohens_d(rows, "g", "v", "a", "b").collect()[0]
        timings["cohens_d_100m_rows"] = round(time.time() - t, 2)
        na = float(half)
        va = (na * (half / 2 * (1 + 9)) - (half * 2.0) ** 2) / (
            na * (na - 1.0)
        )
        vb = (na * (half / 2 * (4 + 36)) - (half * 4.0) ** 2) / (
            na * (na - 1.0)
        )
        dof = na + na - 2.0
        pooled = math.sqrt(((na - 1.0) * va + (na - 1.0) * vb) / dof)
        exp_d = math.floor((2.0 - 4.0) / pooled * 1e6 + 0.5) / 1e6
        assert r.n_a == half and r.n_b == half
        assert r.mean_a == 2.0 and r.mean_b == 4.0
        assert abs(r.d - exp_d) < 1e-5, (r.d, exp_d)
        print(
            "cohens_d_100m_rows", timings["cohens_d_100m_rows"],
            "d", r.d, "expected", exp_d, flush=True,
        )

    if want("ad"):
        # identical distributions: every pooled-cell gap D = 0
        rows = spark.range(n100).select(
            F.when(
                F.pmod(F.col("id"), F.lit(2)) == 0, F.lit("A")
            )
            .otherwise(F.lit("B"))
            .alias("g"),
            F.pmod((F.col("id") / 2).cast("long"), F.lit(100)).alias(
                "v"
            ),
        )
        t = time.time()
        r = pr.ad_two_sample_exact(rows, "g", "v", "A", "B").collect()[
            0
        ]
        timings["ad_two_sample_100m_rows"] = round(time.time() - t, 2)
        assert r.n_a == n100 // 2 and r.n_b == n100 // 2
        assert r.a2_stat == 0.0, r
        print(
            "ad_two_sample_100m_rows",
            timings["ad_two_sample_100m_rows"],
            "A2", r.a2_stat, flush=True,
        )

    if want("dw"):
        # 20 keys x 5M, values alternate 1,5 => DW = 4(n-1)/n
        rows = spark.range(n100).select(
            F.concat(
                F.lit("k"),
                F.pmod(F.col("id"), F.lit(20)).cast("string"),
            ).alias("k"),
            (F.col("id") / 20).cast("long").alias("t"),
            (
                1
                + 4
                * F.pmod((F.col("id") / 20).cast("long"), F.lit(2))
            ).alias("v"),
        )
        nk = n100 // 20
        t = time.time()
        out = ts.durbin_watson(rows, "k", ["t"], "v").collect()
        timings["durbin_watson_100m_rows"] = round(time.time() - t, 2)
        exp = (
            math.floor(
                float(nk)
                * (16.0 * (nk - 1))
                / float(4 * nk * nk)
                * 1e6
                + 0.5
            )
            / 1e6
        )
        assert len(out) == 20
        for r in out:
            assert r.n == nk and r.dw_stat == exp, (r, exp)
        print(
            "durbin_watson_100m_rows",
            timings["durbin_watson_100m_rows"],
            "dw", out[0].dw_stat, "expected", exp, flush=True,
        )

    if want("pettitt"):
        # level shift 0 -> 1 at the key midpoint h => K = h^2 at t=h
        rows = spark.range(n100).select(
            F.concat(
                F.lit("k"),
                F.pmod(F.col("id"), F.lit(20)).cast("string"),
            ).alias("k"),
            (F.col("id") / 20).cast("long").alias("t"),
            (
                (F.col("id") / 20).cast("long")
                >= F.lit(n100 // 40)
            )
            .cast("double")
            .alias("v"),
        )
        nk, h = n100 // 20, n100 // 40
        t = time.time()
        out = ts.pettitt_test(rows, "k", ["t"], "v").collect()
        timings["pettitt_100m_rows"] = round(time.time() - t, 2)
        assert len(out) == 20
        for r in out:
            assert r.n == nk and r.k_stat == float(h) * h, r
            assert r.t_split == h and r.p_value == 0.0, r
        print(
            "pettitt_100m_rows", timings["pettitt_100m_rows"],
            "K", out[0].k_stat, "expected", float(h) * h, flush=True,
        )

    if want("harrell"):
        # 1000 day cells x 100k subjects, all observed, score=999-day
        # => every comparable pair concordant => C = 1
        rows = spark.range(n100).select(
            F.pmod(F.col("id"), F.lit(1000)).alias("t"),
            F.lit(1).alias("e"),
            (999 - F.pmod(F.col("id"), F.lit(1000))).alias("s"),
        )
        t = time.time()
        r = ts.harrell_c_index(rows, "t", "e", "s").collect()[0]
        timings["harrell_c_100m_rows"] = round(time.time() - t, 2)
        cell = n100 // 1000
        exp_pairs = 1000 * 999 // 2 * cell * cell
        assert r.n_comparable == exp_pairs, (r, exp_pairs)
        assert r.n_concordant == exp_pairs and r.c_index == 1.0
        print(
            "harrell_c_100m_rows", timings["harrell_c_100m_rows"],
            "pairs", r.n_comparable, "C", r.c_index, flush=True,
        )

    if want("ccc"):
        # y = x + 1: location shift only => CCC = 2v/(2v + n^2) with
        # v = n*Sxx - Sx^2 on the exact integer grid (python replay);
        # pearson r stays exactly 1
        rows = spark.range(n100).select(
            F.pmod(F.col("id"), F.lit(100)).alias("x"),
            (F.pmod(F.col("id"), F.lit(100)) + 1).alias("y"),
        )
        t = time.time()
        r = ev.lin_ccc(rows, "x", "y").collect()[0]
        timings["lin_ccc_100m_rows"] = round(time.time() - t, 2)
        cnt = n100 // 100
        sx = cnt * sum(range(100))
        sxx = cnt * sum(v * v for v in range(100))
        vx2 = float(n100) * sxx - float(sx) * sx
        exp_ccc = (
            math.floor(
                2.0 * vx2 / (vx2 + vx2 + float(n100) * n100) * 1e6
                + 0.5
            )
            / 1e6
        )
        assert r.n == n100 and r.pearson_r == 1.0
        assert abs(r.ccc - exp_ccc) < 1e-5, (r.ccc, exp_ccc)
        print(
            "lin_ccc_100m_rows", timings["lin_ccc_100m_rows"],
            "ccc", r.ccc, "expected", exp_ccc, flush=True,
        )

    if want("cronbach"):
        # 20M units x 5 items, every item score = unit % 10 => the
        # battery is perfectly consistent => alpha = 1 EXACTLY
        units = n100 // 5
        rows = spark.range(n100).select(
            (F.col("id") / 5).cast("long").alias("u"),
            F.pmod(F.col("id"), F.lit(5)).cast("string").alias("i"),
            F.pmod((F.col("id") / 5).cast("long"), F.lit(10)).alias(
                "v"
            ),
        )
        t = time.time()
        r = ev.cronbach_alpha(rows, "u", "i", "v").collect()[0]
        timings["cronbach_100m_rows"] = round(time.time() - t, 2)
        assert r.k == 5 and r.n_units == units, r
        assert r.alpha == 1.0, r
        print(
            "cronbach_100m_rows", timings["cronbach_100m_rows"],
            "alpha", r.alpha, flush=True,
        )


    if want("granger"):
        # 1M-step series on the op's DRIVER-BOUNDED rollup grain
        # (the input contract is a pre-aggregated time grid): y has
        # period 4, x period 2 => every cross-moment is a closed-form
        # periodic sum, replayed in pure Python below
        n_steps = 1_000_000
        rows = spark.range(n_steps).select(
            F.col("id").alias("t"),
            (F.pmod(F.col("id"), F.lit(4)) >= 2)
            .cast("long")
            .alias("y"),
            F.pmod(F.col("id"), F.lit(2)).alias("x"),
        )
        t = time.time()
        r = ts.granger_lag1(rows, "t", "y", "x").collect()[0]
        timings["granger_1m_steps"] = round(time.time() - t, 2)
        ys = [1 if (t_ % 4) >= 2 else 0 for t_ in range(n_steps)]
        xs = [t_ % 2 for t_ in range(n_steps)]
        import sys as _sys

        _sys.path.insert(0, "tests")
        from test_round12b_ops import _granger_replay

        want_r = _granger_replay(ys, xs)
        assert r.n == want_r["n"]
        for kf in ("b_y1", "b_x1", "rss_r", "rss_u", "f_stat"):
            got, exp = getattr(r, kf), want_r[kf]
            assert abs(got - exp) < 1e-4, (kf, got, exp)
        print(
            "granger_1m_steps", timings["granger_1m_steps"],
            "F", r.f_stat, "expected", want_r["f_stat"], flush=True,
        )

    if want("icc"):
        # 20M units x 5 items, identical scores within a unit =>
        # SSW = 0 => ICC = 1 EXACTLY
        units = n100 // 5
        rows = spark.range(n100).select(
            (F.col("id") / 5).cast("long").alias("u"),
            F.pmod(F.col("id"), F.lit(5)).cast("string").alias("i"),
            F.pmod((F.col("id") / 5).cast("long"), F.lit(10)).alias(
                "v"
            ),
        )
        t = time.time()
        r = ev.icc_oneway(rows, "u", "i", "v").collect()[0]
        timings["icc_100m_rows"] = round(time.time() - t, 2)
        assert r.k == 5 and r.n_units == units, r
        assert r.msw == 0.0 and r.icc == 1.0, r
        print(
            "icc_100m_rows", timings["icc_100m_rows"],
            "icc", r.icc, flush=True,
        )


    if want("ansari"):
        # identical distributions with equal per-cell counts =>
        # AB = TS/2 EXACTLY (each cell's a-count is half its l),
        # z = 0, p = 1
        rows = spark.range(n100).select(
            F.when(
                F.pmod(F.col("id"), F.lit(2)) == 0, F.lit("A")
            )
            .otherwise(F.lit("B"))
            .alias("g"),
            F.pmod((F.col("id") / 2).cast("long"), F.lit(100)).alias(
                "v"
            ),
        )
        t = time.time()
        r = pr.ansari_bradley(rows, "g", "v", "A", "B").collect()[0]
        timings["ansari_100m_rows"] = round(time.time() - t, 2)
        ts_total = n100 * (n100 + 2) // 4
        assert r.ab_stat == ts_total / 2.0, (r.ab_stat, ts_total / 2.0)
        assert r.z == 0.0 and r.p_value == 1.0, r
        print(
            "ansari_100m_rows", timings["ansari_100m_rows"],
            "AB", r.ab_stat, "z", r.z, flush=True,
        )


    if want("lepage"):
        # identical distributions, equal per-cell counts => R_A at
        # its null expectation AND AB = TS/2 => z_W = z_AB = 0,
        # L = 0, p = 1 EXACTLY
        rows = spark.range(n100).select(
            F.when(
                F.pmod(F.col("id"), F.lit(2)) == 0, F.lit("A")
            )
            .otherwise(F.lit("B"))
            .alias("g"),
            F.pmod((F.col("id") / 2).cast("long"), F.lit(100)).alias(
                "v"
            ),
        )
        t = time.time()
        r = pr.lepage_test(rows, "g", "v", "A", "B").collect()[0]
        timings["lepage_100m_rows"] = round(time.time() - t, 2)
        assert r.z_w == 0.0 and r.z_ab == 0.0, r
        assert r.l_stat == 0.0 and r.p_value == 1.0, r
        print(
            "lepage_100m_rows", timings["lepage_100m_rows"],
            "L", r.l_stat, flush=True,
        )

    if want("cucconi"):
        # same planted grid; U/V/C replayed on the 100-cell grid in
        # pure Python (the grid is bounded, the corpus is not)
        rows = spark.range(n100).select(
            F.when(
                F.pmod(F.col("id"), F.lit(2)) == 0, F.lit("A")
            )
            .otherwise(F.lit("B"))
            .alias("g"),
            F.pmod((F.col("id") / 2).cast("long"), F.lit(100)).alias(
                "v"
            ),
        )
        t = time.time()
        r = pr.cucconi_test(rows, "g", "v", "A", "B").collect()[0]
        timings["cucconi_100m_rows"] = round(time.time() - t, 2)
        half = n100 // 2
        per = half // 100  # per-cell count per group
        m_f, n_f, nd = float(half), float(half), float(n100)
        s1b = s2b = 0
        cum = 0
        for j in range(100):
            l = 2 * per
            cum += l
            r2 = 2 * cum - l + 1
            s1b += per * r2
            s2b += per * r2 * r2
        srb = float(s2b) / 4.0
        srtb = (
            (2.0 * (nd + 1.0)) * (2.0 * (nd + 1.0)) * n_f
            - 4.0 * (nd + 1.0) * float(s1b)
            + float(s2b)
        ) / 4.0
        den = math.sqrt(
            m_f * n_f * (nd + 1.0) * (2.0 * nd + 1.0)
            * (8.0 * nd + 11.0) / 5.0
        )
        mu = n_f * (nd + 1.0) * (2.0 * nd + 1.0)
        uu = (6.0 * srb - mu) / den
        vv = (6.0 * srtb - mu) / den
        rho = 2.0 * (nd * nd - 4.0) / (
            (2.0 * nd + 1.0) * (8.0 * nd + 11.0)
        ) - 1.0
        cc = (uu * uu + vv * vv - 2.0 * rho * uu * vv) / (
            2.0 * (1.0 - rho * rho)
        )
        assert abs(r.u - uu) < 1e-5 and abs(r.v - vv) < 1e-5, r
        assert abs(r.c_stat - cc) < 1e-4, (r.c_stat, cc)
        print(
            "cucconi_100m_rows", timings["cucconi_100m_rows"],
            "C", r.c_stat, "expected", round(cc, 6), flush=True,
        )

    if want("ph"):
        # level shift 0 -> 1 at the key midpoint h: m_t = 0 through
        # the first half, then climbs by q9(h/j) per step (exact
        # integer cumsum) — pure-Python replay of max_ph and the
        # first lambda crossing; m is monotone so alarms are a
        # suffix: n_alarms = n - first + 1
        rows = spark.range(n100).select(
            F.concat(
                F.lit("k"),
                F.pmod(F.col("id"), F.lit(20)).cast("string"),
            ).alias("k"),
            (F.col("id") / 20).cast("long").alias("t"),
            (
                (F.col("id") / 20).cast("long")
                >= F.lit(n100 // 40)
            )
            .cast("double")
            .alias("v"),
        )
        nk, h = n100 // 20, n100 // 40
        lam = 1000.0
        t = time.time()
        out = ts.page_hinkley(
            rows, "k", ["t"], "v", delta=0.0, lam=lam
        ).collect()
        timings["page_hinkley_100m_rows"] = round(time.time() - t, 2)
        acc = 0
        first = None
        lam_q = int(lam * 1e9)
        for j in range(h + 1, nk + 1):
            acc += math.floor(float(h) / float(j) * 1e9 + 0.5)
            if first is None and acc > lam_q:
                first = j
        exp_max = math.floor(acc / 1e9 * 1e6 + 0.5) / 1e6
        assert len(out) == 20
        for r in out:
            assert r.n == nk and r.max_ph == exp_max, (r, exp_max)
            assert r.first_alarm_t == first, (r, first)
            assert r.n_alarms == nk - first + 1, r
        print(
            "page_hinkley_100m_rows",
            timings["page_hinkley_100m_rows"],
            "max_ph", out[0].max_ph, "first", first, flush=True,
        )

    print(json.dumps({"timings_sec": timings}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
