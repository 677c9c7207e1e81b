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

    print(json.dumps({"timings_sec": timings}))
    spark.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
