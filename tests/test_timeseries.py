"""As-of join and resample+ffill semantics on hand-built fixtures:
at-or-before tie matching, no-prior-row NULLs, gap filling."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators.timeseries import (
    asof_join,
    resample_ffill,
)


def ts(m: int) -> dt.datetime:
    return dt.datetime(2016, 1, 1) + dt.timedelta(minutes=m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [Row(k=1, lts=ts(10), lid="a"),
         Row(k=1, lts=ts(30), lid="b"),
         Row(k=1, lts=ts(5), lid="pre"),   # before any right row
         Row(k=2, lts=ts(60), lid="c"),    # key with no right rows at all
         Row(k=1, lts=ts(20), lid="tie")]  # exactly at a right timestamp
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=ts(8), v=1.0),
         Row(k=1, rts=ts(20), v=2.0),
         Row(k=1, rts=ts(25), v=3.0)]
    )
    out = asof_join(left, right, "k", "lts", "rts", "v")
    got = {r.lid: r.asof_value for r in out.collect()}
    assert got == {
        "pre": None,   # nothing at-or-before 05
        "a": 1.0,      # 08 <= 10
        "tie": 2.0,    # equal timestamps match (at-or-before)
        "b": 3.0,      # latest of {8,20,25} <= 30
        "c": None,     # key never seen on right
    }
    assert out.count() == left.count(), "every left row preserved"


def test_resample_ffill_semantics(spark):
    events = spark.createDataFrame(
        [Row(k=1, t=ts(10), v=10.0, i=1),
         Row(k=1, t=ts(50), v=11.0, i=2),     # same hour: later wins
         Row(k=1, t=ts(200), v=12.0, i=3)]    # hour 3; hours 1-2 empty
    )
    out = resample_ffill(events, "k", "t", "v", "1 hour", tiebreak="i")
    rows = sorted((r.grid_ts, r.value_ffill) for r in out.collect())
    assert rows == [
        (ts(0), 11.0),     # bucket 00: last obs in bucket (tie by ts)
        (ts(60), 11.0),    # empty hour → carried forward
        (ts(120), 11.0),
        (ts(180), 12.0),
    ]


def test_resample_rejects_multi_unit_steps(spark):
    events = spark.createDataFrame([Row(k=1, t=ts(0), v=1.0, i=1)])
    with pytest.raises(ValueError):
        resample_ffill(events, "k", "t", "v", "2 hours")


def test_resample_interpolate_semantics(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        resample_interpolate,
    )

    events = spark.createDataFrame(
        [Row(k=1, t=ts(0), v=10.0, i=1),       # hour 0
         Row(k=1, t=ts(240), v=50.0, i=2)]     # hour 4; hours 1-3 interpolate
    )
    out = resample_interpolate(events, "k", "t", "v", "1 hour", tiebreak="i")
    rows = sorted((r.grid_ts, r.value_interp) for r in out.collect())
    assert rows == [
        (ts(0), 10.0),
        (ts(60), 20.0),
        (ts(120), 30.0),
        (ts(180), 40.0),
        (ts(240), 50.0),
    ]


def test_ewma_grouped_map(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import ewma_smooth

    events = spark.createDataFrame(
        [Row(k=1, t=ts(0), v=10.0, i=1),
         Row(k=1, t=ts(60), v=20.0, i=2),
         Row(k=1, t=ts(120), v=30.0, i=3),
         Row(k=2, t=ts(0), v=5.0, i=4)]
    )
    out = ewma_smooth(events, "k", "t", "v", alpha=0.5)
    rows = {(r.k, r.t): r.ewma for r in out.collect()}
    assert rows[(1, ts(0))] == 10.0
    assert rows[(1, ts(60))] == 15.0          # 0.5*20 + 0.5*10
    assert rows[(1, ts(120))] == 22.5         # 0.5*30 + 0.5*15
    assert rows[(2, ts(0))] == 5.0
    # partitioning-independent
    out2 = ewma_smooth(events.repartition(7), "k", "t", "v", alpha=0.5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_interval_join_semantics(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        interval_join,
    )

    intervals = spark.createDataFrame(
        [Row(k=1, iid="w1", s=ts(0), e=ts(60)),
         Row(k=1, iid="w2", s=ts(30), e=ts(90)),     # overlaps w1
         Row(k=1, iid="empty", s=ts(200), e=ts(210)),
         Row(k=1, iid="bad", s=ts(50), e=ts(50)),    # degenerate [s, s)
         Row(k=2, iid="other", s=ts(0), e=ts(60))]   # different key
    )
    points = spark.createDataFrame(
        [Row(k=1, pid="p0", t=ts(0)),     # on w1 start (inclusive)
         Row(k=1, pid="p45", t=ts(45)),   # inside w1 AND w2
         Row(k=1, pid="p60", t=ts(60)),   # w1 end (exclusive), in w2
         Row(k=1, pid="p100", t=ts(100)), # in no interval
         Row(k=2, pid="q10", t=ts(10))]   # key 2 only
    )
    out = interval_join(
        points, intervals, point_ts="t", start_col="s", end_col="e",
        key="k", bucket="1 hour",
    )
    got = sorted((r.iid, r.pid) for r in out.collect())
    assert got == [
        ("other", "q10"),
        ("w1", "p0"),
        ("w1", "p45"),
        ("w2", "p45"),
        ("w2", "p60"),
    ]


def test_interval_join_keyless_and_bucket_spanning(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        interval_join,
    )

    # one interval spanning many buckets; no equality key at all
    intervals = spark.createDataFrame(
        [Row(iid="long", s=ts(10), e=ts(10 + 36 * 60))]  # 36 hours
    )
    points = spark.createDataFrame(
        [Row(pid="in1", t=ts(15)),
         Row(pid="in2", t=ts(10 + 24 * 60)),     # a day later, inside
         Row(pid="out", t=ts(10 + 40 * 60))]
    )
    out = interval_join(
        points, intervals, point_ts="t", start_col="s", end_col="e",
        bucket="1 hour",
    )
    assert sorted(r.pid for r in out.collect()) == ["in1", "in2"]


def test_debounce_semantics(spark):
    from icnarc_to_philips_linkage_spark.operators.dedup import debounce

    ev = spark.createDataFrame(
        [Row(k="a", t=ts(0), i=1),
         Row(k="a", t=ts(3), i=2),    # within 5 min of previous -> drop
         Row(k="a", t=ts(9), i=3),    # 6 min after #2 (kept raw-prev) -> keep
         Row(k="a", t=ts(9), i=4),    # same timestamp, tiebreak -> drop
         Row(k="b", t=ts(1), i=5)]    # other key unaffected
    )
    kept = sorted(
        r.i
        for r in debounce(
            ev, ["k"], "t", gap="5 minutes", tiebreak="i"
        ).collect()
    )
    assert kept == [1, 3, 5]


def test_malformed_step_specs_raise_clean_errors(spark):
    from icnarc_to_philips_linkage_spark.operators.dedup import debounce
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        interval_join,
    )

    df = spark.createDataFrame([Row(k=1, t=ts(0))])
    with pytest.raises(ValueError, match="bucket must look like"):
        interval_join(df, df.withColumnRenamed("t", "s").withColumn(
            "e", F.col("s")), point_ts="t", start_col="s", end_col="e",
            bucket="fortnight")
    with pytest.raises(ValueError, match="gap must look like"):
        debounce(df, ["k"], "t", gap="5 parsecs")


def test_interval_join_auto_bucket_bounds_giant_interval(spark):
    """Skew robustness (VERDICT r2 item 6): with bucket='auto' the
    derived width clamps a pathological giant interval's explode
    fan-out at max_fanout + 1 rows, and results still exactly match a
    fine-bucket run."""
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        derive_bucket_us,
        interval_join,
    )

    # 200 typical 1-hour intervals + ONE 10000-hour giant
    iv_rows = [
        Row(iv_id=i, k=i % 5, s=ts(i * 30), e=ts(i * 30 + 60))
        for i in range(200)
    ]
    iv_rows.append(Row(iv_id=999, k=0, s=ts(0), e=ts(10000 * 60)))
    intervals = spark.createDataFrame(iv_rows)
    points = spark.createDataFrame(
        [Row(k=i % 5, pts=ts(i * 7), v=float(i)) for i in range(500)]
    )

    us = derive_bucket_us(intervals, "s", "e", max_fanout=64)
    # per-interval explode rows = floor((e-1)/us) - floor(s/us) + 1
    fanout = (
        intervals.select(
            (
                F.floor((F.unix_micros(F.col("e").cast("timestamp")) - 1) / us)
                - F.floor(F.unix_micros(F.col("s").cast("timestamp")) / us)
                + 1
            ).alias("n")
        )
        .agg(F.max("n").alias("mx"), F.sum("n").alias("total"))
        .collect()[0]
    )
    assert fanout.mx <= 65, f"giant interval exploded to {fanout.mx} rows"
    # typical intervals stay ~1-2 buckets: total explode stays linear
    assert fanout.total <= 2 * 201 + 65

    res_auto = interval_join(
        points, intervals, "pts", "s", "e", key="k", bucket=us
    )
    res_fine = interval_join(
        points, intervals, "pts", "s", "e", key="k", bucket="1 hour"
    )
    assert sorted(map(tuple, res_auto.collect())) == sorted(
        map(tuple, res_fine.collect())
    )


def test_derive_bucket_us_degenerate_inputs(spark):
    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        derive_bucket_us,
    )

    empty = spark.createDataFrame([], "s timestamp, e timestamp")
    assert derive_bucket_us(empty, "s", "e") == 86_400_000_000
    # all-invalid (e <= s) intervals -> same day default
    inverted = spark.createDataFrame([Row(s=ts(10), e=ts(5))])
    assert derive_bucket_us(inverted, "s", "e") == 86_400_000_000
    with pytest.raises(ValueError):
        derive_bucket_us(empty, "s", "e", max_fanout=0)


def test_asof_directional_forward_and_nearest(spark):
    from pyspark.sql import functions as F

    from icnarc_to_philips_linkage_spark.operators.timeseries import (
        asof_join_directional,
    )

    def ts(s):
        return F.to_timestamp(F.lit(s))

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00"),
         (3, "2024-01-01 23:00:00")],
        "event_id long, t string",
    ).select("event_id", F.lit(7).alias("k"), F.to_timestamp("t").alias("lts"))
    right = spark.createDataFrame(
        [("2024-01-01 09:00:00", 1.0), ("2024-01-01 12:00:00", 2.0),
         ("2024-01-01 13:00:00", 3.0)],
        "t string, v double",
    ).select(F.lit(7).alias("k"), F.to_timestamp("t").alias("rts"), "v")

    fwd = {
        r.event_id: r.asof_value
        for r in asof_join_directional(
            left, right, "k", "lts", "rts", "v", direction="forward"
        ).collect()
    }
    # 10:00 -> next at 12:00 (2.0); 12:00 -> tie counts (2.0);
    # 23:00 -> nothing after -> NULL
    assert fwd == {1: 2.0, 2: 2.0, 3: None}

    near = {
        r.event_id: r.asof_value
        for r in asof_join_directional(
            left, right, "k", "lts", "rts", "v", direction="nearest"
        ).collect()
    }
    # 10:00: back 09:00 (1h) vs fwd 12:00 (2h) -> 1.0
    # 12:00: exact tie -> backward wins (2.0)
    # 23:00: only backward exists -> 3.0
    assert near == {1: 1.0, 2: 2.0, 3: 3.0}
