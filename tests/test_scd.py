"""SCD2 merge semantics: closed rows untouched, current rows closed at
the first update, last update becomes current."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from icnarc_to_philips_linkage_spark.operators.scd import (
    scd2_from_changelog,
    scd2_merge,
)


def ts(d: int) -> dt.datetime:
    return dt.datetime(2016, 1, 1) + dt.timedelta(days=d)


def test_scd2_changelog_and_merge(spark):
    changelog = spark.createDataFrame(
        [Row(k=1, v="a", t=ts(0)), Row(k=1, v="b", t=ts(10)),
         Row(k=2, v="x", t=ts(5))]
    )
    hist = scd2_from_changelog(changelog, "k", "t", ["v"])
    rows = {(r.k, r.v): r for r in hist.collect()}
    assert rows[(1, "a")].valid_to == ts(10) and not rows[(1, "a")].is_current
    assert rows[(1, "b")].is_current and rows[(1, "b")].valid_to is None
    assert rows[(2, "x")].is_current

    updates = spark.createDataFrame(
        [Row(k=1, v="c", t=ts(20)),   # new version for existing key
         Row(k=3, v="n", t=ts(21))]   # brand-new key
    )
    merged = scd2_merge(hist, updates, "k", "t", ["v"])
    m = {(r.k, r.v): r for r in merged.collect()}
    assert len(m) == 5
    # closed row untouched
    assert m[(1, "a")].valid_from == ts(0) and m[(1, "a")].valid_to == ts(10)
    # previously-current row closed at the update's timestamp
    assert m[(1, "b")].valid_to == ts(20) and not m[(1, "b")].is_current
    # update became current
    assert m[(1, "c")].is_current and m[(1, "c")].valid_from == ts(20)
    # untouched key stays current; new key inserted current
    assert m[(2, "x")].is_current
    assert m[(3, "n")].is_current and m[(3, "n")].valid_from == ts(21)
    # exactly one current row per key
    by_key = {}
    for r in merged.collect():
        by_key.setdefault(r.k, []).append(r.is_current)
    assert all(sum(flags) == 1 for flags in by_key.values())
