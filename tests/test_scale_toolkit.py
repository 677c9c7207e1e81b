"""Scale toolkit tests: salted join equivalence + spread, bucketed join
shuffle elision."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import scale


@pytest.fixture(scope="module")
def skewed(spark):
    # key 7 is hot: 500 of 600 rows
    rows = [Row(k=7, v=i) for i in range(500)] + [
        Row(k=i % 10, v=1000 + i) for i in range(100)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([Row(k=i, label=f"k{i}") for i in range(10)])


def test_salted_join_matches_plain_join(spark, skewed, dim):
    plain = sorted(
        map(tuple, skewed.join(dim, "k", "inner").select("k", "v", "label").collect())
    )
    salted = sorted(
        map(
            tuple,
            scale.salted_join(skewed, dim, "k", salts=8)
            .select("k", "v", "label")
            .collect(),
        )
    )
    assert plain == salted


def test_salting_spreads_hot_key(spark, skewed):
    salted = scale.salt_big_side(skewed, "k", 8)
    spread = (
        salted.filter(F.col("k") == 7)
        .select(scale.SALT_COL)
        .distinct()
        .count()
    )
    assert spread >= 6, "hot key must spread across most salt buckets"


def test_bucketed_join_elides_shuffle(spark):
    a = spark.range(0, 10000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("vb", F.col("id") * 3)
    scale.write_bucketed(a, "bkt_a", "id", buckets=8)
    scale.write_bucketed(b, "bkt_b", "id", buckets=8)
    # force the shuffle-join path (these toy tables would broadcast, and a
    # broadcast join sidesteps bucketing entirely) to show bucket elision
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scale.bucketed_join(spark, "bkt_a", "bkt_b", "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"co-bucketed join must not shuffle:\n{plan}"
        )
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 10000
        # groupBy on the bucket key of one table needs no exchange either
        agg_plan = (
            spark.table("bkt_a")
            .groupBy("id")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in agg_plan, agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
