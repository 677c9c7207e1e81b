"""Iterative k-means over embedding columns — the engine's exemplar of a
genuinely non-SQL-expressible (iterative) algorithm, built purely from
DataFrame ops: assign = literal-centroid argmin (narrow map, zero
shuffle), update = posexplode + per-(cluster, pos) mean. Used for
curation tasks (cluster sampling, dedup blocking, coverage analysis) on
training corpora.

Scale shape per iteration: assignment is embarrassingly parallel (the
k×dim centroids fold into the plan as literals), and the only shuffle
is the update aggregate keyed on (cluster, position) — map-side partial
means make its shuffle cardinality k·dim·partitions regardless of
corpus size. The corpus is cached across iterations; convergence is
measured by centroid movement, not by re-reading data.

Determinism: initial centroids are the k lowest-id vectors (no RNG),
distances round to 6dp before each argmin, and centroid means cast to
float32 — so the whole training trajectory is stable across runs,
partitionings AND engines, and the registered query carries a FULL
DuckDB oracle that unrolls the iterations (plans/llm.py _kmeans_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators.similarity import norm_sq


def _assign(points: DataFrame, cents: list) -> DataFrame:
    """Nearest centroid per point by squared euclidean distance:
    |v|² − 2·v·c + |c|² (point norms precomputed, centroid norms
    driver-side). The collected centroids (k×dim, tiny) fold into the
    plan as literal arrays, so assignment is a NARROW map — no join, no
    shuffle, no row blowup; argmin is array_min over (dist², cluster)
    structs, whose field-order comparison gives a deterministic
    lowest-cluster tie-break. dist² rounds to 6dp before the argmin:
    centroid means can differ across engines in the last ulp, and the
    rounding (plus the float32 centroid cast in ``_update``) absorbs
    that noise so assignments — and the unrolled DuckDB oracle replay
    of the whole training loop — are engine-identical."""
    # Single typed Literal nodes (not k·dim CreateArray expressions):
    # keeps the analyzed plan and generated code small and compile-fast.
    cent_vecs = F.lit([[float(x) for x in c.centroid] for c in cents])
    cent_nsq = F.lit([float(c.c_nsq) for c in cents])
    cent_ids = F.lit([int(c.cluster) for c in cents])
    scored = F.transform(
        cent_vecs,
        lambda c, i: F.struct(
            F.round(
                F.col("p_nsq")
                - 2.0
                * F.aggregate(
                    F.zip_with("embedding", c, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                + cent_nsq[i],
                6,
            ).alias("dist_sq"),
            cent_ids[i].alias("cluster"),
        ),
    )
    return points.withColumn("cluster", F.array_min(scored)["cluster"])


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid = element-wise mean per cluster."""
    exploded = assigned.select(
        "cluster", F.posexplode("embedding").alias("pos", "v")
    )
    means = exploded.groupBy("cluster", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    return (
        means.groupBy("cluster")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select(
            "cluster",
            F.expr("transform(pm, x -> cast(x.m as float))").alias("centroid"),
        )
        .withColumn("c_nsq", norm_sq("centroid"))
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Returns (vec_id, cluster). Deterministic lowest-id init; fixed
    iteration count (driver-side loop — each iteration is one lazy plan,
    materialized via the centroid collect, which is k rows)."""
    points = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        norm_sq(vec_col).alias("p_nsq"),
    ).cache()
    w = Window.orderBy("vec_id")
    cents = (
        points.orderBy("vec_id")
        .limit(k)
        .withColumn("cluster", F.row_number().over(w) - 1)
        .select(
            "cluster",
            F.col("embedding").alias("centroid"),
            F.col("p_nsq").alias("c_nsq"),
        )
    )
    # materialize centroids each round: k rows to the driver, folded
    # back into the next assignment plan as literals (no re-broadcast
    # join — see _assign)
    cents = cents.collect()
    for _ in range(max_iter):
        assigned = _assign(points, cents)
        cents = _update(assigned).collect()
    return _assign(points, cents).select("vec_id", "cluster")


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    return assignments.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
