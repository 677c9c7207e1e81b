"""Iterative k-means over embedding columns — the engine's exemplar of a
genuinely non-SQL-expressible (iterative) algorithm, built purely from
DataFrame ops: assign = broadcast-join argmin over centroids, update =
posexplode + per-(cluster, pos) mean. Used for curation tasks (cluster
sampling, dedup blocking, coverage analysis) on training corpora.

Scale shape per iteration: one broadcast join (centroids are k×dim,
tiny) + one shuffle keyed on (cluster, position) whose cardinality is
k·dim regardless of corpus size. The corpus is cached across
iterations; convergence is measured by centroid movement, not by
re-reading data.

Determinism: initial centroids are the k lowest-id vectors (no RNG), so
a rows-only correctness check is stable across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators.similarity import dot, norm_sq


def _assign(points: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per point by squared euclidean distance:
    |v|² − 2·v·c + |c|² (norms precomputed per side, dot per pair)."""
    scored = points.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "p_nsq",
        "cluster",
        (
            F.col("p_nsq")
            - 2.0 * dot("embedding", "centroid")
            + F.col("c_nsq")
        ).alias("dist_sq"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist_sq"), F.asc("cluster"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "p_nsq", "cluster")
    )


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
    # materialize centroids each round: k rows to the driver, re-broadcast
    cents = cents.collect()
    for _ in range(max_iter):
        cents_df = points.sparkSession.createDataFrame(cents)
        assigned = _assign(points, cents_df)
        cents = _update(assigned).collect()
    final = _assign(points, points.sparkSession.createDataFrame(cents))
    return final.select("vec_id", "cluster")


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    return assignments.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
