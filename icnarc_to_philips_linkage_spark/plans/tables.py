"""Testdata table loading (TESTDATA.md).

Parquet scans go through here so every query inherits the same scan
behavior: schema from parquet footer, filter/column pushdown on (session
defaults), no inference pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. ``events.ts`` is written as TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; read it as nanos-since-epoch long
    (legacy conf, runtime-settable) and convert to a microsecond timestamp
    — identical truncation to what the DuckDB oracle does (TIMESTAMP_NS →
    TIMESTAMP). The cast is a cheap codegen'd projection, not a UDF."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # semantics must not depend on who built the SparkSession (the driver
    # harness may not have gone through session.get_spark): pin timezone
    # and non-ANSI casts (Spark 4 defaults ANSI on, where lossy casts
    # throw instead of yielding NULL — the engine's E11 coercion model)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer DIV — a double division would lose precision at
            # nanosecond epoch magnitudes (~1.7e18 > 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # parquet timestamp[us] without TZ reads as TIMESTAMP_NTZ, which
            # unix_micros() et al. reject; under the pinned UTC session TZ
            # this cast keeps the same instant (wall clock == UTC instant)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame, *cols: str, min_parts: int | None = None) -> DataFrame:
    """Widen a narrow scan BEFORE a CPU-heavy projection runs on it.

    Parquet splits only at row-group boundaries, so a table written as
    one file with one row group scans as ONE partition regardless of
    ``spark.sql.files.maxPartitionBytes`` — and every map-side
    transform chained onto that scan (shingling, vector arithmetic,
    regex tokenization) executes in a single task. Queries whose cost
    is per-row compute rather than shuffle lose the whole cluster to
    file layout.

    The check is driver-side metadata only (``getNumPartitions`` plans
    the scan; no job runs): when the scan already has at least the
    session's default parallelism — the normal case at real scale,
    where a 100 TB table is thousands of files — this is a NO-OP and
    adds nothing to the plan. Only a narrow scan pays one extra
    exchange of the RAW rows, placed below the expensive projection
    (callers apply it to the loaded table, not the derived plan —
    Catalyst would otherwise put the exchange above the projection and
    parallelize nothing).

    With ``cols``, placement hash-partitions on those columns
    (deterministic row→partition mapping, no round-robin local sort);
    bare calls round-robin. Either way results are partition-order
    independent: every consumer in this repo aggregates, joins, or
    rounds to fixed decimals before comparison.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if cols:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the Spark SQL surface (SURVEY §7 sql/views)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
