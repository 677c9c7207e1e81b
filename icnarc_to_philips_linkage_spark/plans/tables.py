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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the Spark SQL surface (SURVEY §7 sql/views)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
