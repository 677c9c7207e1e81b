"""Structured Streaming surface for EAV observation streams.

The reference processes its time-series table (chartevents: ~1 record/hr
flowsheet + ~1/day labs) as a static batch (SURVEY §2.9), but it stores
BOTH ``chartTime`` (event time) and ``storeTime`` (arrival time) — the
exact late-data distinction Structured Streaming watermarks model. This
module is the streaming extension of the same schema:

- file/parquet ``readStream`` source with schema enforcement;
- watermarked tumbling / sliding window aggregates per variable;
- lateness profiling (storeTime − chartTime) to *choose* the watermark;
- gap-based sessionization via ``session_window``;
- the same typed-value + dimension-decoration ops as batch (the
  DataFrame expressions are identical — one definition serves both).

Scale: windowed aggregation state is keyed by (window, variable-ish
keys); watermarking bounds state size; ``availableNow`` triggers give
batch-backfill semantics with streaming code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHARTEVENTS_SCHEMA = StructType(
    [
        StructField("encounterId", LongType(), True),
        StructField("chartTime", TimestampType(), True),
        StructField("storeTime", TimestampType(), True),
        StructField("interventionId", LongType(), True),
        StructField("attributeId", LongType(), True),
        StructField("valueNumber", DoubleType(), True),
        StructField("valueString", StringType(), True),
    ]
)


def read_chartevents_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over a chartevents-shaped directory. New files
    are discovered per micro-batch; schema is pinned (streams cannot
    infer)."""
    return spark.readStream.format(fmt).schema(CHARTEVENTS_SCHEMA).load(path)


def windowed_variable_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-(window, interventionId, attributeId) count/mean/min/max of
    the numeric value, watermarked on event time. Late rows beyond the
    watermark are dropped and the corresponding state is evictable —
    this is what bounds memory on an unbounded stream.

    ``watermark=None`` runs the identical transformation on a *batch*
    frame (backfills, the t2 oracle query) — one definition, both
    execution modes."""
    win = (
        F.window("chartTime", window, slide)
        if slide
        else F.window("chartTime", window)
    )
    src = (
        events.withWatermark("chartTime", watermark) if watermark else events
    )
    # decimal-exact mean: order-independent across partial aggregation
    # (and across engines in the oracle check) for fixed-scale inputs
    mean = (
        F.sum(F.col("valueNumber").cast("decimal(28,2)")).cast("double")
        / F.count("valueNumber")
    )
    return (
        src.groupBy(win.alias("w"), "interventionId", "attributeId")
        .agg(
            F.count("valueNumber").alias("n"),
            mean.alias("mean_value"),
            F.min("valueNumber").alias("min_value"),
            F.max("valueNumber").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "interventionId",
            "attributeId",
            "n",
            "mean_value",
            "min_value",
            "max_value",
        )
    )


def lateness_profile(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Distribution of arrival lag (storeTime − chartTime) per window —
    the measurement that justifies a watermark choice. The reference
    stores both timestamps; this op turns them into an operational
    signal."""
    lag_s = (
        F.unix_timestamp("storeTime") - F.unix_timestamp("chartTime")
    ).alias("lag_s")
    return (
        events.withWatermark("chartTime", "1 day")
        .groupBy(F.window("chartTime", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(lag_s).alias("mean_lag_s"),
            F.max(lag_s).alias("max_lag_s"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n",
            "mean_lag_s",
            "max_lag_s",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per stay: consecutive observations
    closer than ``gap`` merge into one session (native session_window —
    state merges windows as rows arrive, watermark closes sessions)."""
    return (
        events.withWatermark("chartTime", watermark)
        .groupBy(
            F.session_window("chartTime", gap).alias("s"), "encounterId"
        )
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "encounterId",
            "n_obs",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = (
        "encounterId",
        "chartTime",
        "interventionId",
        "attributeId",
    ),
    watermark: str = "2 hours",
) -> DataFrame:
    """At-least-once feed hygiene on the stream itself:
    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    drops re-deliveries that arrive within the watermark delay — the
    streaming twin of the batch ``debounce``/exact-dedup operators.

    Why WithinWatermark and not plain ``dropDuplicates``: the plain form
    keys state by the full key forever (unbounded on an unbounded
    stream); the watermarked form evicts a key's state once the event-
    time watermark passes its horizon, so state size follows the
    duplicate-arrival window, not stream history. The trade-off is
    explicit and matches real feeds: a duplicate redelivered LATER than
    the watermark delay is no longer deduplicated — size ``watermark``
    to the feed's redelivery guarantee."""
    return events.withWatermark(
        "chartTime", watermark
    ).dropDuplicatesWithinWatermark(list(keys))


def run_to_memory_sink(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
) -> "object":
    """Execute a streaming frame with the available-now trigger into an
    in-memory table (tests / backfills): processes everything currently
    in the source, then stops."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


ALARM_SCHEMA = StructType(
    [
        StructField("encounterId", LongType(), True),
        StructField("alarmTime", TimestampType(), True),
        StructField("alarmType", StringType(), True),
    ]
)


def read_alarm_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over an alarm-annotation directory."""
    return spark.readStream.format(fmt).schema(ALARM_SCHEMA).load(path)


def join_obs_to_alarms(
    obs: DataFrame,
    alarms: DataFrame,
    tolerance: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each observation paired
    with the same encounter's alarms raised within ``[chartTime -
    tolerance, chartTime]`` (annotating measurements with the alarm
    context that preceded them).

    Both sides carry an event-time watermark AND the join condition
    bounds their event-time distance — the two requirements that let
    Structured Streaming evict buffered state: either side's rows can be
    dropped once the other side's watermark has passed their
    match-eligibility horizon. Without the time-range term, stream-
    stream join state grows without bound. State is keyed by
    encounterId (the equi half of the condition), so scale-out follows
    key cardinality exactly like the windowed aggregates.

    Works identically on batch frames (the same expressions, no
    watermark needed) — the engine's batch/stream unification policy.
    """
    o = obs.withWatermark("chartTime", watermark).alias("o")
    a = alarms.withWatermark("alarmTime", watermark).alias("a")
    return o.join(
        a,
        F.expr(
            f"""
            o.encounterId = a.encounterId AND
            a.alarmTime >= o.chartTime - INTERVAL {tolerance} AND
            a.alarmTime <= o.chartTime
            """
        ),
    ).select(
        F.col("o.encounterId").alias("encounterId"),
        "chartTime",
        "valueNumber",
        "alarmTime",
        "alarmType",
    )
