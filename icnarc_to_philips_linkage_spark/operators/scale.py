"""Scale toolkit: skew-salting and bucketing (the hand tools for the
cases AQE can't fix alone).

- **Salted join**: when one join key dominates (a mega-encounter, a
  null-ish sentinel key), a plain shuffle join puts the whole key in one
  task. Salting splits the big side's hot keys across S sub-partitions
  and replicates the matching small-side rows S times — turning one
  straggler task into S parallel ones. AQE's skew-join split handles
  sort-merge cases adaptively; explicit salting is for when you need a
  guaranteed layout (e.g. before a window or groupBy on the hot key).
- **Bucketed tables**: pre-shuffling both fact tables into the same
  bucket layout on the join key makes every subsequent join on that key
  shuffle-free — the 100 TB answer to "this join runs every day".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_big_side(df: DataFrame, key: str, salts: int) -> DataFrame:
    """Deterministic salt from a stable hash of the whole row's key +
    uniform spreader. xxhash64 of the key plus monotonically varying
    bits would break determinism; instead spread on a hash of all
    columns, which is stable for a given row content."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*df.columns), F.lit(salts)).cast("int")
    )


def explode_small_side(df: DataFrame, salts: int) -> DataFrame:
    """Replicate each small-side row once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small
    side, join on (key, salt), drop the salt. Result set identical to
    ``big.join(small, key, how)`` for inner/left joins."""
    b = salt_big_side(big, key, salts)
    s = explode_small_side(small, salts)
    return b.join(s, on=[key, SALT_COL], how=how).drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/groupBys on ``key`` between tables bucketed the same way need
    no shuffle (and no sort, when sorted)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on the bucket key — planner elides
    the Exchange on both sides (verify with .explain: no Exchange)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
