"""Table reconciliation: key/value diff between two relations — the
check every migration, backfill, or engine swap runs before cutover
("does the new pipeline produce the same table?").

``table_diff`` classifies every key as only_left / only_right /
value_mismatch / equal in ONE full-outer join on the key, comparing
non-key columns via a single md5-over-concatenated-normalized-values
digest per side (computed map-side before the join, so the shuffle
carries one hash instead of every column). ``diff_summary`` reduces the
classification to one row of counts — the go/no-go number.

Scale: one shuffle on the key for the join; digests mean the compare
cost is independent of column count; the summary is a map-side partial
count. Null-safe throughout (NULL values digest as a sentinel, so
NULL == NULL for comparison purposes — reconciliation semantics, not
SQL equality).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _encoded_value(c: str):
    """Unambiguous per-column encoding: NULL -> 'N', else 'len:value'.
    The length prefix makes the '|'-joined concatenation prefix-free —
    ('a|b','c') encodes '3:a|b|1:c' vs ('a','b|c') '1:a|3:b|c' — so
    delimiter characters inside values (or a value equal to any
    sentinel) can never make two different rows digest identically.
    'N' is distinct from '0:' (empty string), preserving the
    NULL == NULL reconciliation semantics."""
    v = F.col(c).cast("string")
    return F.when(v.isNull(), F.lit("N")).otherwise(
        F.concat(F.length(v).cast("string"), F.lit(":"), v)
    )


def row_digest(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """(keys..., __digest) — md5 over the '|'-joined, length-prefixed,
    NULL-marked, string-normalized non-key columns in NAME order (column
    order differences between the two sides must not read as
    mismatches; the length prefixes make the encoding collision-free,
    see ``_encoded_value``)."""
    value_cols = sorted(c for c in df.columns if c not in key_cols)
    parts = [_encoded_value(c) for c in value_cols]
    return df.select(
        *key_cols, F.md5(F.concat_ws("|", *parts)).alias("__digest")
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Per-key classification: (keys..., status) with status in
    {'only_left', 'only_right', 'value_mismatch', 'equal'}. Duplicate
    keys on either side should be resolved (or counted) upstream — the
    digest join is exact but a many-to-many key would fan out."""
    keys = list(key_cols)
    l = row_digest(left, keys).withColumnRenamed("__digest", "__dl")
    r = row_digest(right, keys).withColumnRenamed("__digest", "__dr")
    return l.join(r, keys, "full_outer").select(
        *keys,
        F.when(F.col("__dr").isNull(), F.lit("only_left"))
        .when(F.col("__dl").isNull(), F.lit("only_right"))
        .when(F.col("__dl") != F.col("__dr"), F.lit("value_mismatch"))
        .otherwise(F.lit("equal"))
        .alias("status"),
    )


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """One row: n_equal / n_value_mismatch / n_only_left / n_only_right
    — the cutover gate (all but n_equal should be 0)."""
    d = table_diff(left, right, key_cols)
    return d.agg(
        *[
            F.count(F.when(F.col("status") == s, 1)).alias(f"n_{s}")
            for s in ("equal", "value_mismatch", "only_left", "only_right")
        ]
    )
