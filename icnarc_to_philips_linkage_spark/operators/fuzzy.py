"""Fuzzy (approximate-string) record linkage — the probabilistic
counterpart to the reference's exact-key linkage (clean_encounterids.py
links on corrected integer ids; real-world linkage also needs
name/identifier matching tolerant of typos, e.g. hospital T-numbers or
patient names with transcription errors).

Design: **block, then compare**. An unblocked fuzzy join is O(n·m);
blocking on a cheap deterministic key (prefix, phonetic code, sorted
token signature) reduces candidates to within-block pairs — the same
shape as LSH banding for documents. Comparison is JVM-side
``levenshtein`` (codegen'd), never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocking_key(col: Column | str, prefix_len: int = 4) -> Column:
    """Cheap block key: lowercased alphanumeric prefix. Swap for a
    phonetic code (soundex) or sorted-token signature per domain."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.regexp_replace(F.lower(c), r"[^a-z0-9]", ""), 1, prefix_len
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    prefix_len: int = 4,
) -> DataFrame:
    """Candidate fuzzy matches: equi-join on the blocking key, then a
    Levenshtein filter. Emits every within-threshold pair with its
    distance; use ``best_match`` to reduce to one match per left row."""
    # spread the probe side across the cluster by block: a small input
    # (few file splits) would otherwise evaluate every within-block
    # comparison on one or two tasks, serializing the Levenshtein work
    l = left.withColumn("__blk", blocking_key(left_col, prefix_len)).repartition(
        "__blk"
    )
    r = right.withColumn("__blk", blocking_key(right_col, prefix_len))
    return (
        l.join(r, on="__blk")
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col(left_col), F.col(right_col)),
        )
        .filter(F.col("edit_distance") <= max_distance)
        .drop("__blk")
    )


def best_match(
    matches: DataFrame,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """One best match per left row: smallest distance, ties broken by
    right id (deterministic)."""
    w = Window.partitionBy(left_id).orderBy(
        F.asc("edit_distance"), F.asc(right_id)
    )
    return (
        matches.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
