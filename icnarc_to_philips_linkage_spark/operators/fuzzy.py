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

from pyspark.sql import Column, DataFrame
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
        # 3-arg levenshtein: banded DP that early-exits past the
        # threshold (returns -1) — O(max_distance·len) per pair instead
        # of the full len² matrix; ~2x on the within-block compare loop
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col(left_col), F.col(right_col), max_distance),
        )
        .filter(F.col("edit_distance") >= 0)
        .drop("__blk")
    )


def best_match(
    matches: DataFrame,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """One best match per left row: smallest distance, ties broken by
    right id (deterministic — right id is unique per group, so the
    (distance, right_id) ordering key has no ties).

    Physical shape: min_by aggregation, not a row_number window — the
    partial (map-side) min collapses each group to one row before the
    shuffle, and no per-group sort ever happens. At 100 TB the shuffle
    carries |left| rows instead of |candidate pairs|."""
    others = [col for col in matches.columns if col != left_id]
    ordering = F.struct(F.col("edit_distance"), F.col(right_id))
    return (
        matches.groupBy(left_id)
        .agg(F.min_by(F.struct(*others), ordering).alias("__best"))
        .select(left_id, *[F.col(f"__best.{col}").alias(col) for col in others])
    )
