"""Sequence packing for LLM training: lay documents end-to-end in a
deterministic order and cut the token stream every ``context_len``
tokens (GPT-style concat-then-split packing) — each document is
assigned the context window(s) its token span covers, so the batch
builder downstream knows exactly which documents (and which slice of
each) fill every training sequence.

Scale design — the naive formulation is a GLOBAL running sum
(``sum() over (order by ...)`` with no partition key), which plans as a
single-partition window sort: the whole corpus through one task. Here
the prefix sum is distributed the classic two-level way:

1. per-partition running sums (window partitioned by
   ``spark_partition_id`` — parallel, partition-local sort only);
2. ONE collected row per partition (its total) → cumulative offsets,
   broadcast back as a literal map (bounded by the partition count,
   like k-means centroids);
3. global offset = partition offset + local running sum — map-side.

The document→window assignment then reuses the interval-join bucket
trick: a document spanning [start, end) explodes to windows
floor(start/L)..floor((end-1)/L) — fan-out bounded by doc length /
context length.

Determinism: the pack order is an explicit ``order_col`` (default the
id), and partition-local ordering uses the same key, so the layout is
independent of file splits only when the input partitioning is itself
deterministic — call ``repartitionByRange(order_col)`` upstream (the
registered query does) or accept pack-order = (partition, order_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    context_len: int = 2048,
    order_col: str | None = None,
) -> DataFrame:
    """(window_id, doc_id, doc_start, doc_end, win_start, win_end) —
    one row per (document, context window) overlap, where
    [doc_start, doc_end) is the document's span in the global token
    stream and [win_start, win_end) the slice of THAT document landing
    in THIS window. Zero-token documents are dropped (they occupy no
    span)."""
    order_col = order_col or id_col
    # ROWS frame with the unique id as tiebreak: the default RANGE frame
    # over a non-unique order_col gives tied rows the SAME running sum,
    # so their [doc_start, doc_end) spans would overlap (corrupt layout).
    part_w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    local = (
        df.filter(F.col(n_tokens_col) > 0)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__local_end", F.sum(n_tokens_col).over(part_w))
    )
    # localCheckpoint (not persist): the collected per-partition offsets
    # are only valid if spark_partition_id() is IDENTICAL between the
    # totals collect and the later spans evaluation. A persist is a
    # best-effort pin — an evicted block recomputes, and any upstream
    # nondeterminism (e.g. repartitionByRange's boundary sampling) could
    # silently shift ids. Checkpointing truncates the lineage: a lost
    # block fails the job instead of producing wrong spans. The blocks
    # live until the returned DataFrame (and `local`) are GC'd or the
    # session ends — the price of a correct pin.
    local = local.localCheckpoint(eager=True)
    totals = (
        local.groupBy("__pid")
        .agg(F.max("__local_end").alias("__total"))
        .orderBy("__pid")
        .collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__pid"]] = acc
        acc += r["__total"]
    # literal CASE map: bounded by the partition count (same plan-literal
    # pattern as k-means centroids / the Bloom bitmap)
    off = None
    for pid, o in offsets.items():
        c = F.when(F.col("__pid") == pid, F.lit(o))
        off = c if off is None else off.when(F.col("__pid") == pid, F.lit(o))
    off = off.otherwise(F.lit(0)) if off is not None else F.lit(0)

    spans = local.select(
        F.col(id_col),
        (off + F.col("__local_end") - F.col(n_tokens_col)).alias("doc_start"),
        (off + F.col("__local_end")).alias("doc_end"),
    )
    L = F.lit(context_len)
    exploded = spans.withColumn(
        "window_id",
        F.explode(
            F.sequence(
                F.floor(F.col("doc_start") / L),
                F.floor((F.col("doc_end") - 1) / L),
            )
        ),
    )
    win_lo = F.col("window_id") * L
    return exploded.select(
        "window_id",
        id_col,
        "doc_start",
        "doc_end",
        F.greatest(F.col("doc_start"), win_lo).alias("win_start"),
        F.least(F.col("doc_end"), win_lo + L).alias("win_end"),
    )
