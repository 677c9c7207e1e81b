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

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


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


FFD_SCHEMA = StructType(
    [
        StructField("bin_id", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("bin_offset", LongType(), False),
    ]
)


def pack_bins_ffd(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    context_len: int = 2048,
    num_groups: int = 64,
) -> DataFrame:
    """Best-fit packing variant: first-fit-decreasing (FFD) bin packing
    — documents are NEVER split across training sequences (the other
    standard LLM batching layout, vs ``pack_sequences``' concat-then-
    split which fills every window but slices documents).

    Greedy FFD is inherently sequential, so the distributed shape is
    partition-then-pack: documents hash deterministically into
    ``num_groups`` groups (``pmod(xxhash64(id), G)`` — stable across
    partitionings/engines), and each group runs classic FFD in one
    ``applyInPandas`` call (sort by length desc then id asc; place each
    doc in the first bin it fits, else open a new bin). Size
    ``num_groups`` so a group's (id, n_tokens) pairs fit an executor —
    the pack never touches text, only lengths. FFD guarantees
    <= 11/9·OPT + 1 bins PER GROUP; grouping costs a little fill at the
    margins but is what makes the layout computable at corpus scale.

    Output: one row per document — (bin_id, doc_id, n_tokens,
    bin_offset), ``bin_id = group * 2^32 + bin_within_group`` (globally
    unique), ``bin_offset`` the doc's token start inside its bin.
    Documents with n_tokens <= 0 or > context_len are dropped (an
    oversize doc cannot be packed whole; pre-chunk upstream with
    ``text.chunk_windows`` if it must survive). Fully deterministic —
    no RNG, no partition-id dependence."""
    if context_len < 1 or num_groups < 1:
        raise ValueError(
            f"need context_len >= 1 and num_groups >= 1, got "
            f"{context_len}, {num_groups}"
        )
    id_type = dict(df.dtypes)[id_col]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # a silent cast('long') would NULL out string ids and crash (or
        # drop rows) deep inside the pandas pack — reject up front
        raise TypeError(
            f"pack_bins_ffd requires an integral id column; {id_col!r} "
            f"is {id_type}. Map string ids to longs first (e.g. "
            f"xxhash64 or a dimension join)."
        )

    docs = df.filter(
        (F.col(n_tokens_col) > 0) & (F.col(n_tokens_col) <= context_len)
    ).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_groups)).alias("__grp"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        grp = int(pdf["__grp"].iloc[0])
        base = grp << 32
        remaining: list[int] = []  # free tokens per open bin
        out = []
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            for b, free in enumerate(remaining):
                if free >= n:
                    out.append((base + b, int(doc_id), n, context_len - free))
                    remaining[b] = free - n
                    break
            else:
                out.append((base + len(remaining), int(doc_id), n, 0))
                remaining.append(context_len - n)
        return pd.DataFrame(
            out, columns=[f.name for f in FFD_SCHEMA.fields]
        )

    return docs.groupBy("__grp").applyInPandas(pack, FFD_SCHEMA)


def ffd_invariant_report(packed: DataFrame, context_len: int) -> DataFrame:
    """Hash-matchable verification row for a ``pack_bins_ffd`` layout —
    the oracle pattern for greedy/iterative operators whose exact
    output is not SQL-expressible (the xxhash64 grouping has no DuckDB
    twin): emit (a) exact scalars an oracle recomputes independently
    from the INPUT table — n_docs, total_tokens, the ceil(total/L)
    bin lower bound — and (b) self-checked invariant booleans the
    oracle pins to TRUE. A dropped/duplicated document, an overflowing
    bin, a torn offset chain, or an FFD-property violation each flips
    a column and hash-mismatches. Checked invariants:

    - ``placed_once_ok``  — every packed doc_id appears exactly once
      (with the exact n_docs/total_tokens, this proves completeness
      against the source table);
    - ``no_overflow_ok``  — max per-bin fill <= context_len;
    - ``offsets_ok``      — per bin, offsets start at 0, are distinct,
      and the last span ends exactly at the fill (contiguous layout);
    - ``bins_lb_ok``      — n_bins >= ceil(total_tokens/context_len);
    - ``half_empty_ok``   — first-fit property: within a pack group at
      most ONE bin is <= half empty-capacity full (any two such bins
      contradict first-fit placement).

    All aggregates are bounded (per-bin then per-group then one global
    row) — three shuffles over the layout, none data-proportional in
    output."""
    lit_l = F.lit(int(context_len))
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_in_bin"),
        F.min("bin_offset").alias("min_off"),
        F.max(F.col("bin_offset") + F.col("n_tokens")).alias("max_end"),
        F.countDistinct("bin_offset").alias("n_off"),
    )
    bin_stats = per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.max("fill").alias("max_fill"),
        F.min(
            (F.col("min_off") == 0)
            & (F.col("max_end") == F.col("fill"))
            & (F.col("n_off") == F.col("n_in_bin"))
        ).alias("offsets_ok"),
    )
    half_stats = (
        per_bin.withColumn("grp", F.shiftrightunsigned("bin_id", 32))
        .groupBy("grp")
        .agg(
            F.sum((F.col("fill") * 2 <= lit_l).cast("int")).alias("n_half")
        )
        .agg(F.max("n_half").alias("max_half_per_grp"))
    )
    doc_stats = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_distinct_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return (
        doc_stats.crossJoin(bin_stats)
        .crossJoin(half_stats)
        .select(
            "n_docs",
            "total_tokens",
            F.ceil(F.col("total_tokens") / lit_l).alias("min_bins"),
            (F.col("n_bins") >= F.ceil(F.col("total_tokens") / lit_l)).alias(
                "bins_lb_ok"
            ),
            (F.col("n_docs") == F.col("n_distinct_docs")).alias(
                "placed_once_ok"
            ),
            (F.col("max_fill") <= lit_l).alias("no_overflow_ok"),
            "offsets_ok",
            (F.col("max_half_per_grp") <= 1).alias("half_empty_ok"),
        )
    )


def fill_report(packed: DataFrame, context_len: int) -> DataFrame:
    """One row of packing efficiency for a ``pack_bins_ffd`` layout:
    n_bins / n_docs / total_tokens / fill_rate (fraction of bin capacity
    carrying real tokens). One aggregate, no shuffle beyond it."""
    return packed.agg(
        F.countDistinct("bin_id").alias("n_bins"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum("n_tokens")
            / (F.countDistinct("bin_id") * F.lit(context_len)),
            6,
        ).alias("fill_rate"),
    )
