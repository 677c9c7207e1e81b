"""Iterative graph analytics as DataFrame fixpoint loops.

The engine's connected-components (dedup_scale, min-label propagation)
covers the clustering side; this module adds PageRank — the canonical
"Spark does iterative graph" workload (co-purchase importance, kNN-
graph centrality for corpus curation, link spam screens).

Design for 100 TB:
- Each iteration is ONE edge-join + ONE aggregation — the classic
  message-passing shape; k iterations = k passes, no driver-side data.
- The iteration count is FIXED (power iteration with explicit k), so
  the lineage is a bounded plan, checkpointed every few steps to stop
  Catalyst re-analysis cost growing with k.
- Determinism across engines: per-edge contributions are rounded to
  12dp and summed as exact decimal(22,12), and the damped update is
  rounded again — so each iteration's output is a bit-exact decimal
  table and float summation order can never drift the ranks. The
  DuckDB oracle replays the identical unrolled iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 2,
    broadcast_node_limit: int = 1_000_000,
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list (pass both
    directions for an undirected walk). Dangling mass (nodes with no
    out-edges) is dropped, teleport keeps every node alive — ranks
    then sum to < 1, the usual simplification; mirror it when
    comparing. Returns (node, rank) with rank a decimal(22,12).

    Scale shape per iteration: edges ⋈ ranks on src (one shuffle on
    src), aggregate contributions by dst (one shuffle on dst), left
    join back to the node set so in-degree-0 nodes keep the teleport
    term. N (node count) folds in as a literal — one scalar aggregate
    at plan build, like the timeseries bound collects."""
    # loop invariants pinned ONCE: e/nodes/outdeg feed every iteration
    # (10+ consumers for k=5) — without the eager materialization the
    # edge distinct and degree aggregation re-run per iteration and the
    # whole run costs k× what it should (GraphX caches its edge RDD for
    # exactly this reason). localCheckpoint also truncates the lineage
    # so plan analysis stays O(1) in k.
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast("decimal(22,12)"))
    outdeg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    # raw IEEE quotient — the single round happens inside the damped
    # update so an oracle reproducing the expression tree stays exact
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn(
        "rank", F.lit(round(1.0 / n, 12)).cast("decimal(22,12)")
    )
    # rank/degree tables are |nodes|-sized; when they fit (the common
    # case — node sets are orders of magnitude smaller than edge sets)
    # broadcasting them makes each iteration's edge join MAP-SIDE: the
    # edge table never shuffles, only the per-dst combine does. Past
    # the limit (billion-node graphs) fall back to shuffle joins.
    bc = (lambda df: F.broadcast(df)) if n <= broadcast_node_limit else (
        lambda df: df
    )
    for i in range(iterations):
        contrib = (
            e.join(bc(ranks), e["src"] == ranks["node"])
            .join(bc(outdeg), "src")
            .select(
                "dst",
                # divide in DOUBLE (exact decimal inputs → identical
                # IEEE quotient in any engine), round, then back to
                # exact decimal for the order-independent sum —
                # decimal/int division rounding rules differ between
                # engines, double division does not
                F.round(
                    F.col("rank").cast("double") / F.col("outdeg"), 12
                )
                .cast("decimal(22,12)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            # contrib is <= |nodes| rows — same broadcast rule as ranks
            nodes.join(bc(contrib), nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("in_sum"),
                        F.lit(0).cast("decimal(22,12)"),
                    ).cast("double"),
                    12,
                )
                .cast("decimal(22,12)")
                .alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # bounded-lineage checkpoint: keeps analysis cost O(1) per
            # iteration instead of O(i); an eager local materialization
            # of |nodes| rows
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
