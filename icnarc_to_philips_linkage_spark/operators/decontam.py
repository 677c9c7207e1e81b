"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (the n-gram overlap check used
by GPT-3/PaLM/Llama data cards, typically n around 8-13): any training
document containing a long-enough n-gram from a held-out benchmark is
contaminated — it would leak eval answers into the training corpus.

Scale design: both sides reduce to DISTINCT word-n-gram sets (map-side
explode, the same ``shingles`` machinery the dedup family uses). The
benchmark side is tiny by construction (eval sets are thousands of
documents, not billions), so its distinct gram set broadcasts and the
overlap test is a broadcast semi/inner join — the 100 TB training side
never shuffles. With ``broadcast_bench=False`` the same plan degrades
gracefully to a shuffled equi-join on the gram (for oversized
"benchmark" sides, e.g. held-out corpus splits).

No Python UDFs anywhere; gram construction is the higher-order
``shingles`` expression, engine-portable for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators.text import shingles, tokens


def _doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram) distinct word-n-grams per document. Documents shorter
    than n tokens contribute their whole text as one gram (matching the
    dedup family's short-document convention)."""
    return df.select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).select(F.col(id_col), F.explode(shingles("__t", n)).alias("gram"))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-contaminated-training-document report: (id, n_shared_grams)
    for every training document sharing at least one word n-gram with
    the benchmark set. Clean documents are absent (filter semantics —
    re-attach with a left join for a flag column)."""
    tr = _doc_grams(train, id_col, text_col, n)
    be = _doc_grams(bench, id_col, text_col, n).select("gram").distinct()
    if broadcast_bench:
        be = F.broadcast(be)
    return (
        tr.join(be, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training rows with every contaminated document removed — the
    anti-join of ``train`` against the contamination report. Column set
    passes through unchanged."""
    bad = contamination_report(
        train, bench, id_col, text_col, n, broadcast_bench
    ).select(id_col)
    return train.join(bad, id_col, "left_anti")
