"""Streaming drift monitor: the continuous twin of the batch
``operators.drift.psi_report``.

Ingest monitoring in production is a stream question — "did THIS
micro-batch drift from the reference distribution?" — so each batch is
scored against a fixed reference slice with the SAME PSI/binned-KS
math as the batch operator (``foreachBatch`` delegates to
``drift.psi_report``, so the two can never diverge), and one summary
row per batch is appended to a parquet log:

    (batch_id, n_ref, n_batch, psi_total, ks_stat)

Idempotency follows the repo's foreachBatch convention: each batch
writes its own ``batch_id=N`` partition with dynamic partition
overwrite, so a retried batch replaces rather than duplicates its row.

Scale notes: the per-batch cost is one pass over the batch (bounded by
trigger size) plus one pass over the reference slice. A 100 TB
deployment freezes the reference ONCE — pass a pre-aggregated
``ref_counts`` frame (bucket, n_ref; ``reference_counts`` builds it) so
the per-batch reference cost is ``bins`` rows, not a rescan. The
monitor accepts either form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from icnarc_to_philips_linkage_spark.operators import drift


def reference_counts(
    ref: DataFrame, value_col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """Pre-aggregated reference histogram: (bucket, n_ref). Compute
    once, persist or collect — ``bins`` rows regardless of data size."""
    return (
        ref.select(
            drift.bucketize(
                F.col(value_col).cast("double"), lo, hi, bins
            ).alias("bucket")
        )
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )


def _psi_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    bins: int,
    eps: float,
) -> DataFrame:
    """PSI/KS from two (bucket, count) histograms — the same math as
    ``drift._psi_from_tagged`` but starting from pre-bucketed counts
    (full-outer join on bucket; absent buckets count 0)."""
    counts = (
        ref_counts.withColumnRenamed("n_ref", "__r")
        .join(cur_counts.withColumnRenamed("n_cur", "__c"), "bucket", "full")
        .select(
            "bucket",
            F.coalesce("__r", F.lit(0)).alias("n_ref"),
            F.coalesce("__c", F.lit(0)).alias("n_cur"),
        )
    )
    return drift.psi_from_bucket_counts(counts, bins, eps)


def start_drift_monitor(
    stream_df: DataFrame,
    ref_counts: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    out_path: str,
    checkpoint: str,
    bins: int = 10,
    eps: float = 0.5,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Score every micro-batch against the reference histogram and
    append one (batch_id, n_ref, n_batch, psi_total, ks_stat) row to a
    ``batch_id``-partitioned parquet log."""
    def _score(batch: DataFrame, batch_id: int) -> None:
        cur = (
            batch.select(
                drift.bucketize(
                    F.col(value_col).cast("double"), lo, hi, bins
                ).alias("bucket")
            )
            .filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_cur"))
        )
        rep = _psi_from_counts(ref_counts, cur, bins, eps)
        row = rep.agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_batch"),
            F.max("psi_total").alias("psi_total"),
            F.max("ks_stat").alias("ks_stat"),
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        # per-write dynamic overwrite (NOT a session-wide conf change:
        # mutating the session setting would leak into unrelated writes
        # and a later 'static' reset would make this overwrite delete
        # the whole log directory)
        (
            row.write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(out_path)
        )

    writer = (
        stream_df.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_oov_monitor(
    stream_df: DataFrame,
    vocab: DataFrame,
    text_col: str,
    out_path: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Streaming vocabulary-fit monitor: the continuous twin of
    ``operators.text.vocab_coverage``. Each micro-batch's token
    occurrences are scored against a FROZEN vocabulary (built once
    with ``text.top_k_vocab``, ~k rows — broadcast per batch) and one
    summary row appends to a ``batch_id``-partitioned parquet log:

        (batch_id, n_docs, total_tokens, oov_tokens, oov_rate)

    An ingest feed whose OOV rate drifts up is changing language,
    domain, or encoding under the committed tokenizer — the earliest
    cheap signal that the planned vocab no longer fits the stream.
    Same idempotency convention as ``start_drift_monitor``: a retried
    batch overwrites its own partition, never duplicates it.
    """
    from icnarc_to_philips_linkage_spark.operators.text import tokens

    vocab_flagged = vocab.select(
        F.col("token").alias("__tok"), F.lit(True).alias("__in")
    )

    def _score(batch: DataFrame, batch_id: int) -> None:
        occ = batch.select(F.explode(tokens(text_col)).alias("__tok"))
        row = (
            occ.join(F.broadcast(vocab_flagged), "__tok", "left")
            .agg(
                F.count(F.lit(1)).alias("total_tokens"),
                F.coalesce(
                    F.sum(F.col("__in").isNull().cast("long")), F.lit(0)
                ).alias("oov_tokens"),
            )
            .crossJoin(batch.agg(F.count(F.lit(1)).alias("n_docs")))
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "n_docs",
                "total_tokens",
                "oov_tokens",
                F.round(
                    F.col("oov_tokens")
                    / F.greatest(F.col("total_tokens"), F.lit(1)),
                    6,
                ).alias("oov_rate"),
            )
        )
        (
            row.write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(out_path)
        )

    writer = (
        stream_df.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
