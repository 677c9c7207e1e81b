"""Streaming corpus ingest: the continuous-feed twin of the batch
``dedup_scale.incremental_ingest`` operator.

A training corpus fed by a document stream must drop, per micro-batch,
(a) documents whose content already exists in the accumulated corpus and
(b) duplicates within the batch — WITHOUT rescanning-and-shuffling the
full corpus against every tiny batch. ``foreachBatch`` hands each
micro-batch to the batch operator, which builds a Bloom filter over the
BATCH side's content digests (small by definition) and folds it into the
plan as a literal predicate pruning the corpus side before the anti
join's exchange — the corpus is scanned but never shuffled for rows that
cannot match the batch (same side selection as Spark's runtime filters;
false positives ride through to the exact anti join, so correctness is
unconditional).

Survivors append to the corpus as a ``batch_id=N`` partition written
with dynamic partition overwrite: a micro-batch retried after a partial
write REPLACES its own partition instead of duplicating it — the
standard idempotent-``foreachBatch`` layout (checkpointed batch ids +
deterministic per-batch output location). Batches run sequentially, so
batch N+1's corpus read sees batch N's appends.

At 100 TB the corpus side stays a digest-only projection (column-pruned
parquet scan) and the per-batch shuffle is bounded by the batch size,
not the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
    incremental_ingest,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("source", StringType(), True),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over a documents-shaped directory (streams
    cannot infer schemas; this pins the testdata documents shape)."""
    return spark.readStream.format(fmt).schema(DOCS_SCHEMA).load(path)


def seed_corpus(docs: DataFrame, corpus_path: str) -> None:
    """Initialize the corpus directory with pre-existing documents as
    the ``batch_id=-1`` partition, so seed and stream appends share one
    partitioned layout."""
    (
        docs.withColumn("batch_id", F.lit(-1))
        .write.partitionBy("batch_id")
        .mode("overwrite")
        .parquet(corpus_path)
    )


def start_ingest_dedup(
    stream_docs: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_bits: int | str | None = "auto",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the deduplicating ingest: per micro-batch, run the
    Bloom-prefiltered ``incremental_ingest`` against the current corpus
    and append the surviving documents (full rows, keeper ids) as the
    batch's own partition. Returns the StreamingQuery.

    ``available_now=True`` gives batch-backfill semantics: process
    everything currently in the source, then stop — restarting with the
    same checkpoint resumes at the next unseen file (the two-batch test
    drives exactly that)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        try:
            # Exclude THIS batch's own partition from the corpus read:
            # a micro-batch retried after a partial write would
            # otherwise dedup against its own partial output and then
            # dynamic-overwrite its partition with only the remainder —
            # deleting the documents that had already become visible.
            existing = (
                spark.read.parquet(corpus_path)
                .filter(F.col("batch_id") != F.lit(batch_id))
                .select(id_col, text_col)
            )
        except AnalysisException as e:
            # ONLY the missing-path case means "fresh corpus"; any
            # other read failure (corrupt footer, transient FS error)
            # must fail the batch, not silently disable dedup.
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            existing = spark.createDataFrame(
                [], batch.select(id_col, text_col).schema
            )
        kept = incremental_ingest(
            batch,
            existing,
            id_col=id_col,
            text_col=text_col,
            bloom_bits=bloom_bits,
        )
        keepers = kept.select(F.col("keep_id").alias(id_col))
        out = batch.join(F.broadcast(keepers), id_col, "left_semi")
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(corpus_path)
        )

    writer = stream_docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
