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


def seed_near_dup_index(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
) -> None:
    """Initialize the streaming LSH band index with the seed corpus's
    (id, band_key) rows as the ``batch_id=-1`` partition — the
    ``seed_corpus`` twin for the near-dup path. Same band parameters
    must be passed to ``start_ingest_near_dedup``."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        band_key_rows,
    )

    (
        band_key_rows(docs, id_col, text_col, n, k, bands)
        .withColumn("batch_id", F.lit(-1))
        .write.partitionBy("batch_id")
        .mode("overwrite")
        .parquet(index_path)
    )


def start_ingest_near_dedup(
    stream_docs: DataFrame,
    corpus_path: str,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.4,
    bloom_bits: int | str | None = "auto",
    available_now: bool = True,
) -> StreamingQuery:
    """Deduplicating ingest that also drops NEAR-duplicates (VERDICT r7
    #5): per micro-batch —

    1. exact dedup against corpus + within batch (the
       ``start_ingest_dedup`` Bloom-prefiltered anti-join);
    2. LSH probe of the exact survivors against the PERSISTED band
       index (``seed_near_dup_index`` layout): batch band keys are
       computed map-side and joined against the accumulated index —
       candidates verified with exact shingle Jaccard against the
       candidate corpus docs only (ids broadcast; the corpus is
       column-pruned-scanned, never shuffled), so a rephrased
       near-copy is dropped, not just a byte-identical one;
    3. within-batch near-dup clustering (``near_dup_clusters``,
       batch-sized) keeps each cluster's smallest id;
    4. survivors append to the corpus AND their band rows append to
       the index, both as the batch's own dynamic-overwrite partition
       — a retried batch REPLACES its partitions in corpus and index
       alike, keeping the replay idempotent (the exact-path
       contract, extended to the index).

    The index read excludes the current batch's partition for the same
    partial-write reason as the corpus read. At 100 TB the per-batch
    cost is bounded by batch size: band computation is map-only, the
    index join's batch side is tiny, and verification touches only
    candidate rows."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        band_key_rows,
        incremental_ingest,
        near_dup_clusters,
        shingle_sets,
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession

        def read_excluding(path: str, cols: list[str]) -> DataFrame | None:
            try:
                return (
                    spark.read.parquet(path)
                    .filter(F.col("batch_id") != F.lit(batch_id))
                    .select(*cols)
                )
            except AnalysisException as e:
                msg = str(e)
                if ("PATH_NOT_FOUND" not in msg
                        and "Path does not exist" not in msg):
                    raise
                return None

        existing = read_excluding(corpus_path, [id_col, text_col])
        if existing is None:
            existing = spark.createDataFrame(
                [], batch.select(id_col, text_col).schema
            )
        kept = incremental_ingest(
            batch, existing, id_col=id_col, text_col=text_col,
            bloom_bits=bloom_bits,
        )
        keepers = kept.select(F.col("keep_id").alias(id_col))
        out = batch.join(F.broadcast(keepers), id_col, "left_semi")

        # 2. near-dup probe against the persisted band index
        idx = read_excluding(index_path, [id_col, "band_key"])
        if idx is not None:
            qb = band_key_rows(out, id_col, text_col, n, k, bands).select(
                F.col(id_col).alias("__in_id"), "band_key"
            )
            cand = (
                idx.select(F.col(id_col).alias("__corpus_id"), "band_key")
                .join(qb, "band_key")
                .filter(F.col("__in_id") != F.col("__corpus_id"))
                .select("__in_id", "__corpus_id")
                .distinct()
            )
            corp_docs = existing.join(
                F.broadcast(cand.select("__corpus_id").distinct()),
                existing[id_col] == F.col("__corpus_id"),
                "left_semi",
            )
            in_sets = shingle_sets(out, id_col, text_col, n).select(
                F.col(id_col).alias("__in_id"),
                F.col("sh_arr").alias("__sh_in"),
            )
            co_sets = shingle_sets(corp_docs, id_col, text_col, n).select(
                F.col(id_col).alias("__corpus_id"),
                F.col("sh_arr").alias("__sh_co"),
            )
            common = F.size(F.array_intersect("__sh_in", "__sh_co"))
            jac = common / (
                F.size("__sh_in") + F.size("__sh_co") - common
            )
            near_dup_ids = (
                cand.join(in_sets, "__in_id")
                .join(co_sets, "__corpus_id")
                .filter(F.round(jac, 6) >= F.lit(float(threshold)))
                .select(F.col("__in_id").alias(id_col))
                .distinct()
            )
            out = out.join(F.broadcast(near_dup_ids), id_col, "left_anti")

        # 3. within-batch near-dup clusters: keep each cluster's min id
        clusters = near_dup_clusters(
            out, id_col, text_col, n=n, k=k, bands=bands,
            threshold=threshold,
        )
        drop_in_batch = clusters.filter(~F.col("keep")).select(id_col)
        out = out.join(F.broadcast(drop_in_batch), id_col, "left_anti")

        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(corpus_path)
        )
        (
            band_key_rows(out, id_col, text_col, n, k, bands)
            .withColumn("batch_id", F.lit(batch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(index_path)
        )

    writer = stream_docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
