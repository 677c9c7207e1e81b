"""Data-layout writers for scan efficiency at scale.

Parquet row-group min/max statistics prune reads only when the data is
clustered on the filter column. These writers produce that clustering:

- ``write_range_sorted``: range-partition + sort-within-partitions on
  the given columns before writing — queries filtering on a sorted
  column skip whole files/row-groups via footer statistics. The 100 TB
  version of "add an index".
- ``write_hive_partitioned``: directory partitioning for categorical /
  date columns — partition pruning eliminates directories before any
  I/O happens.
- ``write_zordered``: Z-order (Morton-curve) clustering on TWO columns
  — a single-column sort gives perfect skipping on one dimension and
  none on the other; bit-interleaving rank-normalized values keeps
  every file's min/max envelope tight on BOTH, so filters on either
  column (or both) prune row groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def _zorder_value(bits: int) -> Column:
    """Morton interleave of the normalized cell ids ``__ca``/``__cb``
    (bit i of each lands at output bits 2i / 2i+1). Pure Catalyst
    ``aggregate`` fold — map-side, codegen'd, no Python."""
    return F.expr(
        f"""
        aggregate(sequence(0, {bits - 1}), 0L,
                  (acc, i) -> acc
                    | shiftleft(shiftright(__ca, i) & 1L, 2 * i)
                    | shiftleft(shiftright(__cb, i) & 1L, 2 * i + 1))
        """
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster on the Z-order curve over (``col_a``, ``col_b``) and
    write ``n_files`` parquet files.

    Both columns are min-max normalized into 2^``bits`` cells (one
    broadcast agg pass — at 100 TB, sample or use catalog stats
    instead), bit-interleaved into a single Morton key, then
    range-partitioned + sorted on that key. NULLs in either column sort
    first (cell 0). The curve key is dropped before writing — layout is
    the only product."""
    mm = df.agg(
        F.min(col_a).cast("double").alias("__mna"),
        F.max(col_a).cast("double").alias("__mxa"),
        F.min(col_b).cast("double").alias("__mnb"),
        F.max(col_b).cast("double").alias("__mxb"),
    )

    def cell(c: str, mn: str, mx: str) -> Column:
        span = F.col(mx) - F.col(mn)
        p = F.when(span <= 0, F.lit(0.0)).otherwise(
            (F.col(c).cast("double") - F.col(mn)) / span
        )
        return F.coalesce(
            F.least(
                F.floor(p * F.lit(float(2**bits))).cast("long"),
                F.lit(2**bits - 1),
            ),
            F.lit(0),
        )

    (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__ca", cell(col_a, "__mna", "__mxa"))
        .withColumn("__cb", cell(col_b, "__mnb", "__mxb"))
        .withColumn("__z", _zorder_value(bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ca", "__cb", "__z", "__mna", "__mxa", "__mnb", "__mxb")
        .write.mode(mode)
        .parquet(path)
    )


def file_fragmentation_report(spark, path: str):
    """(n_files, total_bytes, avg_file_bytes, min_file_bytes,
    partitioned) for a parquet dataset — the small-file health check.
    Many tiny files mean task-scheduling overhead dominates the scan
    (each file is at least one split) and footer reads swamp data
    reads; the fix is ``compact_parquet``. Metadata listing only — no
    data read. RECURSIVE, so hive-partitioned layouts (files under
    ``col=value/`` subdirectories) are sized correctly; ``partitioned``
    reports whether any such directory level was seen."""
    from pyspark.sql import Row

    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)  # recursive
    sizes, partitioned = [], False
    base = fs.makeQualified(jpath).toString().rstrip("/")
    while it.hasNext():
        f = it.next()
        p = f.getPath()
        if not p.getName().endswith(".parquet"):
            continue
        sizes.append(f.getLen())
        rel = p.toString()[len(base):].lstrip("/")
        if "/" in rel and "=" in rel.rsplit("/", 1)[0]:
            partitioned = True
    n = len(sizes)
    return Row(
        n_files=n,
        total_bytes=sum(sizes),
        avg_file_bytes=(sum(sizes) // n) if n else 0,
        min_file_bytes=min(sizes) if n else 0,
        partitioned=partitioned,
    )


def compact_parquet(
    spark,
    src_dir: str,
    dest_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Rewrite a fragmented parquet directory into ~target-sized files:
    output partition count = ceil(total_bytes / target_file_bytes),
    sized from the source's actual on-disk footprint (metadata listing,
    not a data pass). Optionally range-sorts on ``sort_cols`` while
    rewriting — compaction is the natural moment to also fix clustering
    (min/max envelopes tighten for free).

    The small-file problem is THE recurring operational issue of
    long-running ingestion at scale: every micro-batch lays down a few
    files per partition, and a year later the table is millions of
    KB-sized files. One narrow rewrite (repartition exchange, no
    aggregation state) restores scan health. Writes to ``dest_dir``
    (caller swaps atomically — pointer-dir pattern as in cdc_apply);
    returns the partition count used."""
    stats = file_fragmentation_report(spark, src_dir)
    if stats.n_files == 0:
        raise ValueError(f"no parquet files under {src_dir!r}")
    if stats.partitioned:
        # a flat rewrite would silently DROP the hive partitioning (and
        # its pruning); compact each partition directory instead
        raise ValueError(
            f"{src_dir!r} is hive-partitioned; compact each partition "
            f"directory separately to preserve the layout"
        )
    n_parts = max(1, -(-stats.total_bytes // target_file_bytes))
    df = spark.read.parquet(src_dir)
    if sort_cols:
        df = df.repartitionByRange(n_parts, *[F.col(c) for c in sort_cols])
        df = df.sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n_parts)
    df.write.mode("overwrite").parquet(dest_dir)
    return n_parts
