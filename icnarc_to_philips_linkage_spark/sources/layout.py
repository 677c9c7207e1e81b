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
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


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
