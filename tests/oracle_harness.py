"""Local DuckDB-differential harness mirroring the driver's t2 check:
run the Spark query and the oracle SQL on the same parquet tables,
canonicalize (columns sorted by name, rows sorted), compare values.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd

from icnarc_to_philips_linkage_spark.plans.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, dt.datetime):
        return v
    # array cells: DuckDB LIST columns come back as numpy arrays,
    # Spark's as python lists — normalize both to element-normed tuples
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    # numpy scalars → python
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return v
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    a, b = canonicalize(sp), canonicalize(oracle_df)
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not bad, f"{name}: {len(bad)} mismatched rows; first 3: {bad[:3]}"
