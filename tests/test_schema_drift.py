"""Schema-drift canaries (VERDICT r2 item 2).

Round 2 regressed because the driver regenerated ``events.parquet`` with
a plain ``timestamp[us]`` (TIMESTAMP_NTZ) ``ts`` column and every
``unix_micros(ts)`` call site started throwing at ANALYSIS time — which
nothing in-repo caught before the driver did. Two guards:

1. every registered query must *analyze* against whatever dtypes the
   testdata parquet actually has (``df.schema`` touch — no execution),
   failing with a one-line message naming the query;
2. the events loader + ts-family queries must produce IDENTICAL results
   when ``ts`` is physically stored as any of {bigint nanos,
   timestamp[us] (NTZ), timestamp[us] UTC} — the three encodings a
   parquet writer plausibly emits for event time.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

# registry-wide analysis sweep + events-encoding matrix: the heavy lane
pytestmark = pytest.mark.slow

from icnarc_to_philips_linkage_spark.plans.registry import all_queries
from icnarc_to_philips_linkage_spark.plans.tables import load
from tests.conftest import SF_SMOKE

_QUERIES = all_queries()

# Queries whose *construction* runs driver-side jobs (iterative /
# adaptive algorithms) — executed fully by test_oracle, skipped here
# where the point is cheap analysis-only coverage.
_BUILD_EXECUTES = {
    "cluster_kmeans",
    "dedup_near_clusters",
    "sim_recall_eval",
    "sim_pq_topk",  # pq_train collects codebooks at construction
    "sim_ivfpq_topk",  # same
    "dedup_incremental",  # bloom_bitmap collects the literal bitmap
    "pack_context_windows",  # prefix-sum partition offsets collect
}


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_analyzes_against_testdata(spark, name):
    if name in _BUILD_EXECUTES:
        pytest.skip("construction executes jobs; covered by test_oracle")
    fn, _ = _QUERIES[name]
    try:
        fn(spark, SF_SMOKE).schema
    except Exception as e:  # noqa: BLE001 — re-raise with the query name
        pytest.fail(f"query {name!r} failed ANALYSIS on {SF_SMOKE}: {e}")


# ts-family queries that read ONLY the events table (so the variant dir
# needs just events.parquet).
_TS_QUERIES = [
    "j6_attach_stay_attribute",
    "dedup_debounce",
    "ts_interval_join",
    "w4_lag_gap",
    "w6_time_range_avg",
    "e14_time_of_day_hist",
]


def _write_events_variant(tmpdir: str, encoding: str) -> str:
    """Rewrite sf0.001 events.parquet with ts in the given encoding."""
    t = pq.read_table(f"{SF_SMOKE}/events.parquet")
    i = t.schema.get_field_index("ts")
    ts = t.column("ts")
    # normalize to tz-naive micros first (source may be any encoding)
    if pa.types.is_integer(ts.type):
        ts = pc.cast(ts, pa.timestamp("ns")).cast(pa.timestamp("us"))
    elif ts.type.tz is not None:
        ts = pc.cast(ts, pa.timestamp("us", tz="UTC")).cast(
            pa.timestamp("us")
        )
    else:
        ts = pc.cast(ts, pa.timestamp("us"))
    if encoding == "bigint_nanos":
        out = pc.cast(pc.cast(ts, pa.timestamp("ns")), pa.int64())
    elif encoding == "timestamp_nanos":
        # parquet TIMESTAMP(NANOS) — what the driver originally wrote;
        # Spark's vectorized reader needs nanosAsLong, exercising the
        # loader's bigint-div path end to end
        out = pc.cast(ts, pa.timestamp("ns"))
    elif encoding == "timestamp_ntz":
        out = ts
    elif encoding == "timestamp_utc":
        out = pc.cast(ts, pa.timestamp("us", tz="UTC"))
    else:  # pragma: no cover
        raise ValueError(encoding)
    d = f"{tmpdir}/{encoding}"
    pq.write_table(t.set_column(i, "ts", out), f"{d}.parquet")
    # load() expects {sf_dir}/events.parquet
    import os

    os.makedirs(d, exist_ok=True)
    os.replace(f"{d}.parquet", f"{d}/events.parquet")
    return d


@pytest.fixture(scope="module")
def ts_query_baseline(spark):
    """Expected rows per ts-family query, collected ONCE from SF_SMOKE
    (not per encoding — 4 encodings × 6 queries would redo this 24×)."""
    return {
        name: sorted(map(tuple, _QUERIES[name][0](spark, SF_SMOKE).collect()))
        for name in _TS_QUERIES
    }


@pytest.mark.parametrize(
    "encoding",
    ["bigint_nanos", "timestamp_nanos", "timestamp_ntz", "timestamp_utc"],
)
def test_ts_encoding_invariance(spark, tmp_path, encoding, ts_query_baseline):
    """The loader must normalize every physical ts encoding to TIMESTAMP
    and every ts-family query must return byte-identical rows."""
    d = _write_events_variant(str(tmp_path), encoding)
    assert dict(load(spark, d, "events").dtypes)["ts"] == "timestamp", (
        f"loader left ts un-normalized for {encoding}"
    )
    for name in _TS_QUERIES:
        fn, _ = _QUERIES[name]
        got = sorted(map(tuple, fn(spark, d).collect()))
        assert got == ts_query_baseline[name], (
            f"{name} differs when events.ts is stored as {encoding}"
        )
