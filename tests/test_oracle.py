"""Differential correctness: every registered query vs its DuckDB oracle
at sf0.001 (fast inner loop; the driver re-runs the same contract at
sf0.01)."""

from __future__ import annotations

import pytest

from icnarc_to_philips_linkage_spark.plans.registry import all_queries
from tests.conftest import SF_SMOKE

# full-registry differential sweep: the heavy lane
pytestmark = pytest.mark.slow
from tests.oracle_harness import compare, run_oracle

CASES = sorted(all_queries().items())


@pytest.mark.parametrize("name,pair", CASES, ids=[n for n, _ in CASES])
def test_query_matches_oracle(spark, name, pair):
    fn, sql = pair
    df = fn(spark, SF_SMOKE)
    if sql is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    compare(df, run_oracle(sql, SF_SMOKE), name)
