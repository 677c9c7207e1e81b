from __future__ import annotations

import os
import tempfile

import pytest

from icnarc_to_philips_linkage_spark.session import get_spark

# Override with SPARK_GRAFT_TEST_SF to run the oracle differentials at
# another scale — the pre-snapshot runbook step runs them at sf0.01
# (the driver's t2 scale): SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
#   python -m pytest tests/test_oracle.py -q
SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_T2 = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """Two-lane suite (VERDICT r6 #7): modules that sweep the whole
    registry (oracle differentials, physical plans, fingerprints) are
    marked ``slow`` at module level; everything else gets ``fast``
    automatically, so ``pytest -m fast`` is the quick inner loop and
    the bare ``pytest tests/`` run remains the full pre-commit gate."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="engine-tests",
        shuffle_partitions=8,
        extra_conf={
            # static conf: managed-table tests (bucketing) write here
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield s
    s.stop()
