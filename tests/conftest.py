from __future__ import annotations

import tempfile

import pytest

from icnarc_to_philips_linkage_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


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
