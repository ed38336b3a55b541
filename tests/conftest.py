from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from hse_etl_ochirov_aldar_spark.session import get_spark

    s = get_spark(app_name="engine-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _drop_query_caches(request):
    """QUERIES contract (queries.py): entries that persist() a rollup
    rely on the consumer clearing cache between entries — do it after
    every test so a session-scoped SparkSession never accumulates
    cached relations across the suite."""
    yield
    if "spark" in request.fixturenames:
        try:
            request.getfixturevalue("spark").catalog.clearCache()
        except Exception:
            pass


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
