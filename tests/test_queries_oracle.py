"""Every catalog query with an oracle must match DuckDB on the same
parquet tables — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from hse_etl_ochirov_aldar_spark.queries import ORACLES, QUERIES

from .oracle_utils import assert_matches_oracle, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, con, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_runs_nonempty(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
