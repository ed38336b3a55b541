"""External-connector surface (S2/S5): the option-building and
partition-planning logic is pure and tested here; actual loads are
probed for the clear-missing-artifact error in this driverless sandbox
(the execution path for reference pipelines remains the parquet
stand-in seam, plans/reference_pipelines.load_table)."""

from __future__ import annotations

from datetime import date

import pytest

from hse_etl_ochirov_aldar_spark.sources.connectors import (
    jdbc_read_options,
    mongo_read_options,
    month_predicates,
    read_jdbc_table,
    read_mongo_collection,
)


def test_jdbc_options_partitioned():
    opts = jdbc_read_options(
        "jdbc:postgresql://db:5432/app", "public.events", "u", "p",
        partition_column="event_id", lower_bound=0, upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "event_id"
    assert opts["numPartitions"] == "64"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["fetchsize"] == "10000"


def test_jdbc_options_partition_args_all_or_nothing():
    with pytest.raises(ValueError, match="together"):
        jdbc_read_options("jdbc:postgresql://db/app", "t", "u", "p",
                          partition_column="id")
    with pytest.raises(ValueError, match="exceed"):
        jdbc_read_options("jdbc:postgresql://db/app", "t", "u", "p",
                          partition_column="id", lower_bound=5,
                          upper_bound=5, num_partitions=2)


def test_month_predicates_disjoint_and_covering():
    preds = month_predicates("session_date", date(2024, 11, 15), date(2025, 2, 1))
    # months of the half-open range [2024-11-15, 2025-02-01)
    assert len(preds) == 3
    assert preds[0] == (
        "session_date >= '2024-11-01' AND session_date < '2024-12-01'"
    )
    assert preds[1].startswith("session_date >= '2024-12-01'")
    assert preds[2] == (
        "session_date >= '2025-01-01' AND session_date < '2025-02-01'"
    )
    # boundaries chain exactly: predicate i's upper == i+1's lower
    for a, b in zip(preds, preds[1:]):
        assert a.split("< '")[1].rstrip("'") == b.split(">= '")[1].split("'")[0]
    with pytest.raises(ValueError):
        month_predicates("d", date(2024, 1, 1), date(2024, 1, 1))


def test_jdbc_read_missing_driver_is_a_clear_error(spark):
    opts = jdbc_read_options("jdbc:postgresql://nohost:5432/app", "t", "u", "p")
    with pytest.raises(RuntimeError, match="JDBC driver"):
        read_jdbc_table(spark, opts)


def test_jdbc_predicates_exclusive_with_bounds(spark):
    opts = jdbc_read_options(
        "jdbc:postgresql://db/app", "t", "u", "p",
        partition_column="id", lower_bound=0, upper_bound=10, num_partitions=2,
    )
    with pytest.raises(ValueError, match="mutually"):
        read_jdbc_table(spark, opts, predicates=["id < 5", "id >= 5"])


def test_mongo_options_push_pipeline_serverside():
    pipeline = [
        {"$sort": {"updated_at": -1}},
        {"$group": {"_id": "$natural_key", "doc": {"$first": "$$ROOT"}}},
    ]
    opts = mongo_read_options(
        "mongodb://m:27017", "app", "user_sessions", pipeline
    )
    assert opts["database"] == "app" and opts["collection"] == "user_sessions"
    assert '"$first"' in opts["aggregation.pipeline"]


def test_mongo_read_missing_connector_is_a_clear_error(spark):
    opts = mongo_read_options("mongodb://nohost:27017", "app", "c")
    with pytest.raises(RuntimeError, match="mongodb datasource"):
        read_mongo_collection(spark, opts)
