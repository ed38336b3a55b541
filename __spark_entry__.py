"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``hse_etl_ochirov_aldar_spark`` (see
SURVEY.md for the operator inventory this catalog covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hse_etl_ochirov_aldar_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query.

    Every deterministic catalog query has an oracle entry (round 3
    closed the last such residual: multimodal decode parses real PPM
    bytes whose features are SQL-predictable). The only rows-only
    entries are the two DELIBERATE sketch-based escape hatches added in
    round 4 (``clean_percentile_trim_approx``,
    ``ngram_diversity_approx``): their estimates are engine-specific by
    design, and the repo suite asserts their tolerance against the
    exact twins instead.
    """
    return dict(ORACLES)
