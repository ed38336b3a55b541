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

    As of round 5 EVERY catalog entry has an oracle: round 3 closed the
    deterministic residuals (multimodal decode parses real PPM bytes
    whose features are SQL-predictable), and round 5 closed the two
    sketch-based escape hatches by restructuring them into
    guarantee-audit outputs (exact values + verdict booleans the sketch
    must satisfy deterministically) — see
    ``q_clean_percentile_trim_approx`` / ``q_ngram_diversity_approx``.
    A registry test (tests/test_queries_oracle.py) enforces the
    invariant at authoring time.
    """
    return dict(ORACLES)
