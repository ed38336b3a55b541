"""SQL facade: register the testdata tables as temp views so users run
plain ``spark.sql`` — the reference's interface is SQL strings inside
Airflow operators (HW-3/airflow/dags/iot_temperature.py:48-98,
final-module-3/airflow/dags/build_analytical_marts.py:28-124), so a
migrating user's first step is pointing their existing SQL at Spark.

Views are lazy plan aliases over ``load_table`` (parquet scans with the
events-timestamp normalization applied), so Catalyst sees the same
pruned/pushed-down scans the DataFrame catalog gets — registering views
costs nothing until a query runs, and ANSI-portable SQL (explicit CASTs,
TIMESTAMP literals, no engine-specific operators) produces identical
results on Spark and DuckDB, which q_sql_passthrough_revenue proves by
running ONE shared SQL string as both the query and its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .readers import load_table

ALL_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] | list[str] = ALL_TABLES,
) -> None:
    """Create (or replace) one temp view per table name."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql_query(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run a SQL string against the registered testdata views."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
