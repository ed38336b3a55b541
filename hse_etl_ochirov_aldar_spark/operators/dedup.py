"""Keyed deduplication (SURVEY.md A6, S6, S9).

Reference semantics: Mongo ``$group {_id: key, doc: {$first: $$ROOT}}`` +
``$replaceRoot`` (mongo_to_postgres_replication.py:35-39,77-81) — keep an
*arbitrary* first document per key — and Postgres
``ON CONFLICT DO NOTHING`` first-writer-wins inserts (:61,103,134,168,202).

We provide both the arbitrary-first (cheapest: ``dropDuplicates``) and a
deterministic keep-first (rank by an explicit ordering), defaulting to
deterministic so tests and the DuckDB oracle are stable (SURVEY §4
caution 3).

Scale: both forms are a single hash-shuffle on the key columns.
``dropDuplicates`` plans as partial+final ``first()`` aggregate (map-side
combine); the deterministic variant is a window but Spark 4 plans
rank-filter windows with partial pre-filtering under AQE. Skewed keys are
handled by AQE skew-join/partition splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key.

    ``order_cols`` given -> deterministic keep-first (smallest by the
    ordering); omitted -> arbitrary-first, matching Mongo's unordered
    ``$first`` at minimal cost.
    """
    if not order_cols:
        return df.dropDuplicates(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
