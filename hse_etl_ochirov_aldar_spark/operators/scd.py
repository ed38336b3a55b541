"""Slowly-changing-dimension Type 2 history construction.

The warehouse-side twin of the reference's keep-newest upsert
(HW-4/airflow/dags/iot_temperature.py:209-216): instead of OVERWRITING
each key with its latest version, every version becomes a validity
interval — ``valid_from`` (its own timestamp), ``valid_to`` (the next
version's timestamp, NULL while current), ``is_current``. Point-in-time
joins against the history then answer "what did this dimension row look
like when the fact happened" (the as-of join in operators/asof.py is
the query-side counterpart).

Scale shape (100 TB): ONE shuffle on the dimension key; the interval
columns are a single ``lead`` window per key ordered by the version
timestamp (tie-break on a caller-supplied unique column so concurrent
versions order deterministically). Dimension tables are the small side
of a warehouse — this never touches facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    version_ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``df`` + ``valid_from`` / ``valid_to`` / ``is_current`` columns:
    each row is valid from its own version timestamp until the next
    version of the same key (exclusive), the last version being
    current (``valid_to`` NULL). Rows with a NULL version timestamp
    are dropped (a version without a time cannot be intervalized)."""
    order = [F.col(version_ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(version_ts_col).over(w)
    return (
        df.where(F.col(version_ts_col).isNotNull())
        .withColumn("valid_from", F.col(version_ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
