"""Top-k extremes with deterministic tie-break (SURVEY.md W1, T1, U2).

Reference: HW-3/airflow/dags/iot_temperature.py:81-98 — top-5 hottest and
top-5 coldest days, each with a rank column, inserted into one table with
a ``kind`` discriminator.

Spark-first design: the reference ranks with an *unpartitioned*
``ROW_NUMBER()`` (single-task window). We instead use
``orderBy().limit(k)``, which Spark plans as ``TakeOrderedAndProject`` —
each partition computes a local top-k, the driver merges k*num_partitions
candidates. No global sort, no single-task window; survives any input
size. The rank column is then attached to just k rows (trivial window on
k rows, explicitly acceptable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_extremes(
    daily: DataFrame,
    value_col: str = "avg_value",
    day_col: str = "day",
    k: int = 5,
) -> DataFrame:
    """Union of top-k 'hot' (desc) and top-k 'cold' (asc) rows, ranked.

    Tie-break: day ASC, matching the reference's
    ``ORDER BY avg_temp DESC, day ASC`` (HW-3/...:85).
    """

    def one_side(kind: str, value_order) -> DataFrame:
        top = daily.orderBy(value_order, F.asc(day_col)).limit(k)
        w = Window.orderBy(value_order, F.asc(day_col))
        return top.withColumn("rank", F.row_number().over(w)).withColumn(
            "kind", F.lit(kind)
        )

    hot = one_side("hot", F.desc(value_col))
    cold = one_side("cold", F.asc(value_col))
    return hot.unionByName(cold)
