"""Top-k extremes with deterministic tie-break (SURVEY.md W1, T1, U2).

Reference: HW-3/airflow/dags/iot_temperature.py:81-98 — top-5 hottest and
top-5 coldest days, each with a rank column, inserted into one table with
a ``kind`` discriminator.

Spark-first design: both directions are ranked in ONE pass over the
daily aggregate (two row_number windows + an array-explode of the
qualifying (kind, rank) entries). The naive hot.union(cold) shape
re-executes the ENTIRE upstream pipeline — scan, percentile trim,
daily aggregation — once per direction (verified in the physical plan:
four scans of the source). The windows are global single-partition,
which is safe here by construction: their input is the already-reduced
per-day aggregate, bounded by the calendar, not by data volume.
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
    w_hot = Window.orderBy(F.desc(value_col), F.asc(day_col))
    w_cold = Window.orderBy(F.asc(value_col), F.asc(day_col))
    ranked = daily.withColumn("_rh", F.row_number().over(w_hot)).withColumn(
        "_rc", F.row_number().over(w_cold)
    )
    sides = ranked.where((F.col("_rh") <= k) | (F.col("_rc") <= k)).select(
        *daily.columns,
        F.explode(
            F.filter(
                F.array(
                    F.struct(
                        F.col("_rh").alias("rank"), F.lit("hot").alias("kind")
                    ),
                    F.struct(
                        F.col("_rc").alias("rank"), F.lit("cold").alias("kind")
                    ),
                ),
                lambda s: s["rank"] <= k,
            )
        ).alias("_kr"),
    )
    return sides.select(
        *daily.columns, F.col("_kr.rank").alias("rank"), F.col("_kr.kind").alias("kind")
    )
