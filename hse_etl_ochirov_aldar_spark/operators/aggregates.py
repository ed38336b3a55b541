"""Aggregation operators (SURVEY.md §2.4 A1, A3-A5, A7-A8).

All are plain ``groupBy().agg()`` programs: Catalyst plans them as
partial (map-side combine) + final aggregation, so the shuffle carries
pre-aggregated state, not raw rows — the property that makes these
scale-safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import avg_units_expr, units_sum


def daily_avg(
    df: DataFrame,
    day_col: str = "day",
    value_col: str = "value",
    scale: int = 2,
) -> DataFrame:
    """A1: ``SELECT day, AVG(v) ... GROUP BY day``
    (HW-3/airflow/dags/iot_temperature.py:75-78), plus a reading count.

    Rounded to ``scale`` decimals like the reference's mart aggregates.
    The average runs in exact integer units (functions/exact.py) so the
    rounded value is engine-independent — no float half-case drift.
    """
    return (
        df.groupBy(day_col)
        .agg(
            units_sum(value_col).alias("_s_value"),
            F.count(F.lit(1)).alias("n_readings"),
        )
        .select(
            day_col,
            avg_units_expr("_s_value", "n_readings", 2, scale).alias("avg_value"),
            "n_readings",
        )
    )


def mode_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """A7: per-group mode (most frequent value) via count + rank.

    Reference: build_analytical_marts.py:41-49 —
    ``ROW_NUMBER() OVER (PARTITION BY user,month ORDER BY COUNT(*) DESC)``
    then keep rn=1. The reference has NO tie-break (nondeterministic,
    SURVEY §4 caution 3); we add ``value ASC`` so results are stable and
    oracle-comparable — an intentional semantics-tightening deviation.

    Two shuffles, both sort-free partial aggregates: groupBy(group+value)
    with map-side combine, then ``min(struct(-cnt, value))`` per group —
    struct ordering is lexicographic field-by-field, so the min is
    exactly cnt DESC then value ASC, the window rank's tie-break,
    without any Window/Sort node. Replacing the row_number window with
    this aggregate measured ~3x on mart_user_activity's warm path
    (PERF.md r6): every Exchange carries combiner-reduced rows and no
    stage sorts. Both inputs are |distinct(group,value)| rows, not raw
    rows, so the final stage is cheap even at 100 TB raw input.
    """
    out_col = out_col or f"top_{value_col}"
    counted = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counted.groupBy(*group_cols)
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("_neg_cnt"),
                    F.col(value_col).alias("v"),
                )
            ).alias("_mode")
        )
        .select(*group_cols, F.col("_mode.v").alias(out_col))
    )


def conditional_count(predicate: Column) -> Column:
    """A4: ``COUNT(*) FILTER (WHERE pred)`` (build_analytical_marts.py:113-116)."""
    return F.count(F.when(predicate, F.lit(1)))
