"""Calendar gap-fill + forward-fill for per-key daily series.

The warehouse marts the reference builds (final-module-3/airflow/dags/
build_analytical_marts.py:24-138) aggregate per user/day and implicitly
leave holes where a key has no rows that day; every downstream consumer
that charts, diffs, or window-averages those series first regularizes
them onto a dense calendar. This operator does that once, engine-side:

1. span: per key, [min(day), max(day)] — one map-side-combined
   aggregation (O(keys) rows out).
2. grid: ``explode(sequence(d0, d1, interval 1 day))`` — generates the
   dense calendar per key executor-side; output volume is bounded by
   keys x span-days, never by input rows.
3. observed values re-attach with a LEFT join on (key, day).
4. forward fill: ``last(value, ignorenulls=true)`` over a per-key
   window ordered by day — Spark's IGNORE NULLS frame-running variant,
   whole-stage-codegen'd, no UDF.

Scale shape: one aggregation for spans, one (key, day) shuffle for the
join, one key shuffle for the window. The window partitions by KEY, so
a single key's whole span sorts in one task — fine for calendars (a
10-year daily span is 3 653 rows); this operator is for bounded-grid
time series, not for gap-filling event-grain data (do the daily
aggregate FIRST, as the catalog entry does).

Determinism: the fill is a pure function of (key, day)-keyed input —
no rand, no floats beyond the already-rounded value column — so a SQL
oracle reproduces it exactly (DuckDB: generate_series +
last_value(... IGNORE NULLS)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gap_fill_daily", "rolling_median_daily"]


def gap_fill_daily(
    observed: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Densify per-key daily series onto each key's [min, max] calendar
    span and forward-fill ``value_cols`` across the introduced gaps.

    ``observed`` must be daily grain: at most one row per (keys, day) —
    the caller's groupBy guarantees it (violations would make "the
    value that day" ambiguous; this operator does not silently pick).
    Output: keys + day + filled value_cols + ``is_observed`` boolean.
    Leading gaps (before a key's first observation) cannot occur — the
    grid starts at the key's own min(day).
    """
    spans = observed.groupBy(*key_cols).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias(day_col),
    )
    joined = grid.join(
        observed.withColumn("_obs", F.lit(True)), [*key_cols, day_col], "left"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    return joined.select(
        *key_cols,
        day_col,
        *filled,
        F.coalesce(F.col("_obs"), F.lit(False)).alias("is_observed"),
    )


def rolling_median_daily(
    daily: DataFrame,
    key_col: str = "key",
    day_col: str = "day",
    units_col: str = "units",
    days: int = 7,
) -> DataFrame:
    """Exact trailing ``days``-day median per key over a daily series —
    the robust-smoothing twin of the frame AVG (rolling_7d_avg): one
    outlier day barely moves the median where it drags the mean.

    Calendar-aware RANGE frame, not ROWS: the window covers the last
    ``days`` CALENDAR days, so a key with gaps sees fewer values — the
    same semantics as a dashboard's "7-day median". Input must already
    be one row per (key, day) with the value in exact BIGINT units
    (do the daily aggregate first).

    Exactness: the frame's values are collected and sorted
    executor-side (``collect_list`` over the frame + ``array_sort``),
    and the median is the mean of the two middle BIGINTs — integer
    element lookups plus one ``/2.0/scale`` division whose .5 halves
    are exact in binary. No float aggregate, no engine ambiguity.

    Scale shape (100 TB): one key shuffle for the window; frame state
    is <= ``days`` BIGINTs per row (bounded, unlike an unbounded
    collect_list), so memory per task is O(rows_in_partition x days) —
    sized by the DAILY grain, 365 rows per key-year. Whole-stage
    codegen'd JVM expressions throughout; no UDF.

    Output: key, day, n_in_window, median_units (BIGINT doubled-units
    — exact), median_value (DOUBLE convenience, units/2/100).
    """
    day_num = F.datediff(F.col(day_col), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_num)
        .rangeBetween(-(days - 1), 0)
    )
    vals = F.array_sort(F.collect_list(units_col).over(w))
    n = F.size(vals)
    # 1-based middles: for odd n both are (n+1)/2; for even n they are
    # n/2 and n/2+1. (n+1) div 2 and (n+2) div 2 cover both cases.
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, ((n + 2) / 2).cast("int"))
    return daily.select(
        F.col(key_col),
        F.col(day_col),
        n.cast("long").alias("n_in_window"),
        (lo + hi).cast("long").alias("median_units_x2"),
        ((lo + hi).cast("double") / 2.0 / 100.0).alias("median_value"),
    )
