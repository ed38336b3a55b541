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

__all__ = ["cusum_changepoints", "gap_fill_daily", "rolling_median_daily"]


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


def cusum_changepoints(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    units_col: str,
    h_mads: int = 5,
) -> DataFrame:
    """Two-sided tabular CUSUM over a per-key daily integer series, with
    a robust (median/MAD) center and allowance — level-shift changepoint
    detection for the clean-layer daily rollups (the sequel to the
    point-anomaly screens: CUSUM accumulates small persistent drifts a
    per-point z-test never trips on).

    Spark-first: the textbook recursion ``s+_t = max(0, s+_{t-1} + y_t)``
    looks like a Python fold, but it has a closed relational form —

        s+_t = S_t - min_{j<=t} S_j      with  S_t = cumsum(y_t)

    (the reflected running minimum absorbs every reset-to-zero), and
    symmetrically ``s-_t = max_{j<=t} T_j - T_t``. Two per-key windows
    (cumsum + running extremum) replace the sequential fold entirely —
    whole-stage-codegen'd, no Python, no applyInPandas state.

    Exactness: center = per-key median (x2), allowance = MAD
    (devmed2/4), both BIGINT via the census order-statistic operator
    (operators/robust._group_median2); the series is scaled x4 so
    ``y_t = 4*(x_t - med - MAD)`` stays integral. Alarms compare
    BIGINTs against ``h_mads * devmed2`` — bit-identical in any engine.

    Output per (key, day): the x4-scaled two-sided CUSUM statistics,
    the robust center diagnostics, and boolean alarms.
    """
    from .robust import _group_median2

    med = _group_median2(daily, key_col, units_col, "med2")
    dev = daily.join(F.broadcast(med), key_col).withColumn(
        "__dev", F.abs(2 * F.col(units_col) - F.col("med2"))
    )
    mad = _group_median2(
        dev.select(key_col, "__dev"), key_col, "__dev", "devmed2"
    ).drop("n_rows")
    base = dev.join(F.broadcast(mad), key_col)

    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x4 = 4 * F.col(units_col)
    y_pos = x4 - 2 * F.col("med2") - F.col("devmed2")
    y_neg = x4 - 2 * F.col("med2") + F.col("devmed2")
    stepped = base.select(
        key_col,
        day_col,
        units_col,
        "med2",
        "devmed2",
        F.sum(y_pos).over(w).alias("__s"),
        F.sum(y_neg).over(w).alias("__t"),
    )
    # the running extremum must include the virtual empty prefix S_0 = 0
    # (the recursion starts at zero): least/greatest against lit(0).
    cusum_pos = F.col("__s") - F.least(F.lit(0), F.min("__s").over(w))
    cusum_neg = F.greatest(F.lit(0), F.max("__t").over(w)) - F.col("__t")
    thresh = F.lit(h_mads) * F.col("devmed2")
    return stepped.select(
        key_col,
        day_col,
        units_col,
        "med2",
        "devmed2",
        cusum_pos.alias("cusum_pos_x4"),
        cusum_neg.alias("cusum_neg_x4"),
        ((F.col("devmed2") > 0) & (cusum_pos >= thresh)).alias("alarm_pos"),
        ((F.col("devmed2") > 0) & (cusum_neg >= thresh)).alias("alarm_neg"),
    )
