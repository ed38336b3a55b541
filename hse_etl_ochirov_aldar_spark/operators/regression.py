"""Per-group ordinary least squares from exact integer moments.

The classic "fit a trend line per key" analytics primitive (reference
parity: the marts in final-module-3/airflow/dags/build_analytical_marts.py
stop at means/modes; this is the natural next step a warehouse consumer
asks for) computed the only way that is BOTH distributed and
engine-reproducible:

- x and y snap to integer units at caller-chosen scales, so the five
  sufficient statistics per group (n, Sx, Sy, Sxy, Sxx, Syy) are sums of
  integers — summation order cannot move them, so Spark's partial-agg
  tree and any oracle's single-threaded sum agree bit-for-bit.
- Per-row products stay in BIGINT (caller keeps |x_units * y_units| well
  under 2^63 — trivial when x is a day/hour offset from a fixed origin);
  the SUMS are lifted to DECIMAL(38,0), which Spark and DuckDB both keep
  exact to 1e38, so no group cardinality reachable at 100 TB can
  overflow the moments.
- slope / intercept / R^2 are each ONE double expression over the exact
  moments, rounded to 6dp — the same expression the oracle writes, so
  the doubles match exactly.

Scale shape: one scan, map-side partial aggregation, a shuffle of
O(groups) moment rows, zero UDFs. This is the textbook
"sufficient-statistics, not data movement" pattern: at 100 TB the only
thing crossing the wire is six numbers per (partition, group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_ols"]


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_units: Column,
    y_units: Column,
    x_scale: float = 1.0,
    y_scale: float = 1.0,
) -> DataFrame:
    """OLS fit of y on x per group from exact integer moments.

    ``x_units`` / ``y_units`` must be BIGINT columns (the caller's
    integer snap — e.g. day offsets and centi-units). ``x_scale`` /
    ``y_scale`` convert units back to natural scale in the FINAL double
    expressions only (slope multiplies by y_scale/x_scale, intercept by
    y_scale), so all intermediate math stays exact.

    Output per group: n (BIGINT), slope, intercept, r2 (doubles, 6dp;
    NULL when the group is degenerate — fewer than 2 points or zero
    x-variance; r2 NULL when y has zero variance).
    """
    both = x_units.isNotNull() & y_units.isNotNull()
    ux = F.when(both, x_units)
    uy = F.when(both, y_units)
    dec = "decimal(38,0)"
    moments = df.groupBy(*group_cols).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.sum(ux.cast(dec)).alias("sx"),
        F.sum(uy.cast(dec)).alias("sy"),
        F.sum((ux * uy).cast(dec)).alias("sxy"),
        F.sum((ux * ux).cast(dec)).alias("sxx"),
        F.sum((uy * uy).cast(dec)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    # Unit conversion happens HERE, on the already-exact moments.
    slope = F.when(
        (F.col("n") >= 2) & (varx > 0),
        F.round(cov / varx * F.lit(y_scale / x_scale), 6),
    )
    intercept = F.when(
        (F.col("n") >= 2) & (varx > 0),
        F.round((sy - cov / varx * sx) / n * F.lit(y_scale), 6),
    )
    r2 = F.when(
        (F.col("n") >= 2) & (varx > 0) & (vary > 0),
        F.round(cov * cov / (varx * vary), 6),
    )
    return moments.select(
        *group_cols,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
