"""Global percentile computation + trim (SURVEY.md A2 + J1 + P4).

Reference semantics: HW-3/airflow/dags/iot_temperature.py:64-72 —

    WITH p AS (SELECT percentile_cont(0.05) WITHIN GROUP (ORDER BY v) p5,
                      percentile_cont(0.95) WITHIN GROUP (ORDER BY v) p95
               FROM base)
    ... FROM base CROSS JOIN p WHERE v BETWEEN p.p5 AND p.p95

Spark-first design
------------------
``percentile()`` is Spark's exact ordered-set aggregate with the same
linear interpolation as Postgres ``percentile_cont``. It aggregates via
per-partition digests and a single-row merge — a map-side-combined
aggregation, not a global sort, so it scales to 100 TB inputs (the merge
state is O(distinct values) per partition; for truly unbounded domains
swap in ``approx_percentile`` with a documented error bound).

The one-row percentile frame is attached with ``crossJoin(broadcast(p))``
— a broadcast-nested-loop of a 1-row build side, i.e. free. No driver
``collect()``: the scalar stays in the plan. The source is scanned twice
(bounds pass + probe pass — the floor for exact global percentiles
without materialization); the bounds scan is column-pruned to the value
and filter columns only (verified in the physical plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_percentile_bounds(
    df: DataFrame,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """1-row DataFrame with the [lower, upper] percentiles of value_col.

    ``approx=True`` switches to ``approx_percentile`` (bounded-memory
    t-digest style sketch, rank error <= 1/accuracy) — the 100 TB
    escape hatch when the exact aggregate's per-partition value digest
    would not fit executor memory. Default stays exact to match
    Postgres ``percentile_cont`` bit-for-bit.
    """
    if approx:
        return df.agg(
            F.approx_percentile(
                F.col(value_col), F.lit(lower), F.lit(accuracy)
            ).alias("p_lo"),
            F.approx_percentile(
                F.col(value_col), F.lit(upper), F.lit(accuracy)
            ).alias("p_hi"),
        )
    return df.agg(
        F.percentile(F.col(value_col), F.lit(lower)).alias("p_lo"),
        F.percentile(F.col(value_col), F.lit(upper)).alias("p_hi"),
    )


def percentile_trim(
    df: DataFrame,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    bounds_over: DataFrame | None = None,
    approx: bool = False,
) -> DataFrame:
    """Keep rows whose value lies within the *global* [p_lo, p_hi] band.

    ``bounds_over`` lets the incremental pipeline compute percentiles over
    ALL data while trimming only a window (HW-4 docstring invariant,
    HW-4/airflow/dags/iot_temperature.py:109-113).
    """
    bounds = global_percentile_bounds(bounds_over if bounds_over is not None else df,
                                      value_col, lower, upper, approx=approx)
    out = df.crossJoin(F.broadcast(bounds))
    out = out.where(F.col(value_col).between(F.col("p_lo"), F.col("p_hi")))
    return out.drop("p_lo", "p_hi")


def percentile_clamp(
    df: DataFrame,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    bounds_over: DataFrame | None = None,
    approx: bool = False,
) -> DataFrame:
    """Winsorize: CLAMP values into the global [p_lo, p_hi] band
    instead of dropping rows (percentile_trim's row-preserving twin —
    the outlier treatment for aggregates that must keep every
    observation, e.g. revenue totals where trimming would undercount).
    Same two-scan shape and broadcast 1-row bounds frame as the trim.
    """
    bounds = global_percentile_bounds(
        bounds_over if bounds_over is not None else df,
        value_col, lower, upper, approx=approx,
    )
    out = df.crossJoin(F.broadcast(bounds))
    # greatest/least SKIP nulls (least(p_hi, NULL) = p_hi), so an
    # unguarded clamp would fabricate p_hi for NULL inputs; preserve
    # NULL explicitly instead.
    clamped = F.when(
        F.col(value_col).isNotNull(),
        F.greatest(F.col("p_lo"), F.least(F.col("p_hi"), F.col(value_col))),
    )
    return out.withColumn(value_col, clamped).drop("p_lo", "p_hi")


def trim_predicate(value_col: str) -> Column:
    return F.col(value_col).between(F.col("p_lo"), F.col("p_hi"))


def grouped_percentile_trim(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-GROUP [lower, upper] percentile trim — each group is cleaned
    against its own band (the global trim's natural extension when
    value distributions differ per category).

    The per-group bounds frame has one row per group — broadcast it
    back onto the data (equi-join on the group keys, tiny build side).
    At 100 TB the bounds aggregation is the usual partial+final agg;
    the join stays broadcast as long as group cardinality is dim-sized.
    """
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col), F.lit(lower)).alias("p_lo"),
        F.percentile(F.col(value_col), F.lit(upper)).alias("p_hi"),
    )
    out = df.join(F.broadcast(bounds), group_cols)
    out = out.where(F.col(value_col).between(F.col("p_lo"), F.col("p_hi")))
    return out.drop("p_lo", "p_hi")
