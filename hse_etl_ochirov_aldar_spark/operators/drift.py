"""Two-sample Kolmogorov-Smirnov drift screen, census-exact.

Training-data pipelines re-ingest sources continuously; the first
question after every refresh is "did the value distribution move?".
The KS statistic ``D = max_x |F_a(x) - F_b(x)|`` answers it without
binning choices — and it has an exact distributed form:

1. ``groupBy(key, value_units)`` with two conditional counts — the
   shuffle carries one row per DISTINCT (key, value), never raw rows
   (same census trick as operators/robust.py).
2. one per-key window ordered by value accumulates both ECDFs;
3. the supremum is taken over CROSS-MULTIPLIED integers:
   ``|cum_a * n_b - cum_b * n_a|`` — no float division until the
   single reported statistic, so the screen is bit-identical across
   engines. (BIGINT bound: n_a * n_b < 9.2e18 — beyond ~3e9 rows per
   side, downscale the counts; D only needs double precision there.)

The argmax location rides along via ``min(struct(-diff, value))`` —
the sort-free extremum idiom (PERF.md finding 18), tie-broken to the
smallest value achieving the supremum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_two_sample(
    df: DataFrame,
    key_col: str,
    units_col: str,
    is_a: Column,
) -> DataFrame:
    """Per-key exact KS statistic between the ``is_a`` rows and the
    rest. Output: key, n_a, n_b, d_num (BIGINT supremum numerator),
    ks_stat (double, 6 dp), at_units (smallest value achieving it)."""
    census = df.groupBy(key_col, units_col).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(is_a, 0).otherwise(1)).alias("__cb"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(units_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = census.select(
        key_col,
        units_col,
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
    )
    totals = census.groupBy(key_col).agg(
        F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b")
    )
    j = cum.join(F.broadcast(totals), key_col)
    diff = F.abs(F.col("__cuma") * F.col("n_b") - F.col("__cumb") * F.col("n_a"))
    picked = j.groupBy(key_col, "n_a", "n_b").agg(
        F.min(F.struct((-diff).alias("nd"), F.col(units_col).alias("v"))).alias("__m")
    )
    d_num = -F.col("__m.nd")
    return picked.select(
        key_col,
        "n_a",
        "n_b",
        d_num.alias("d_num"),
        F.round(
            d_num.cast("double") / (F.col("n_a") * F.col("n_b")).cast("double"), 6
        ).alias("ks_stat"),
        F.col("__m.v").alias("at_units"),
    )
