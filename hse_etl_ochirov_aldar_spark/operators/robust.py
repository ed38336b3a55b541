"""Robust (median / MAD) per-group outlier screening.

The robust twin of the z-score anomaly screens: median and median
absolute deviation are immune to the very outliers they hunt, where
mean/stddev screens (streaming/anomaly.py) are dragged toward them.
Reference anchor: the percentile-based anomaly trim of
HW-3/airflow/dags/iot_temperature.py:64-72 — same "order statistics,
not moments" idea, per group instead of global.

Spark-first design — exact medians WITHOUT per-group sorts
----------------------------------------------------------
An exact median normally needs a sort; per group at 100 TB that is a
full shuffle of every row into per-group sorted runs. Instead we
compute order statistics over the VALUE CENSUS:

1. ``groupBy(group, value_units).count()`` — map-side-combined; the
   shuffle carries one row per DISTINCT (group, value), not per row.
   Fixed-point sensor/price domains are tiny compared to row counts.
2. A window over the census (partitioned by group, ordered by value)
   accumulates counts; the rows straddling ranks (n+1)//2 and
   (n+2)//2 give the two middle order statistics, whose SUM is an
   exact-integer ``2 * median`` (odd n: both ranks hit the same row).
3. The same census machinery runs again on the integer deviations
   ``|2*v - med2|`` for the MAD.

All comparisons stay in BIGINT: the outlier predicate
``|v - med| >= k * 1.4826 * MAD`` is cross-multiplied into integers
(k = 3.5: ``20000 * dev >= 51891 * devmed2``), so the screen is
bit-identical in any engine; only the reported z-score performs float
division (one multiply + one divide + round — deterministic IEEE ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import units


def _group_median2(df: DataFrame, group_col: str, units_col: str, out_col: str) -> DataFrame:
    """One row per group: ``out_col`` = exact 2 * median of units_col
    (BIGINT) + ``n_rows``. Shuffles O(distinct values), not O(rows)."""
    census = df.groupBy(group_col, units_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(group_col).orderBy(units_col)
    cum = census.withColumn("__cum", F.sum("__cnt").over(w))
    totals = census.groupBy(group_col).agg(F.sum("__cnt").alias("n_rows"))
    j = cum.join(totals, group_col)
    lo_rank = F.floor((F.col("n_rows") + 1) / 2)
    hi_rank = F.floor((F.col("n_rows") + 2) / 2)
    # value straddles rank r iff cum >= r (first such value in order);
    # min() picks it without a second window pass.
    return j.groupBy(group_col, "n_rows").agg(
        (
            F.min(F.when(F.col("__cum") >= lo_rank, F.col(units_col)))
            + F.min(F.when(F.col("__cum") >= hi_rank, F.col(units_col)))
        ).alias(out_col)
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_x10000: int = 35000,
    scale: int = 2,
) -> DataFrame:
    """Rows of ``df`` whose value deviates from its group median by at
    least ``k * 1.4826 * MAD`` (k = k_x10000/10000), plus the robust
    z-score and the group's median/MAD diagnostics.

    Groups with MAD = 0 (over half the values identical) emit no rows:
    a degenerate scale estimate flags everything, which is noise, not
    signal.
    """
    vu = units(value_col, scale)
    base = df.withColumn("__vu", vu)
    med = _group_median2(base, group_col, "__vu", "med2")
    dev = base.join(F.broadcast(med), group_col).withColumn(
        "__dev", F.abs(2 * F.col("__vu") - F.col("med2"))
    )
    mad = _group_median2(
        dev.select(group_col, "__dev"), group_col, "__dev", "devmed2"
    ).drop("n_rows")
    # 1.4826 * k in 1e-8 cross-multiplied integer form:
    # dev/2 >= k*1.4826*devmed2/4  <=>  2*10^8*dev >= 14826*k_x10000*devmed2
    lhs = F.lit(200_000_000) * F.col("__dev")
    rhs = F.lit(14_826) * F.lit(k_x10000) * F.col("devmed2")
    out = (
        dev.join(F.broadcast(mad), group_col)
        .where((F.col("devmed2") > 0) & (lhs >= rhs))
    )
    z = F.round(
        (2 * (2 * F.col("__vu") - F.col("med2"))).cast("double")
        / (F.lit(1.4826) * F.col("devmed2")),
        6,
    )
    keep = [c for c in df.columns]
    return out.select(
        *keep,
        F.col("med2"),
        F.col("devmed2"),
        z.alias("robust_z"),
    )
