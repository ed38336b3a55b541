"""RFM (recency / frequency / monetary) customer segmentation.

The classic CRM mart the reference's analytical-mart layer points at
(final-module-3/airflow/dags/build_analytical_marts.py:24-138 builds
per-user activity marts of exactly this shape: per-entity aggregates +
derived scoring columns) — generalized to the standard RFM quintile
scoring.

Spark-first design
------------------
1. One shuffle aggregates the fact table to one row per customer
   (recency days vs a broadcast 1-row anchor frame, order count,
   exact-integer monetary units).
2. Each quintile score is an NTILE(5) over a TOTAL order — but a bare
   ``ntile() OVER (ORDER BY ...)`` drags every row through ONE task
   (the single-partition window trap, same as SURVEY W1). Instead we
   compute the distributed :func:`~.rank.global_rank` (range shuffle +
   partition-local window) and derive the bucket with the exact ANSI
   NTILE formula from the rank and the broadcast total count::

       q, rem = n // k, n % k          # first `rem` buckets get q+1
       bucket(r) = (r-1) // (q+1) + 1                  if r <= rem*(q+1)
                   rem + (r-1-rem*(q+1)) // q + 1      otherwise

   which is bit-identical to SQL NTILE in Spark, DuckDB and Postgres,
   so the oracle can use plain ``NTILE(5)``.
3. Scores are oriented so 5 = best (most recent / most frequent /
   highest spend); descending orders are expressed as ascending ranks
   over the negated metric with the customer key as the total-order
   tie-break — deterministic across engines.

Scale: the per-customer rollup is |customers| rows (orders-table scale
drops away after step 1); three range shuffles over that rollup is the
cost of three exact global rankings — the same floor a warehouse NTILE
pays, minus the single-task window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import as_value, units_sum
from .rank import global_rank


def _ntile_from_rank(rank_col: str, n_col: str, k: int) -> F.Column:
    """Exact ANSI NTILE(k) bucket from a 1-based global rank + total n."""
    r0 = F.col(rank_col) - 1
    n = F.col(n_col)
    q = F.floor(n / k).cast("long")
    rem = n - q * k
    big = rem * (q + 1)
    # q = 0 (n < k) puts every row in the first branch (big = n), but
    # guard the dead divisor anyway so ANSI mode can't trip on it.
    q_safe = F.greatest(q, F.lit(1))
    # double-div + floor is exact for counts < 2^52 (far beyond any
    # customer-dimension cardinality).
    return (
        F.when(r0 < big, F.floor(r0 / (q + 1)) + 1)
        .otherwise(rem + F.floor((r0 - big) / q_safe) + 1)
        .cast("int")
    )


def rfm_scores(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    k: int = 5,
) -> DataFrame:
    """One row per customer: raw R/F/M metrics + 1..k quintile scores
    (k = best) + a named segment.

    Output: ``cust_col, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment``.
    """
    per_cust = orders.groupBy(cust_col).agg(
        F.max(F.col(date_col).cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        units_sum(amount_col).alias("monetary_units"),
    )
    # Anchor = max order date over the whole table; rides in as a
    # broadcast 1-row frame (no driver collect).
    anchor = orders.agg(F.max(F.col(date_col).cast("date")).alias("anchor_day"))
    base = (
        per_cust.crossJoin(F.broadcast(anchor))
        .select(
            cust_col,
            F.datediff("anchor_day", "last_day").cast("long").alias("recency_days"),
            "frequency",
            "monetary_units",
        )
    )
    n_frame = base.agg(F.count(F.lit(1)).alias("__n"))

    # Rank orientations: ascending recency (recent = rank 1), descending
    # frequency / monetary via negation; cust key breaks all ties.
    ranked = global_rank(
        base.withColumn("__neg_f", -F.col("frequency"))
        .withColumn("__neg_m", -F.col("monetary_units")),
        ["recency_days", cust_col],
        "__r_rank",
    )
    ranked = global_rank(ranked, ["__neg_f", cust_col], "__f_rank")
    ranked = global_rank(ranked, ["__neg_m", cust_col], "__m_rank")

    scored = ranked.crossJoin(F.broadcast(n_frame)).select(
        cust_col,
        "recency_days",
        "frequency",
        as_value("monetary_units").alias("monetary"),
        # rank 1 = best -> bucket 1 -> score k
        (k + 1 - _ntile_from_rank("__r_rank", "__n", k)).alias("r_score"),
        (k + 1 - _ntile_from_rank("__f_rank", "__n", k)).alias("f_score"),
        (k + 1 - _ntile_from_rank("__m_rank", "__n", k)).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when(F.col("f_score") >= 4, F.lit("loyal"))
        .when(F.col("m_score") >= 4, F.lit("big_spender"))
        .when(F.col("r_score") >= 4, F.lit("recent"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), F.lit("hibernating"))
        .when(F.col("r_score") <= 2, F.lit("at_risk"))
        .otherwise(F.lit("regular"))
    )
    return scored.withColumn("segment", seg)
