"""Dataset profiling and skew diagnostics — the observability layer a
warehouse migration needs on day one (the reference's quality gates
check fixed predicates; profiling answers "what IS in this table"
before anyone writes a predicate).

Both operators are single-pass aggregations:

- :func:`profile_table` computes every column's stats in ONE full scan
  (one wide aggregate row — null counts, exact distincts, numeric
  min/max/sum — then a row-local unpivot to one row per column). At
  100 TB the exact distinct per column is the expensive part; pass
  ``approx=True`` to swap HLL++ sketches in (rsd 1%), turning the
  multi-column distinct shuffle into fixed-size sketch merges.
- :func:`skew_report` censuses a join/groupBy key and reports the
  top-N heaviest keys with their corpus share in basis points plus the
  key count — the number you read BEFORE choosing broadcast/salting/
  AQE-skew strategies for a join on that key (operators/skew.py is the
  remedy; this is the diagnosis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """One row per column: ``col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value`` (min/max rendered as strings so numeric,
    string, and timestamp columns share one schema).

    Exact by default (count(DISTINCT) per column in one aggregate —
    Spark expands to one shuffle per distinct column under the hood;
    fine at mart scale). ``approx=True`` is the 100 TB path: HLL++
    per column, one pass, fixed memory.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    distinct = (
        (lambda c: F.approx_count_distinct(c, rsd))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(per_col).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Top-``top_n`` heaviest values of ``key_col``: ``key_value``
    (stringified), ``n_rows``, ``share_bp`` (exact integer basis points
    of the table), ranked by count with value tie-break. NULL keys
    census like any value (they hash-partition together too — often
    the actual hot key)."""
    if top_n <= 0:
        raise ValueError("top_n must be positive")
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key_value")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__t"))
    # orderBy+limit plans as TakeOrdered (distributed per-partition
    # top-N + driver merge) — a global rank window would drag the whole
    # per-key census through ONE partition; the window below ranks only
    # the already-selected top_n rows
    top = counts.orderBy(
        F.desc("n_rows"), F.asc_nulls_first("key_value")
    ).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc_nulls_first("key_value"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key_value",
            "n_rows",
            F.expr("CAST(n_rows * 10000 div __t AS BIGINT)").alias("share_bp"),
        )
    )
