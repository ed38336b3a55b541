"""Distributed global ranking.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY drags the
entire relation through ONE task — the single-partition trap. This
module computes the identical global rank distributedly:

1. range-partition by the ordering columns (boundaries are sampled and
   nondeterministic, but with a TOTAL order the final rank of every row
   is boundary-independent, so results stay deterministic);
2. sort within partitions and capture each row's partition id;
3. census the per-partition counts (one collect bounded by the
   partition count), turn them into cumulative offsets;
4. rank = partition offset + within-partition row_number.

One range shuffle + one partition-local window — the same shape
Spark's own sort uses, so this scales exactly as far as sorting does.
The ordering MUST be total (pass a tie-break column); otherwise ranks
inside a tie straddle whatever boundary sampling chose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_rank",
) -> DataFrame:
    """``df`` + BIGINT ``out_col`` = the 1-based global row_number under
    ORDER BY ``order_cols`` (ascending; must be a total order)."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    # persist(): the census job and the final job must see the SAME
    # range boundaries; materializing the ranged relation guarantees it
    # (and avoids paying the range shuffle twice). Consumers clear
    # cache between catalog entries per the QUERIES contract.
    ranged = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    sizes = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    run = 0
    for pid, cnt in sizes:
        offsets[pid] = run
        run += cnt
    omap = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("__pid").orderBy(*[F.asc(c) for c in order_cols])
    return (
        ranged.withColumn(
            out_col,
            (
                F.coalesce(omap[F.col("__pid")], F.lit(0))
                + F.row_number().over(w)
            ).cast("long"),
        )
        .drop("__pid")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "global_cumsum",
) -> DataFrame:
    """``df`` + BIGINT ``out_col`` = the running sum of ``value_col``
    under the TOTAL order ``order_cols`` — the distributed prefix sum.

    Same shape as :func:`global_rank`: range-partition by the ordering,
    per-partition window cumsum, then add each partition's offset (the
    sum of all earlier partitions, from one census collect bounded by
    the partition count). A bare ``sum() OVER (ORDER BY ...)`` drags
    the relation through ONE task; this pays one range shuffle and
    scales exactly as far as a sort does. The ordering must be total
    or ranks inside ties straddle nondeterministic range boundaries.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    ranged = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    sizes = sorted(
        (r["__pid"], r["s"])
        for r in ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    offsets: dict[int, int] = {}
    run = 0
    for pid, s in sizes:
        offsets[pid] = run
        run += s or 0
    omap = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn(
            out_col,
            (
                F.coalesce(omap[F.col("__pid")], F.lit(0))
                + F.sum(value_col).over(w)
            ).cast("long"),
        )
        .drop("__pid")
    )
