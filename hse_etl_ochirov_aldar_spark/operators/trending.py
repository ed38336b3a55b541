"""Time-decayed popularity ("trending") scores over an event stream.

Classic exponential decay ``sum(exp(-age/tau))`` is engine-portable
only up to libm's last ulp (``exp`` is not correctly rounded, unlike
+-*/ and sqrt), so this operator uses BUCKETED exponential decay: age
is floored to whole half-life periods and each event contributes the
integer weight ``1_000_000 >> periods`` micro-units. Every term is a
pure integer function of the timestamps, the sum is associative
BIGINT addition — bit-exact under any partitioning, shuffle order, or
engine, hence a full value-hash oracle (the same integer-units
discipline as functions/exact.py money math; precedent for rejecting
float folds: PERF.md numpy-vs-JVM note).

Decay reference point is the MAX timestamp in the data (not
wall-clock), so results are a pure function of the input — replayable
and driver-checkable. Streaming deployments would pass the batch
watermark instead.

Scale shape (100 TB): one scan; the global max rides in as a
broadcast 1-row aggregate (no driver action); per-item weights sum
with map-side partial aggregation, so the shuffle carries one row per
(item) per map task. Items older than 40 half-lives contribute
exactly 0 and are dropped before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decayed_counts(
    df: DataFrame,
    item_col: Column | str,
    ts_us: Column,
    half_life_us: int = 86_400_000_000,
) -> DataFrame:
    """Per-item decayed popularity: (item, score_units, n_events,
    last_seen_us). ``ts_us`` must be epoch microseconds (compute it
    JVM-side — streaming/sessionize._epoch_micros handles the
    TIMESTAMP vs TIMESTAMP_NTZ parquet flavors). score_units is the
    BIGINT micro-unit sum; divide by 1e6 for the human-readable score.
    """
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    base = df.select(item.alias("item"), ts_us.alias("__ts_us")).where(
        F.col("item").isNotNull() & F.col("__ts_us").isNotNull()
    )
    ref = F.broadcast(base.agg(F.max("__ts_us").alias("__ref_us")))
    periods = F.floor(
        (F.col("__ref_us") - F.col("__ts_us")) / F.lit(half_life_us)
    ).cast("int")
    # 1e6 >> 20 is already 0, but JVM shiftright wraps the shift amount
    # mod 64 — guard explicitly so a 64+ half-life age can't resurrect.
    # (F.shiftright only takes a literal shift; the SQL form takes a
    # column.)
    weight = F.when(
        F.col("__p") < 20,
        F.expr("shiftright(CAST(1000000 AS BIGINT), __p)"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        base.crossJoin(ref)
        .select("item", F.col("__ts_us"), periods.alias("__p"))
        .select(
            "item",
            weight.alias("__w"),
            F.col("__ts_us"),
        )
        .where(F.col("__w") > 0)
        .groupBy("item")
        .agg(
            F.sum("__w").alias("score_units"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("__ts_us").alias("last_seen_us"),
        )
    )
