"""Bounded-interval range join via time-bucketing.

No reference analogue; the second classic temporal operator (with
[[asof_join]]) that Spark lacks natively. A naive `ts BETWEEN start
AND end` join plans as a nested-loop over the key groups; for
intervals of BOUNDED length L the scalable rewrite is:

  1. pick bucket width = L;
  2. each interval overlaps at most 2 buckets -> explode the build
     side to its (key, bucket) pairs (2x replication, not a blow-up);
  3. probes join on exact (key, bucket) — a plain hash shuffle join;
  4. re-apply the exact containment predicate to kill false bucket
     neighbors.

Cost: one equi-shuffle on (key, bucket) with 2x build replication —
the same class as any keyed join, independent of time-domain size.
This is the interval-join strategy Flink and KDB-style engines use
internally; AQE skew handling applies to hot (key, bucket) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    probes: DataFrame,
    builds: DataFrame,
    key: str,
    probe_ts: str,
    build_start: str,
    build_end: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each probe row to every build row with the same ``key``
    whose [build_start, build_end) interval contains probe_ts.

    ``bucket_seconds`` must be >= the maximum interval length
    (end - start); intervals then span at most 2 buckets. ``how``
    supports inner and left.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join_bucketed supports inner/left, got {how!r}")

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bucket_seconds)

    b = builds.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(bucket_of(F.col(build_start)), bucket_of(F.col(build_end)))
            )
        ),
    )
    p = probes.withColumn("__bucket", bucket_of(F.col(probe_ts)))
    contained = (F.col(probe_ts) >= F.col(build_start)) & (
        F.col(probe_ts) < F.col(build_end)
    )
    if how == "inner":
        return p.join(b, [key, "__bucket"]).where(contained).drop("__bucket")
    # left: inner-match first, then re-attach probe rows with no match
    matched = p.join(b, [key, "__bucket"]).where(contained).drop("__bucket")
    build_cols = [c for c in b.columns if c not in (key, "__bucket")]
    unmatched = p.drop("__bucket").join(
        matched.select(*probes.columns).distinct(),
        on=list(probes.columns),
        how="left_anti",
    )
    for c in build_cols:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return matched.unionByName(unmatched)
