"""As-of (most-recent-version) join — custom temporal operator.

No reference analogue (SURVEY §2.3 ends at equi/cross joins); included
as the canonical example of an operator Spark lacks natively but which
composes from DataFrame primitives (brief: custom operators path (a)).

Semantics: for each probe row (key, ts), attach the build row with the
same key and the LARGEST build_ts <= ts (classic slowly-changing-
dimension lookup / trade-quote matching).

Spark-first design — the union-and-carry idiom:
  1. union probes and builds into one keyed stream with a side tag;
  2. one window per key ordered by (time, side) carries the latest
     build attributes forward via last(..., ignoreNulls=True);
  3. keep probe rows.
ONE shuffle on the key, one per-key sort — same cost class as a
groupBy; never a range cross-join. Skewed keys ride the same salting /
AQE story as any keyed shuffle. Build rows sort BEFORE probe rows at
equal timestamps (side tag 0 < 1), giving inclusive `build_ts <= ts`
semantics, matching DuckDB/QuestDB ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    attrs: list[str],
) -> DataFrame:
    """Left as-of join: probes + latest-as-of ``attrs`` from builds.

    Probe rows with no build row at or before their timestamp keep
    NULL attrs (left-join semantics). ``builds`` should be
    pre-deduplicated to one row per (key, build_ts) for deterministic
    results — enforce upstream with dedup_keep_first.
    """
    clash = set(attrs) & set(probes.columns)
    if clash:
        # a probe column sharing an attr name would feed the ignoreNulls
        # carry and silently corrupt the as-of values
        raise ValueError(f"asof_join attrs collide with probe columns: {sorted(clash)}")
    p = probes.withColumn("__side", F.lit(1)).withColumn(
        "__t", F.col(probe_ts)
    )
    b = (
        builds.select(key, build_ts, *attrs)
        .withColumn("__side", F.lit(0))
        .withColumn("__t", F.col(build_ts))
    )
    merged = p.unionByName(b, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        *[
            F.last(F.col(a), ignorenulls=True).over(w).alias(f"__asof_{a}")
            for a in attrs
        ],
    )
    drop_cols = ["__side", "__t", *attrs]
    if build_ts != probe_ts:
        drop_cols.append(build_ts)
    out = carried.where(F.col("__side") == 1).drop(*drop_cols)
    for a in attrs:
        out = out.withColumnRenamed(f"__asof_{a}", a)
    return out
