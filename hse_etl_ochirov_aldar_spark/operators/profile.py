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

from pyspark.sql import Column, DataFrame
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


def value_histogram(
    df: DataFrame,
    col: str,
    buckets: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Exact equal-width histogram of a numeric column: one row per
    bucket with BIGINT counts. Bounds default to the column's observed
    min/max (one extra tiny aggregate); values at ``hi`` land in the
    last bucket (right-closed top edge, the standard width_bucket
    convention collapsed inward), NULLs are excluded.

    One groupBy on a row-local bucket index — map-side combinable, at
    most ``buckets`` rows shuffle per partition. Empty buckets are
    emitted with count 0 via a range join against the bucket spine so
    the histogram shape is complete (the spine is ``buckets`` rows —
    broadcast, never a shuffle)."""
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    if lo is None or hi is None:
        row = df.agg(
            F.min(F.col(col)).cast("double"), F.max(F.col(col)).cast("double")
        ).first()
        lo = float(row[0]) if lo is None else lo
        hi = float(row[1]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / buckets
    idx = F.least(
        F.lit(buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)).cast(
                "int"
            ),
        ),
    )
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(idx.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spine = df.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    return (
        spine.join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("bucket_hi"),
            F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        )
        .orderBy("bucket")
    )


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    scales: list[int] | int = 2,
) -> DataFrame:
    """Pairwise Pearson correlations from EXACT integer moments: each
    column snaps to BIGINT units at its scale (``scales`` per column,
    or one int for all), and all five moments per pair (n, sum_x,
    sum_y, sum_xy, sum_x2/sum_y2) are exact integer sums — summation
    order cannot move the result, so the final correlation (one double
    expression over exact integers, rounded to 6dp) is
    engine-reproducible. One full scan computes every pair's moments;
    rows with a NULL in either column of a pair are excluded pairwise.
    Output: (col_x, col_y, n_pairs, corr) for x < y.

    Pick each scale so sum(units^2) stays inside BIGINT (units^2 x
    row count < 9e18): correlation is scale-invariant, so the scale
    only needs enough resolution to separate the column's values.
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    sc = scales if isinstance(scales, list) else [scales] * len(cols)
    if len(sc) != len(cols):
        raise ValueError("scales must match cols")
    scale_of = dict(zip(cols, sc))

    from ._plan import spread_small_input

    # project to the measured columns, then spread (r12): the partial
    # phase evaluates ~5 moment terms per pair per row, and on a small
    # single-file scan that CPU ran on 1-3 tasks (guide §2.3 project-
    # before-exchange; no-op at real scale). Exact integer sums are
    # order-independent, so the result is unchanged by partitioning.
    df = spread_small_input(df.select(*cols))

    def u(c: str):
        return F.round(
            F.col(c).cast("double") * (10 ** scale_of[c]), 0
        ).cast("long")

    aggs = []
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        ua = F.when(both, u(a))
        ub = F.when(both, u(b))
        tag = f"{a}__{b}"
        aggs += [
            F.count(F.when(both, 1)).alias(f"n_{tag}"),
            F.sum(ua).alias(f"sx_{tag}"),
            F.sum(ub).alias(f"sy_{tag}"),
            F.sum(ua * ub).alias(f"sxy_{tag}"),
            F.sum(ua * ua).alias(f"sxx_{tag}"),
            F.sum(ub * ub).alias(f"syy_{tag}"),
        ]
    wide = df.agg(*aggs)
    rows = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        cov = n * sxy - sx * sy
        den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        rows.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col(f"n_{tag}").alias("n_pairs"),
                F.when(den > 0, F.round(cov / den, 6)).alias("corr"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("col_x", "col_y")
    )


# Benford first-digit expectations log10(1 + 1/d), rounded to 9dp once
# HERE (module constant) so the Spark screen and any SQL oracle embed
# the SAME literals — no engine's libm log10 in the compare path.
BENFORD_PCT = {
    1: 0.301029996,
    2: 0.176091259,
    3: 0.124938737,
    4: 0.096910013,
    5: 0.079181246,
    6: 0.06694679,
    7: 0.057991947,
    8: 0.051152522,
    9: 0.045757491,
}


def benford_screen(df: DataFrame, units_col: Column) -> DataFrame:
    """First-significant-digit census vs Benford's law — the classic
    fabricated-numbers / broken-ingest screen for scale-spanning
    positive quantities (amounts, populations, file sizes).

    ``units_col`` must be an exact positive BIGINT (the caller's
    integer-unit snap, e.g. centi-units of a price). The leading digit
    comes from the INTEGER'S DECIMAL STRING — never from
    floor(log10(v)), whose float rounding misclassifies exact powers
    of ten (log10(1000.0) can evaluate just below 3). Rows with
    non-positive or NULL units are excluded (Benford is undefined
    there), reported via the n_excluded column on every row.

    One scan, one 9-group aggregate: observed_pct is count_d / n (a
    division of two exact integers — bit-identical in any engine),
    benford_pct is the shared literal table, deviation their rounded
    difference. Chi-square is deliberately NOT summed here: a 9-term
    float sum has engine-dependent addend order; consumers can fold
    the per-digit rows themselves.
    """
    digit = F.substring(units_col.cast("string"), 1, 1).cast("int")
    valid = units_col.isNotNull() & (units_col > 0)
    census = (
        df.select(
            F.when(valid, digit).alias("digit"),
            valid.alias("_ok"),
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = census.agg(
        F.sum(F.when(F.col("digit").isNotNull(), F.col("n"))).alias("n_total"),
        F.coalesce(
            F.sum(F.when(F.col("digit").isNull(), F.col("n"))), F.lit(0)
        ).alias("n_excluded"),
    )
    bpct = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in sorted(BENFORD_PCT.items()) for x in (d, p)]
        ),
        F.col("digit"),
    )
    obs = F.col("n").cast("double") / F.col("n_total").cast("double")
    return (
        census.where(F.col("digit").isNotNull())
        .crossJoin(F.broadcast(totals))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(obs, 6).alias("observed_pct"),
            bpct.alias("benford_pct"),
            F.round(obs - bpct, 6).alias("deviation"),
            F.col("n_excluded").cast("long").alias("n_excluded"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    group_col: str,
    units_col: str,
) -> DataFrame:
    """Exact per-group Gini concentration of a non-negative integer
    measure — the inequality readout behind "how concentrated is
    revenue / token mass / traffic" questions (the scalar sibling of
    the top-k share in revenue_concentration).

    Sort-free exact computation over the VALUE CENSUS: with the values
    ascending and 1-based ranks i,

        G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n

    A census row (value v, count c, cumulative count r) contributes
    ``v * (r*(r+1) - (r-c)*(r-c+1)) / 2`` to sum(i * x_i) — the rank
    block-sum in closed form, exact BIGINT (consecutive-integer
    products are even). Ties contribute identically under any
    tie-order, so the statistic is deterministic without a total
    order. Shuffle = O(distinct values per group), one window over
    census rows, float enters only in the single final division.

    BIGINT bound: sum(i * x) < 9.2e18 — holds to ~1e9 rows of 1e7-unit
    values per group; beyond that move the block sums to DECIMAL(38,0).
    """
    from pyspark.sql import Window

    census = df.groupBy(group_col, units_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w = Window.partitionBy(group_col).orderBy(units_col)
    cum = census.withColumn("__r", F.sum("__cnt").over(w))
    lo = F.col("__r") - F.col("__cnt")
    # halve per block (each is even) with integer div, BEFORE summing —
    # a double /2 after the sum would lose exactness past 2^53.
    cum = cum.withColumn(
        "__blk",
        F.col(units_col) * (F.col("__r") * (F.col("__r") + 1) - lo * (lo + 1)),
    ).withColumn("__blk2", F.expr("__blk div 2"))
    agg = cum.groupBy(group_col).agg(
        F.sum("__cnt").alias("n"),
        F.sum(F.col(units_col) * F.col("__cnt")).alias("total_units"),
        F.sum("__blk2").alias("__s"),
    )
    # numerator stays BIGINT-exact; denominator multiplies as doubles
    # (n * total_units would overflow BIGINT before the numerator does)
    gini = (
        (2 * F.col("__s") - (F.col("n") + 1) * F.col("total_units")).cast("double")
        / (F.col("n").cast("double") * F.col("total_units").cast("double"))
    )
    return agg.where(F.col("total_units") > 0).select(
        group_col,
        "n",
        "total_units",
        F.round(gini, 6).alias("gini"),
    )
