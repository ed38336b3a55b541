"""Deterministic Poisson bootstrap for distributed confidence intervals.

The resampling-with-replacement bootstrap is driver-hostile at scale (a
true resample shuffles the whole table R times). The POISSON bootstrap
(Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012 — the standard streaming/MapReduce formulation) replaces
each replica's multinomial row counts with independent Poisson(1)
weights, which are ROW-LOCAL: every replica's weighted sums fall out of
ONE scan with map-side partial aggregation, and only R moment rows per
partition ever shuffle.

Determinism/auditability: the per-(row, replica) weight is the inverse
Poisson(1) CDF applied to a uniform derived from md5 of the row key —
one md5 per 4 replicas (each digest yields four 32-bit slices), the
same cross-engine trick as operators/text_dedup.md5_hash32, so a DuckDB
oracle reproduces every weight and therefore every replica mean
bit-for-bit. A rand()-seeded bootstrap cannot be audited at all and is
not reproducible across retries of a failed partition; this one is.

Exactness: y snaps to integer units, so each replica's weighted sum
(weight BIGINT x units BIGINT, lifted to DECIMAL(38,0) for the sum) is
order-independent; each replica mean is one double division over exact
integers, rounded to 6dp. The CI bounds are order statistics of the R
replica means — R is small (default 32), so the final reduce is a
sort_array over an R-element list, not a distributed sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["POISSON1_CDF", "poisson_bootstrap_mean", "poisson_weight_expr"]

# Cumulative Poisson(lambda=1) CDF; u < CDF[k] with k the first match
# gives the inverse-CDF draw. 12 terms reach 1 - 8e-10 — beyond that the
# weight caps at 12, identically in both engines. Literals are embedded
# verbatim in the oracle SQL so both sides compare against the same
# doubles.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
    0.9999998885745216,
    0.9999999899522336,
    0.9999999991683892,
]


def _u32_slice(key: Column, block: int, j: int) -> Column:
    """Uniform in (0,1) from hex slice j (0..3) of md5(key || ':' || block).

    (value + 0.5) / 2^32 keeps u strictly inside (0,1) so the inverse
    CDF below never sees an endpoint.
    """
    digest = F.md5(F.concat(key.cast("string"), F.lit(f":{block}")))
    v = F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long")
    return (v.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)


def poisson_weight_expr(key: Column, replica: int) -> Column:
    """Poisson(1) weight for one replica: inverse CDF on the replica's
    md5-uniform. Replica r uses slice r%4 of digest block r//4."""
    u = _u32_slice(key, replica // 4, replica % 4)
    w: Column = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def poisson_bootstrap_mean(
    df: DataFrame,
    key: Column,
    y_units: Column,
    y_scale: float = 1.0,
    replicas: int = 32,
) -> DataFrame:
    """One-row CI summary for mean(y): point estimate plus the 2nd
    smallest / 2nd largest of ``replicas`` Poisson-bootstrap replica
    means (for R=32 a ~93.75% percentile interval; pick R to taste).

    ONE scan computes all R weighted sums as 2R aggregate columns (no
    row explosion: a 32-replica bootstrap of 100 TB multiplies nothing
    by 32 — each partition emits 2R+2 numbers). Output: n, point_mean,
    ci_lo, ci_hi, n_replicas.
    """
    from ._plan import spread_small_input

    # Project to (key, y) THEN spread (r12): the per-row weight term is
    # replicas/4 md5 evaluations + replicas CDF case-chains, evaluated
    # in the aggregate's partial phase — on a small single-file scan
    # that serializes every md5 on one core (guide §2.3/§2.5 shape:
    # 4.2s -> ~0.7s at sf0.1). The projection keeps the round-robin
    # exchange to two columns; at real scale the spread no-ops and the
    # plan is the same single-pass 2R-column aggregate.
    base = spread_small_input(
        df.select(key.alias("__bk"), y_units.alias("__by"))
    )
    y_units = F.col("__by")
    # Layered projections (r12, the link-extraction lesson): digests
    # then uniforms as REAL columns before the aggregate. Inlined into
    # the CASE chains, each digest is re-derived per slice and each
    # uniform per CDF comparison (~12x), multiplying the md5/conv work
    # ~50x per row — measured 3.5s for the weight projection alone at
    # sf0.1 vs ~0.2s layered. CollapseProject keeps non-cheap aliases
    # referenced more than once un-inlined, so the layering pins
    # single evaluation; the aggregate itself is unchanged.
    n_blocks = (replicas + 3) // 4
    dig = base.select(
        "__by",
        *[
            F.md5(F.concat(F.col("__bk").cast("string"), F.lit(f":{b}")))
            .alias(f"__dg{b}")
            for b in range(n_blocks)
        ],
    )
    us = dig.select(
        "__by",
        *[
            (
                (
                    F.conv(
                        F.substring(
                            F.col(f"__dg{r // 4}"), 1 + 8 * (r % 4), 8
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .cast("double")
                    + F.lit(0.5)
                )
                / F.lit(4294967296.0)
            ).alias(f"__u{r}")
            for r in range(replicas)
        ],
    )

    def _w(r: int) -> Column:
        u = F.col(f"__u{r}")
        w: Column = F.lit(len(POISSON1_CDF))
        for k in range(len(POISSON1_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
        return w.cast("long")

    dec = "decimal(38,0)"
    aggs = [
        F.count(F.when(y_units.isNotNull(), 1)).alias("n"),
        F.sum(y_units.cast(dec)).alias("sy"),
    ]
    for r in range(replicas):
        w = F.when(y_units.isNotNull(), _w(r))
        aggs.append(F.sum((w * y_units).cast(dec)).alias(f"ws_{r}"))
        aggs.append(F.sum(w.cast(dec)).alias(f"wn_{r}"))
    wide = us.agg(*aggs)
    mean_r = [
        F.round(
            F.col(f"ws_{r}").cast("double")
            / F.col(f"wn_{r}").cast("double")
            * F.lit(y_scale),
            6,
        )
        for r in range(replicas)
    ]
    means_arr = F.array(*mean_r)
    means = F.sort_array(means_arr)
    # A replica whose Poisson weights all drew 0 (possible on tiny
    # inputs: wn_r = 0) has a NULL mean; sort_array places NULLs FIRST,
    # which would silently shift ci_lo/ci_hi onto the wrong order
    # statistics. With any replica missing, positions 2 and R-1 no
    # longer carry the advertised coverage — so the CI is NULLed
    # outright instead of quietly mis-indexed.
    all_means_present = F.size(F.array_compact(means_arr)) == F.lit(replicas)
    return wide.select(
        F.col("n"),
        F.round(
            F.col("sy").cast("double") / F.col("n").cast("double") * F.lit(y_scale),
            6,
        ).alias("point_mean"),
        F.when(all_means_present, F.element_at(means, 2)).alias("ci_lo"),
        F.when(all_means_present, F.element_at(means, replicas - 1)).alias("ci_hi"),
        F.lit(replicas).cast("int").alias("n_replicas"),
    )
