"""Inter-rater agreement (Cohen's kappa) for label / screen QA.

The labeling-pipeline staple: when two annotators — human raters, two
quality classifiers, an old and a new screen — judge the same items,
raw percent agreement overstates consistency because both judges can
agree by chance. Cohen's kappa corrects for the chance-agreement floor:
kappa = (p_o - p_e) / (1 - p_e). Training-data use: gate a screen
replacement on kappa against the incumbent, audit rater pools, detect
a drifted classifier. Reference analogue: the reference's CHECK-style
quality gates (mongo_to_postgres_replication.py:205-215) are single
judges; this is the two-judge meta-QA over them.

Exactness: the whole statistic reduces to FOUR confusion counts. With
n = n11+n10+n01+n00, a1/b1 the marginal pass counts:

    kappa = (n*(n11+n00) - (a1*b1 + a0*b0))
            / (n*n       - (a1*b1 + a0*b0))

— pure BIGINT numerator/denominator, ONE final double division,
half-even rounded to 6dp. Valid while n <= ~3e9 (n*n within BIGINT);
beyond that, shard the items, sum the per-shard confusion counts (they
are associative), and apply the same closed form to the merged counts
— the aggregation, not the formula, is what scales.

Scale shape (100 TB): one scan, one 4-way conditional aggregate with
map-side partials; output is a single row. No shuffle beyond the
1-row final combine, no window, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cohens_kappa(df: DataFrame, judge_a: Column, judge_b: Column) -> DataFrame:
    """One-row agreement report for two boolean judge columns.

    Rows where either judge is NULL are excluded (no verdict — counted
    in ``n_unjudged``). Columns: ``n_items, n_both_pass, n_only_a,
    n_only_b, n_neither, p_o, p_e, kappa, n_unjudged``. ``kappa`` is
    NULL when the denominator is 0 (both judges constant — chance
    agreement is total, kappa undefined).
    """
    both = judge_a.isNotNull() & judge_b.isNotNull()
    cell = lambda a, b: F.sum(  # noqa: E731
        F.when(both & (judge_a == a) & (judge_b == b), 1).otherwise(0)
    )
    counts = df.agg(
        cell(True, True).alias("n11"),
        cell(True, False).alias("n10"),
        cell(False, True).alias("n01"),
        cell(False, False).alias("n00"),
        F.sum(F.when(~both, 1).otherwise(0)).alias("n_unjudged"),
    )
    n = F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")
    a1, a0 = F.col("n11") + F.col("n10"), F.col("n01") + F.col("n00")
    b1, b0 = F.col("n11") + F.col("n01"), F.col("n10") + F.col("n00")
    chance = a1 * b1 + a0 * b0
    num = n * (F.col("n11") + F.col("n00")) - chance
    den = n * n - chance
    return counts.select(
        n.cast("long").alias("n_items"),
        F.col("n11").cast("long").alias("n_both_pass"),
        F.col("n10").cast("long").alias("n_only_a"),
        F.col("n01").cast("long").alias("n_only_b"),
        F.col("n00").cast("long").alias("n_neither"),
        F.round(
            (F.col("n11") + F.col("n00")).cast("double") / n.cast("double"), 6
        ).alias("p_o"),
        F.round(chance.cast("double") / (n * n).cast("double"), 6).alias("p_e"),
        F.when(
            den != 0, F.round(num.cast("double") / den.cast("double"), 6)
        ).alias("kappa"),
        F.col("n_unjudged").cast("long").alias("n_unjudged"),
    )
