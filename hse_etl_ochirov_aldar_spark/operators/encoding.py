"""Leakage-safe k-fold target encoding (mean encoding).

The gradient-boosting / tabular-ML staple: replace a categorical
feature with the mean of the target over OTHER folds' rows of the same
category — never a row's own fold, so the encoding carries no direct
target leakage into cross-validation. Reference analogue: the
reference's marts compute per-group means (build_analytical_marts.py
AVG aggregates); this is the same aggregate re-deployed as a
training-feature transform with the fold-exclusion contract.

Produces the encoding TABLE (category x fold), not encoded rows: at
100 TB you broadcast-join this bounded table back onto the fact rows;
emitting per-row encodings from here would force a row-scale output
for what is logically a dimension artifact.

Exactness: fold membership is the md5 hash bucket (sampling.hash_bucket
— engine-recomputable, row-local, retry-stable, unlike randomSplit);
sums are exact integer units; the leave-fold-out mean is BIGINT
arithmetic until one final half-up division (functions/exact.py).

Scale shape (100 TB): ONE map-side-combined groupBy(category, fold)
partial over the facts — shuffle rows ~ |categories| * k, never row
scale; the per-category totals re-aggregate THAT partial (integer sums
are associative, so two-level aggregation stays exact); the per-fold
totals (k rows) and global totals (1 row) used by the prior ride in
as broadcast aggregates of that same partial. No window, no sort, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import avg_units_expr
from .sampling import hash_bucket


def kfold_target_encode(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    target_col: str | Column,
    k: int = 5,
    scale: int = 2,
) -> DataFrame:
    """Leave-fold-out mean-encoding table for ``cat_col``.

    Output, one row per (category, fold) present in the data:

    - ``category, fold``
    - ``n_in_fold``    rows of this category in this fold
    - ``n_out``        rows of this category OUTSIDE the fold (the
                       encoding's support)
    - ``enc``          DOUBLE leave-fold-out mean of the target,
                       half-up rounded to ``scale`` decimals; when the
                       category appears ONLY in this fold (n_out = 0)
                       it falls back to the global leave-fold-out mean
                       — the prior a production encoder ships for
                       unseen/rare categories
    - ``is_prior``     whether the fallback fired

    ``target_col`` must already be in exact integer units (BIGINT,
    e.g. ``units(F.col("price"))``) at ``scale`` decimals.
    """
    target = F.col(target_col) if isinstance(target_col, str) else target_col
    fold = hash_bucket(F.col(key_col), k)
    partial = (
        df.select(
            F.col(cat_col).alias("category"),
            fold.alias("fold"),
            target.alias("__t"),
        )
        .groupBy("category", "fold")
        .agg(F.count(F.lit(1)).alias("n_in_fold"), F.sum("__t").alias("s_in_fold"))
    )
    cat_totals = partial.groupBy("category").agg(
        F.sum("n_in_fold").alias("n_cat"), F.sum("s_in_fold").alias("s_cat")
    )
    fold_totals = partial.groupBy("fold").agg(
        F.sum("n_in_fold").alias("n_fold"), F.sum("s_in_fold").alias("s_fold")
    )
    global_totals = partial.agg(
        F.sum("n_in_fold").alias("n_all"), F.sum("s_in_fold").alias("s_all")
    )
    j = (
        partial.join(cat_totals, "category")
        .join(F.broadcast(fold_totals), "fold")
        .crossJoin(F.broadcast(global_totals))
    )
    n_out = F.col("n_cat") - F.col("n_in_fold")
    enc_out = avg_units_expr("(s_cat - s_in_fold)", "(n_cat - n_in_fold)", scale, scale)
    # Global prior is ALSO leave-fold-out: the ENTIRE fold (every
    # category's rows in it, not just this category's) is removed from
    # the global mean, so the fallback never sees any validation-fold
    # target. Subtracting only this category's in-fold rows would leave
    # other categories' same-fold targets inside the prior — a leak.
    enc_prior = avg_units_expr("(s_all - s_fold)", "(n_all - n_fold)", scale, scale)
    return j.select(
        "category",
        F.col("fold").cast("int").alias("fold"),
        F.col("n_in_fold").cast("long").alias("n_in_fold"),
        n_out.cast("long").alias("n_out"),
        F.when(n_out > 0, enc_out).otherwise(enc_prior).alias("enc"),
        (n_out == 0).alias("is_prior"),
    )
