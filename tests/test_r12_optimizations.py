"""Focused pins for the r12 optimization-round rewrites: each test
pins an equivalence or guard the optimization relies on, so a later
refactor cannot silently undo it.

- spread_small_input's already-repartitioned no-op (the guard that
  lets queries pre-spread their scans without paying a second
  round-robin exchange when an operator's own spread fires);
- the layered Poisson-bootstrap weights == the original single
  expression per (row, replica) — the layering exists purely to pin
  single evaluation of the md5/conv uniform;
- pmi's row-local adjacent-slice bigrams == the window-lead
  formulation they replaced (the removed full-corpus shuffle).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators._plan import spread_small_input


def test_spread_noop_on_already_repartitioned_plan(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    spread_once = spread_small_input(base)
    # the guard fired on the small scan: an explicit repartition is in
    # the optimized plan now
    plan_once = spread_once._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" in plan_once
    # a second spread over the same frame must NOT stack another one
    spread_twice = spread_small_input(spread_once)
    assert spread_twice is spread_once
    # and a derived projection over it is likewise left alone
    derived = spread_once.select("doc_id")
    assert spread_small_input(derived) is derived


def test_bootstrap_layered_weights_match_inline_expression(spark, sf_dir):
    """The r12 layered digest/uniform projections must reproduce the
    original inline poisson_weight_expr weight for every (row, replica)
    — bit-identical, not approximately."""
    from hse_etl_ochirov_aldar_spark.operators.bootstrap import (
        POISSON1_CDF,
        poisson_weight_expr,
    )

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("__bk"))
        .limit(500)
    )
    replicas = 8
    inline = orders.select(
        "__bk",
        *[
            poisson_weight_expr(F.col("__bk"), r).alias(f"w{r}")
            for r in range(replicas)
        ],
    )

    # the layered form exactly as poisson_bootstrap_mean builds it
    n_blocks = (replicas + 3) // 4
    dig = orders.select(
        "__bk",
        *[
            F.md5(F.concat(F.col("__bk").cast("string"), F.lit(f":{b}")))
            .alias(f"__dg{b}")
            for b in range(n_blocks)
        ],
    )
    us = dig.select(
        "__bk",
        *[
            (
                (
                    F.conv(
                        F.substring(F.col(f"__dg{r // 4}"), 1 + 8 * (r % 4), 8),
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

    def w_of(r):
        u = F.col(f"__u{r}")
        w = F.lit(len(POISSON1_CDF))
        for k in range(len(POISSON1_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
        return w.cast("long")

    layered = us.select(
        "__bk", *[w_of(r).alias(f"w{r}") for r in range(replicas)]
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, layered.collect())
    )


def test_pmi_rowlocal_bigrams_match_window_lead(spark, sf_dir):
    """Adjacent-slice bigrams (r12, shuffle-free) == lead() over a
    per-document position window (the replaced formulation)."""
    from hse_etl_ochirov_aldar_spark.functions.text import whitespace_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    toks = docs.select(
        F.col("doc_id").alias("__id"),
        F.posexplode(whitespace_tokens(F.lower(F.col("text")))).alias(
            "__pos", "__tok"
        ),
    )
    wd = Window.partitionBy("__id").orderBy("__pos")
    ref = (
        toks.select(
            F.col("__tok").alias("w1"),
            F.lead("__tok", 1).over(wd).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    base = docs.select(
        whitespace_tokens(F.lower(F.col("text"))).alias("__ts")
    )
    n1 = F.greatest(F.size("__ts") - 1, F.lit(0))
    new = (
        base.select(
            F.explode(
                F.zip_with(
                    F.slice("__ts", 1, n1),
                    F.slice("__ts", 2, n1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("__bg")
        )
        .select("__bg.w1", "__bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert sorted(map(tuple, ref.collect())) == sorted(
        map(tuple, new.collect())
    )
