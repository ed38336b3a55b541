"""Unit/invariant tests for the r5 operators: deletion-neighborhood
fuzzy join, market-basket lift, A-ES weighted sampling, stratified
k-fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.basket import basket_pair_lift
from hse_etl_ochirov_aldar_spark.operators.fuzzy_join import (
    deletion_variants,
    fuzzy_self_join,
)
from hse_etl_ochirov_aldar_spark.operators.sampling import (
    stratified_kfold,
    weighted_sample_topk,
)


# ---------------------------------------------------------------- fuzzy join


def test_fuzzy_join_exact_recall_vs_brute_force(spark):
    """Blocking must lose NO pair: compare against the cartesian
    levenshtein join on a vocabulary with substitutions, insertions,
    deletions, duplicates-at-distance-0, and far-apart words."""
    words = [
        "kitten", "sitten", "mitten",   # substitutions
        "kitte", "kittens",             # deletion / insertion
        "kitten",                       # exact duplicate (d=0)
        "banana", "bananas", "banan",   # a second cluster
        "orange",                       # far from everything
        "", "a",                        # empty-string edge
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id INT, w STRING"
    )
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_self_join(df, "id", "w").collect()
    }
    a = df.select(F.col("id").alias("ia"), F.col("w").alias("wa"))
    b = df.select(F.col("id").alias("ib"), F.col("w").alias("wb"))
    want = {
        (r.ia, r.ib)
        for r in a.crossJoin(b)
        .where(
            (F.col("ia") < F.col("ib"))
            & (F.levenshtein("wa", "wb") <= 1)
        )
        .collect()
    }
    assert got == want and want, "blocking must equal brute force"


def test_deletion_variants_edges(spark):
    df = spark.createDataFrame([("",), ("a",), ("ab",)], "s STRING")
    rows = {
        r.s: sorted(r.v)
        for r in df.select("s", deletion_variants("s").alias("v")).collect()
    }
    assert rows[""] == [""]
    assert rows["a"] == ["", "a"]
    assert rows["ab"] == ["a", "ab", "b"]


def test_fuzzy_join_rejects_d2(spark):
    df = spark.createDataFrame([(1, "x")], "id INT, w STRING")
    with pytest.raises(ValueError):
        fuzzy_self_join(df, "id", "w", max_dist=2)


# ---------------------------------------------------------------- basket


def test_basket_lift_census(spark):
    """Hand-checkable census: 4 baskets over items {1,2,3}; the
    duplicate line in basket 10 must NOT inflate support (presence
    semantics), and lift must be the exact n*ab/(a*b) ratio."""
    rows = [
        (10, 1), (10, 2), (10, 2),   # dup line: support counts baskets
        (20, 1), (20, 2),
        (30, 1), (30, 3),
        (40, 3),
    ]
    df = spark.createDataFrame(rows, "b INT, i INT")
    got = {
        (r.item_a, r.item_b): (r.supp_ab, r.supp_a, r.supp_b, r.lift)
        for r in basket_pair_lift(df, "b", "i", min_support=1).collect()
    }
    # n_baskets=4; supp: 1->3, 2->2, 3->2
    assert got[(1, 2)] == (2, 3, 2, round(4 * 2 / (3 * 2), 6))
    assert got[(1, 3)] == (1, 3, 2, round(4 * 1 / (3 * 2), 6))
    assert (2, 3) not in got  # never co-occur


def test_basket_lift_cap_drops_mega_basket(spark):
    """A basket over the cap contributes NOTHING — neither pairs nor
    item supports nor the basket denominator."""
    rows = [(1, i) for i in range(10)] + [(2, 1), (2, 2), (3, 1), (3, 2)]
    df = spark.createDataFrame(rows, "b INT, i INT")
    out = basket_pair_lift(df, "b", "i", min_support=1, max_basket=5)
    got = {
        (r.item_a, r.item_b): (r.supp_ab, r.supp_a, r.supp_b, r.lift)
        for r in out.collect()
    }
    # only baskets 2 and 3 survive: n=2, supp(1)=supp(2)=2, pair twice
    assert got == {(1, 2): (2, 2, 2, round(2 * 2 / (2 * 2), 6))}


# ---------------------------------------------------------------- sampling


def test_weighted_sample_props(spark):
    df = spark.createDataFrame(
        [(i, 1 if i < 90 else 1000) for i in range(100)],
        "id INT, w INT",
    )
    # k >= n returns everything
    assert weighted_sample_topk(df, "id", "w", 500).count() == 100
    # determinism: identical sets across runs and partitionings
    s1 = {r.id for r in weighted_sample_topk(df, "id", "w", 10).collect()}
    s2 = {
        r.id
        for r in weighted_sample_topk(
            df.repartition(7), "id", "w", 10
        ).collect()
    }
    assert s1 == s2 and len(s1) == 10
    # weight dominance: the ten 1000x-weighted rows crowd out the
    # ninety weight-1 rows almost surely (P[miss one] ~ (1/1000)-scale)
    heavy = set(range(90, 100))
    assert len(s1 & heavy) >= 8


def test_stratified_kfold_balance_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(101)],
        "id INT, g STRING",
    )
    out = stratified_kfold(df, "id", "g", k=5)
    assert out.count() == 101  # every row exactly once
    sizes = {
        (r.g, r.fold): r.n
        for r in out.groupBy("g", "fold").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for g in ("a", "b"):
        per = [sizes.get((g, f), 0) for f in range(5)]
        assert max(per) - min(per) <= 1, (g, per)
    # pure function of (key, stratum, k): partitioning-independent
    again = {
        (r.id, r.fold)
        for r in stratified_kfold(df.repartition(9), "id", "g", k=5).collect()
    }
    assert again == {(r.id, r.fold) for r in out.collect()}
