"""Graph analytics over relational edge lists: degree census and
deterministic integer PageRank.

Connected components live in text_dedup (star contraction / min-label
/ union-find — the dedup clustering engine); this module adds the
centrality side. Everything runs on an undirected pair list
``(id_a, id_b)`` — the same shape the dedup and co-purchase queries
already produce.

PageRank here is EXACT-INTEGER: ranks are BIGINT micro-units, the
damping factor is the exact rational 85/100, and each node's
distributed share uses the signed half-up division the k-means fit
already standardized — so a fixed-iteration run is a pure function of
the edge list that DuckDB re-derives bit-for-bit (unrolled-CTE twin),
unlike float PageRank whose partial-sum order wobbles ranks across
runs. Per-share rounding means total mass is conserved only to
±0.5 micro-unit per (node, neighbor) pair per round — a diagnostic
ranking tolerance, documented rather than hidden.

Scale shape (100 TB): each iteration is one equi-join of the rank
table (one BIGINT per node) to the edge list plus one map-side-
combinable groupBy — the classic broadcast-model iteration with
O(edges) shuffle per round; localCheckpoint keeps the plan flat.
Degree census is a single groupBy over the doubled edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _undirected(pairs: DataFrame) -> DataFrame:
    """Both directions, self-loops dropped, deduped."""
    und = pairs.select("id_a", "id_b").where(
        F.col("id_a") != F.col("id_b")
    ).distinct()
    return und.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(und.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))


def degree_stats(pairs: DataFrame) -> DataFrame:
    """Per-node degree over the undirected pair list: ``id, degree``."""
    return (
        _undirected(pairs)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def pagerank_exact(
    pairs: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(id, rank_micro) after ``iters`` rounds of integer PageRank on
    the undirected graph: init 1,000,000 micro-units per node;
    update r'(v) = (100-d)% of MICRO + d% of the half-up-divided
    shares arriving from v's neighbors. ``damping_pct`` is the exact
    integer percentage (85 = the standard 0.85).

    Every node in the pair list has degree >= 1 (self-loops dropped,
    isolated nodes never appear), so there is no dangling-mass term.
    Fixed iterations, exact arithmetic: reproducible by any engine.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    edges = _undirected(pairs).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(MICRO).cast("long").alias("rank_micro")
    )
    base = (100 - damping_pct) * MICRO // 100
    # signed half-up division (functions share the convention with
    # similarity._halfup_div; ranks are non-negative so the simple
    # form suffices and the oracle mirrors it)
    for _ in range(iters):
        shares = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr(
                    "CAST((2 * rank_micro + deg) div (2 * deg) AS BIGINT)"
                ).alias("share"),
            )
        )
        ranks = (
            shares.groupBy("id")
            .agg(F.sum("share").alias("__in"))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"CAST(({damping_pct} * __in) div 100 AS BIGINT)"
                    )
                ).alias("rank_micro"),
            )
            .localCheckpoint()
        )
    return ranks
