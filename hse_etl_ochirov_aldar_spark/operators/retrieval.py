"""Reciprocal-rank fusion (RRF) of retrieval rankings.

Hybrid retrieval — fuse a lexical leg (BM25, Jaccard) with a dense
leg (embedding cosine) — is the standard eval-set / RAG-corpus
construction step; RRF (Cormack et al., SIGIR 2009) is the fusion
rule that needs no score calibration: each system contributes
``1/(k0 + rank)`` and the fused order is by the sum.

Engine-exactness: the contribution is held in integer micro-units
``floor(1_000_000 / (k0 + rank))`` so the fused score is a BIGINT sum
of integers — no float summation order, bit-identical in any engine,
full value-hash oracle. (At k0=60 the floor costs < 1 micro-unit of
resolution per term, far below the gaps between distinct ranks.)

Scale shape (100 TB): each leg is already a per-query top-k (tiny —
|queries| x k rows); the fusion is an outer join + aggregate over
those tiny sets, broadcast all the way. The heavy lifting stays in
the legs, which keep their own scale stories (bm25.py's
query-vocabulary-bounded census, similarity.py's broadcast-query
corpus stream).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    legs: list[DataFrame],
    k: int = 5,
    k0: int = 60,
) -> DataFrame:
    """Fuse per-query rankings into one top-``k``.

    Each leg must have columns (query_id, neighbor_id, rank) with rank
    1-based within query. A neighbor absent from a leg contributes 0
    from that leg (standard RRF). Output: (query_id, neighbor_id,
    rrf_units BIGINT, fused_rank INT), fused_rank 1..k by
    (rrf_units DESC, neighbor_id ASC) — fully deterministic.
    """
    contribs = [
        leg.select(
            "query_id",
            "neighbor_id",
            F.floor(F.lit(1_000_000) / (F.lit(k0) + F.col("rank")))
            .cast("bigint")
            .alias("__c"),
        )
        for leg in legs
    ]
    pooled = reduce(DataFrame.unionByName, contribs)
    fused = pooled.groupBy("query_id", "neighbor_id").agg(
        F.sum("__c").alias("rrf_units")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_units"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fused_rank") <= k)
        .select("query_id", "neighbor_id", "rrf_units", "fused_rank")
    )


def jaccard_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Lexical leg: top-``k`` corpus docs per query by exact token-set
    Jaccard similarity (distinct whitespace tokens of the lowercased
    text). Output (query_id, neighbor_id, jaccard, rank), rank by
    (jaccard DESC, neighbor_id ASC); zero-overlap pairs never appear
    (an inverted-index engine's behavior) and self-matches are
    excluded.

    Scale shape: query token sets broadcast; the corpus explodes ONCE
    into (neighbor, token) and the intersection census is an ordinary
    hash join on token — work bounded by corpus tokens x matching
    query terms, never |corpus| x |queries|. The Jaccard division is a
    single correctly-rounded IEEE op on exact BIGINT counts, rounded
    to 6dp — identical in any engine.
    """
    from ..functions.text import whitespace_tokens

    def toks(df, idc, alias):
        return df.select(
            F.col(idc).alias(alias),
            F.explode(
                F.array_distinct(whitespace_tokens(F.lower(F.col(text_col))))
            ).alias("token"),
        )

    q_toks = toks(queries, query_id_col, "query_id")
    q_sizes = q_toks.groupBy("query_id").agg(F.count(F.lit(1)).alias("__nq"))
    c_toks = toks(corpus, id_col, "neighbor_id")
    c_sizes = c_toks.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).alias("__nc")
    )
    inter = (
        c_toks.join(F.broadcast(q_toks), "token")
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("__ni"))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    jac = F.round(
        F.col("__ni")
        / (F.col("__nq") + F.col("__nc") - F.col("__ni")).cast("double"),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("jaccard"), F.asc("neighbor_id")
    )
    return (
        inter.join(F.broadcast(q_sizes), "query_id")
        .join(c_sizes, "neighbor_id")
        .select("query_id", "neighbor_id", jac.alias("jaccard"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
