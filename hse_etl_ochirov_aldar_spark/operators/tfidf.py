"""TF-IDF keyword extraction (corpus-relative term salience).

Per-document top-k terms ranked by tf·idf — the classic retrieval /
data-exploration primitive (here: what a training-data curator uses to
inspect domain drift and spot template spam). Reference analogue: the
per-group mode-via-count+rank idiom (A7, user_mart.sql) lifted from
one categorical column to the token domain.

Cross-engine exactness (functions/exact.py policy): idf snaps to
BIGINT micro-units (round(ln(N / df_t) * 1e6)) and scores are the pure
integer product tf * idf_micro, so ranking and hashes are identical in
any engine; ties break on the term string.

Scale shape (100 TB): (1) (doc, term) tf census — one shuffle with
map-side partials; (2) document-frequency census over DISTINCT
(doc, term) pairs — derived from the same shuffle output, vocabulary-
sized result; (3) 1-row corpus size broadcast; (4) term equi-join
(AQE broadcasts small vocabularies); (5) per-document top-k window —
partitioned by doc id, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens

MICRO = 1_000_000


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf.

    Output: (id, term, tf BIGINT, score_micro BIGINT, rank INT) with
    rank 1..k by (score desc, term asc). idf = ln(N / df_t) where N is
    the total document count of ``df`` and df_t the number of distinct
    documents containing the term; terms in every document score 0.
    Documents with no tokens emit no rows.
    """
    from ._plan import spread_small_input

    tf = (
        # spread the scan before the tokenize explode so the Generate
        # runs parallel (r12 serialized-Generate fix; no-op at scale)
        spread_small_input(df.select(id_col, text_col))
        .select(
            F.col(id_col).alias("id"),
            F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    idf = dfreq.join(F.broadcast(n_docs)).select(
        "term",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.col("df_t")) * F.lit(MICRO), 0
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = tf.join(idf, "term").select(
        "id",
        "term",
        "tf",
        (F.col("tf") * F.col("idf_micro")).alias("score_micro"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "score_micro", "rank")
    )
