"""BM25 ranked retrieval over a document corpus.

Okapi BM25 (Robertson et al., TREC-3) with the Lucene idf variant —
the standard lexical-retrieval primitive a training-data pipeline uses
for eval-set construction, hard-negative mining, and RAG-corpus
indexing. Reference analogue: the tf census + corpus-statistic join
idiom of the per-group mode (A7, user_mart.sql) and tfidf_top_terms,
extended with per-document length normalization.

Cross-engine exactness (functions/exact.py policy): k1 = 1.2 and
b = 0.75 are fixed exact rationals (6/5, 3/4), so each term's score

    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

with avgdl = L/N (total corpus tokens over document count) rewrites —
multiplying numerator and denominator by 10*L — to the pure BIGINT
expression

    score_micro = (idf_micro * 22 * L * tf) div (10*L*tf + 3*L + 9*dl*N)

where idf_micro = round(ln((N+1)/(df_t+0.5)) * 1e6) snaps the one
transcendental to micro-units. Every engine computes the identical
BIGINT, so rankings and value hashes match exactly. Overflow headroom
(r11, the finding-39 DECIMAL discipline): numerator and denominator
ride DECIMAL(38,0) — idf_micro(<=4e7) * 22 * L(1e15 tokens = a
100 TB corpus) * tf(1e6) ≈ 9e29 and 10*L*tf ≈ 1e22 are both exact in
38 digits, and the quotient (~2.2*idf_micro) always fits BIGINT — so
the exact-integer verification contract now holds at any realistic
corpus size (the old pure-BIGINT form wrapped past ~1e10 corpus
tokens and needed a sharding caveat).

Scale shape (100 TB corpus, small query set):
  1. dl is row-local (size of the token array) — no shuffle;
  2. N and L are a 1-row aggregate, broadcast;
  3. tokens are filtered to QUERY terms before the tf census, so the
     only corpus-sized shuffle is on (doc, query-term) — bounded by
     query vocabulary, not corpus vocabulary;
  4. df_t derives from that same bounded census;
  5. query->term map and df_t both broadcast into the score join;
  6. per-query top-k is a window partitioned by query id — never a
     global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens

MICRO = 1_000_000


def bm25_score_expr():
    """The per-(doc, term) BM25 score in micro-units as a Column over
    rows carrying idf_micro/corpus_len/tf/dl/n_docs — the pure-integer
    rewrite from the module doc, with every subterm riding
    DECIMAL(38,0) from its FIRST factor (finding-39 discipline:
    9*dl*n_docs alone reaches ~9e21 at corpus scale, so a BIGINT
    subterm would wrap before the decimal addition). Exposed as a
    helper so the wrap-regime exactness is unit-testable against
    Python bigints, not just asserted."""
    return F.expr(
        "CAST((CAST(idf_micro AS DECIMAL(38,0)) * 22"
        "      * corpus_len * tf)"
        " div (CAST(10 AS DECIMAL(38,0)) * corpus_len * tf"
        "      + CAST(3 AS DECIMAL(38,0)) * corpus_len"
        "      + CAST(9 AS DECIMAL(38,0)) * dl * n_docs)"
        " AS BIGINT)"
    )


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (k1=1.2, b=0.75 exact).

    ``queries`` is a list of (query_id, query_text); terms are the
    distinct whitespace tokens of the lowercased query text. Output:
    (query_id, doc_id, score_micro BIGINT, rank INT) with rank 1..k by
    (score desc, doc_id asc). Documents sharing no term with a query
    never appear (score 0 rows are not emitted, matching an inverted-
    index engine). Empty documents contribute dl=0 but can match no
    term, so they only affect the corpus statistics.
    """
    qterms = (
        spark.createDataFrame(queries, ["query_id", "query_text"])
        .select(
            "query_id",
            F.explode(
                F.array_distinct(whitespace_tokens(F.lower("query_text")))
            ).alias("term"),
        )
    )
    term_set = sorted({t for _, q in queries for t in q.lower().split()})

    from ._plan import spread_small_input

    # Tokenize the corpus ONCE into a narrow per-doc decision table
    # (r13, guide §8 "decide with small rows" + §5 caching): `slim`
    # carries (id, dl, query-term tokens only) — a few bytes per doc at
    # ANY scale (the token array is bounded by the query vocabulary) —
    # and is persisted so the corpus-stats aggregate and the tf census
    # both read it instead of re-running the tokenize per consumer.
    # (r12 had spread the scan below the tokenize, which moved the
    # tokenize ABOVE the one reusable exchange: each of the three
    # consumers then re-tokenized the corpus — the +30%-vs-reference
    # bm25 regression in VERDICT r12.) The spread stays: the tokenize
    # is the per-row CPU term and still wants >1 task at bench scale
    # (no-op at real scale).
    slim = (
        spread_small_input(docs.select(id_col, text_col))
        .select(
            F.col(id_col).alias("id"),
            whitespace_tokens(F.lower(F.col(text_col))).alias("toks"),
        )
        .select(
            "id",
            F.size("toks").alias("dl"),
            F.filter("toks", lambda t: t.isin(term_set)).alias("qtoks"),
        )
        .persist()
    )
    stats = slim.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("corpus_len"),
    )
    # query-term filter BEFORE the census: the shuffle is bounded by
    # |queries|*|docs|, not corpus vocabulary (scale note in module doc)
    tf = (
        slim.select("id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = dfreq.join(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                (F.col("n_docs") + F.lit(1)).cast("double")
                / (F.col("df_t") + F.lit(0.5))
            )
            * F.lit(MICRO),
            0,
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .join(F.broadcast(stats))
        .select(
            "query_id",
            "id",
            bm25_score_expr().alias("term_score_micro"),
        )
        .groupBy("query_id", "id")
        .agg(F.sum("term_score_micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias(id_col),
            "score_micro",
            "rank",
        )
    )
