"""Unigram language-model scoring (perplexity-style quality filter).

The classic cheap LM quality signal for corpus curation: score every
document by its mean token log-probability under the corpus's OWN
add-k-smoothed unigram model, then drop the tail. (The production
variant scores against a reference-domain LM — same plumbing, the
count table just comes from a different corpus.) Reference analogue:
the quality-rule screens applied before load
(mongo_to_postgres_replication.py:205-215), upgraded from per-row
CHECKs to a corpus-relative statistical screen.

Cross-engine exactness: per-token log-probs are snapped to integer
MICRO-units (round(ln(p) * 1e6) as BIGINT) before any aggregation, so
document scores are order-independent integer sums (functions/exact.py
policy), and threshold tests compare ``lp_sum >= thr_micro * n_tokens``
in pure BIGINT arithmetic — no float aggregate ever crosses an engine
boundary.

Scale shape (100 TB): (1) token census — groupBy token with map-side
partial aggregation (shuffle rows ~= vocabulary, Zipf-compressed);
(2) one broadcast of the 1-row corpus totals; (3) score join tokens ->
log-prob table — Zipf-skewed on stopwords, which AQE skew-join splits
(a broadcast top-K + shuffle remainder split is the manual upgrade);
(4) per-document regroup. No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens

MICRO = 1_000_000


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing_k: float = 1.0,
    model_df: DataFrame | None = None,
    model_text_col: str | None = None,
) -> DataFrame:
    """``df`` + per-document unigram-LM score columns:

    - ``n_tokens``   BIGINT token count (lowercased whitespace tokens)
    - ``lp_micro``   BIGINT sum of per-token round(ln(p) * 1e6)
    - ``avg_logprob`` DOUBLE convenience (lp_micro / (1e6 * n_tokens))

    ``p(tok) = (count + k) / (total + k * vocab)`` with counts taken
    from ``model_df`` (defaults to ``df`` itself — self-scoring).
    Documents with no tokens get n_tokens=0, lp_micro=0, null avg.
    """
    model = model_df if model_df is not None else df
    mcol = model_text_col or text_col
    toks = df.select(id_col, F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("__tok"))
    mtoks = model.select(F.explode(whitespace_tokens(F.lower(F.col(mcol)))).alias("__tok"))
    counts = mtoks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.agg(
        F.sum("__c").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    k = float(smoothing_k)
    lp = counts.join(F.broadcast(totals)).select(
        "__tok",
        F.round(
            F.log(
                (F.col("__c") + F.lit(k))
                / (F.col("__total") + F.lit(k) * F.col("__vocab"))
            )
            * F.lit(MICRO),
            0,
        )
        .cast("long")
        .alias("__lp"),
    )
    # Out-of-vocabulary tokens (possible only when scoring against a
    # separate model corpus) get the smoothed unknown-token mass
    # k / (total + k*vocab) instead of silently dropping out.
    unk = totals.select(
        F.round(
            F.log(F.lit(k) / (F.col("__total") + F.lit(k) * F.col("__vocab")))
            * F.lit(MICRO),
            0,
        )
        .cast("long")
        .alias("__unk")
    )
    per_doc = (
        toks.join(lp, "__tok", "left")
        .join(F.broadcast(unk))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("__lp"), F.col("__unk"))).alias("lp_micro"),
        )
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
        .withColumn("lp_micro", F.coalesce(F.col("lp_micro"), F.lit(0)))
        .withColumn(
            "avg_logprob",
            F.when(
                F.col("n_tokens") > 0,
                F.col("lp_micro").cast("double")
                / (F.lit(float(MICRO)) * F.col("n_tokens")),
            ),
        )
    )


def keep_by_avg_logprob(scored: DataFrame, threshold: float) -> DataFrame:
    """Keep documents whose mean token log-prob >= ``threshold``,
    tested as ``lp_micro >= thr_micro * n_tokens`` in BIGINT space
    (exact; empty documents are dropped)."""
    thr_micro = int(round(threshold * MICRO))
    return scored.where(
        (F.col("n_tokens") > 0)
        & (F.col("lp_micro") >= F.lit(thr_micro) * F.col("n_tokens"))
    )
