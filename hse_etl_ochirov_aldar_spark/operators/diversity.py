"""Corpus n-gram diversity diagnostics (self-repetition health check).

Generation-quality work reports self-BLEU / distinct-n to detect a
corpus (or a model's output) collapsing onto repeated phrasing; the
curation-side analogue is a per-slice report of distinct-n-gram ratios
and unigram entropy, read before/after dedup and filtering to confirm
the pipeline raised diversity instead of destroying it. Complements
``vocab_growth_stats`` (type-token ratio over corpus growth): this is
the per-slice distinct-1/2/3 + entropy snapshot, not the growth curve.
Reference analogue: the aggregate health reports of
``build_analytical_marts.py:102-124``, upgraded to corpus diagnostics.

Cross-engine exactness: every ratio is a BIGINT integer division in
basis points; entropy follows the ``lm_score`` contract — per-count
``ln`` snapped to integer MICRO-nats before any aggregation, final
half-up integer division, ONE exact double division at the end:

    H = ln(N) - (1/N) * sum_tokens c_t * ln(c_t)        [nats]
    H_micro = ln_micro(N) - halfup(sum c_t*ln_micro(c_t), N)

Scale shape (100 TB): per n in {1,2,3} one (slice, ngram) census with
map-side partials — n-gram keys are Zipf-compressed so shuffle rows
track vocabulary, not corpus size; the n-gram arrays are row-local
(one Generate each, no joins); per-slice rollups are slice-count-sized.
No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens

MICRO = 1_000_000


def _ngram_array(toks, n: int):
    """Row-local array of space-joined n-grams of ``toks`` (1-based
    element_at; empty array when the document is shorter than n)."""
    if n == 1:
        return toks
    parts = ", ".join(f"element_at(__toks, i + {j})" for j in range(n))
    return F.when(
        F.size(toks) >= n,
        F.expr(
            f"transform(sequence(1, size(__toks) - {n - 1}), "
            f"i -> concat_ws(' ', {parts}))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_diversity_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-``group_col`` diversity report:

    - ``n_tokens``/``n_bigrams``/``n_trigrams``  BIGINT totals
    - ``distinct_unigrams``/``_bigrams``/``_trigrams``  BIGINT
    - ``ttr_bp``/``bigram_ttr_bp``/``trigram_ttr_bp``  BIGINT distinct
      ratio in basis points (10000·distinct div total; 0 when empty)
    - ``unigram_entropy``  DOUBLE Shannon entropy in nats (micro-nat
      integer pipeline, see module docstring)
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )

    def census(n: int, total_name: str, distinct_name: str) -> DataFrame:
        grams = base.select(
            "__g", F.explode(_ngram_array(F.col("__toks"), n)).alias("__t")
        )
        cnt = grams.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__c"))
        agg = [
            F.sum("__c").alias(total_name),
            F.count(F.lit(1)).alias(distinct_name),
        ]
        if n == 1:
            # entropy numerator rides the same census — no extra pass
            agg.append(
                F.sum(
                    F.col("__c")
                    * F.round(F.log("__c") * F.lit(MICRO), 0).cast("long")
                ).alias("__slc")
            )
        return cnt.groupBy("__g").agg(*agg)

    uni = census(1, "n_tokens", "distinct_unigrams")
    bi = census(2, "n_bigrams", "distinct_bigrams")
    tri = census(3, "n_trigrams", "distinct_trigrams")

    def bp(distinct: str, total: str):
        return F.when(
            F.col(total) > 0,
            F.expr(f"CAST({distinct} * 10000 div {total} AS BIGINT)"),
        ).otherwise(F.lit(0))

    ent_micro = F.round(F.log("n_tokens") * F.lit(MICRO), 0).cast(
        "long"
    ) - F.expr("(2 * __slc + n_tokens) div (2 * n_tokens)")
    return (
        uni.join(bi, "__g", "left")
        .join(tri, "__g", "left")
        .select(
            F.col("__g").alias(group_col),
            "n_tokens",
            "distinct_unigrams",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("distinct_bigrams", F.lit(0)).alias("distinct_bigrams"),
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("distinct_trigrams", F.lit(0)).alias("distinct_trigrams"),
            bp("distinct_unigrams", "n_tokens").alias("ttr_bp"),
            bp("distinct_bigrams", "n_bigrams").alias("bigram_ttr_bp"),
            bp("distinct_trigrams", "n_trigrams").alias("trigram_ttr_bp"),
            F.when(
                F.col("n_tokens") > 0,
                ent_micro.cast("double") / F.lit(float(MICRO)),
            ).alias("unigram_entropy"),
        )
    )
