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
    # pre-aggregate (doc, tok) occurrence counts BEFORE the lp join
    # (r13, guide §2.3 "aggregate before you shuffle"): the groupBy
    # partial-aggregates map-side, so the exchange and the token join
    # carry one row per DISTINCT (doc, token) instead of one per token
    # occurrence. sum(k * lp) over the compressed rows is the identical
    # BIGINT fold (multiplication of exact integers).
    per_tok = toks.groupBy(id_col, "__tok").agg(
        F.count(F.lit(1)).alias("__k")
    )
    per_doc = (
        per_tok.join(lp, "__tok", "left")
        .join(F.broadcast(unk))
        .groupBy(id_col)
        .agg(
            F.sum("__k").alias("n_tokens"),
            F.sum(
                F.col("__k") * F.coalesce(F.col("__lp"), F.col("__unk"))
            ).alias("lp_micro"),
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


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``df`` + interpolated-bigram-LM score columns — the one-notch-up
    quality screen over the unigram model (context-sensitive: penalizes
    word salad that unigram frequency alone scores well).

    Model: add-1-smoothed bigram interpolated with the add-1 unigram at
    the exact rational λ = 3/4:

        p(cur | prev) = (3·(c2+1)/(c_prev+V) + (cu+1)/(T+V)) / 4

    (c2 = bigram count, c_prev/cu = unigram counts, T = corpus tokens,
    V = vocabulary). A document scores its first token with the
    unigram model and every later token with the interpolated bigram;
    per-token log-probs snap to BIGINT micro-units before summation
    (module exactness contract), and λ, k are fixed rationals so both
    engines evaluate the identical parenthesized double expression
    before the one ln/round snap.

    Output columns: ``n_tokens`` BIGINT, ``lp2_micro`` BIGINT (full
    interpolated score sum), ``avg_logprob2`` DOUBLE convenience.
    Self-scoring only (the model is ``df`` itself) — the cross-corpus
    variant needs OOV mass plumbing like unigram_logprob_scores.

    Scale shape (100 TB): bigram census shuffles (prev, cur) pairs —
    Zipf-compressed like the vocabulary census but wider; the scoring
    join is on the same pair keys; totals broadcast; one per-document
    regroup. All joins are equi-joins on token keys; no Python.
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    n = F.size("__toks")
    pairs = base.select(
        "__id",
        F.arrays_zip(
            F.slice("__toks", 1, F.greatest(n - 1, F.lit(0))).alias("prev"),
            F.expr("slice(__toks, 2, greatest(size(__toks) - 1, 0))").alias(
                "cur"
            ),
        ).alias("__bi"),
    ).select("__id", F.explode("__bi").alias("__p")).select(
        "__id",
        F.col("__p.prev").alias("__prev"),
        F.col("__p.cur").alias("__cur"),
    )
    uni = base.select(F.explode("__toks").alias("__tok")).groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__c")
    )
    totals = uni.agg(
        F.sum("__c").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    bi = pairs.groupBy(
        F.col("__prev").alias("__bprev"), F.col("__cur").alias("__bcur")
    ).agg(F.count(F.lit(1)).alias("__c2"))
    cp = uni.select(F.col("__tok").alias("__prev"), F.col("__c").alias("__cp"))
    cu = uni.select(F.col("__tok").alias("__cur"), F.col("__c").alias("__cu"))
    p2 = (F.col("__c2") + F.lit(1.0)) / (F.col("__cp") + F.col("__vocab"))
    p1 = (F.col("__cu") + F.lit(1.0)) / (F.col("__total") + F.col("__vocab"))
    bigram_lp = (
        pairs.join(
            bi,
            (F.col("__prev") == F.col("__bprev"))
            & (F.col("__cur") == F.col("__bcur")),
        )
        .join(cp, "__prev")
        .join(cu, "__cur")
        .join(F.broadcast(totals))
        .select(
            "__id",
            F.round(
                F.log((F.lit(3.0) * p2 + p1) / F.lit(4.0)) * F.lit(MICRO), 0
            )
            .cast("long")
            .alias("__lp"),
        )
    )
    first_lp = (
        base.where(n > 0)
        .select("__id", F.col("__toks")[0].alias("__cur"))
        .join(cu, "__cur")
        .join(F.broadcast(totals))
        .select(
            "__id",
            F.round(F.log(p1) * F.lit(MICRO), 0).cast("long").alias("__lp"),
        )
    )
    per_doc = (
        bigram_lp.unionByName(first_lp)
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("__lp").alias("lp2_micro"))
    )
    return (
        df.join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .drop("__id")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
        .withColumn("lp2_micro", F.coalesce(F.col("lp2_micro"), F.lit(0)))
        .withColumn(
            "avg_logprob2",
            F.when(
                F.col("n_tokens") > 0,
                F.col("lp2_micro").cast("double")
                / (F.lit(float(MICRO)) * F.col("n_tokens")),
            ),
        )
    )


def _lp_table(tokens: DataFrame, k: float):
    """(per-token log-prob table, 1-row unknown-token mass) for an
    add-``k``-smoothed unigram model over a ``__tok`` column. Log-probs
    snap to integer micro-units (the module's exactness contract)."""
    counts = tokens.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.agg(
        F.sum("__c").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    denom = F.col("__total") + F.lit(k) * F.col("__vocab")
    lp = counts.join(F.broadcast(totals)).select(
        "__tok",
        F.round(F.log((F.col("__c") + F.lit(k)) / denom) * F.lit(MICRO), 0)
        .cast("long")
        .alias("__lp"),
    )
    unk = totals.select(
        F.round(F.log(F.lit(k) / denom) * F.lit(MICRO), 0)
        .cast("long")
        .alias("__unk")
    )
    return lp, unk


def importance_weights(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    smoothing_k: float = 1.0,
) -> DataFrame:
    """Data-selection importance weights (the DSIR recipe, Xie et al.
    2023, word-unigram instantiation): weight every raw document by

        imp(doc) = sum over tokens [ln p_target(tok) - ln p_raw(tok)]

    where ``p_target`` is an add-k unigram model over ``target_df``
    (the small curated domain you want more of) and ``p_raw`` is the
    model over ``df`` itself. Positive = more target-like than the raw
    corpus average. Adds BIGINT ``n_tokens`` and ``imp_micro`` (sum of
    per-token micro-unit log-ratios — order-independent integer sum).

    Scale shape (100 TB raw, dim-sized target): the raw corpus is
    tokenized ONCE; two vocabulary censuses (shuffle rows ~ vocabulary,
    Zipf-compressed, map-side partials), each log-prob table joined to
    the token stream on the token key (AQE handles stopword skew), one
    per-document regroup. Tokens unseen by a model get its smoothed
    unknown mass, so OOV never silently drops out of the sum.
    """
    mcol = target_text_col or text_col
    toks = df.select(
        id_col, F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("__tok")
    )
    ttoks = target_df.select(
        F.explode(whitespace_tokens(F.lower(F.col(mcol)))).alias("__tok")
    )
    lp_t, unk_t = _lp_table(ttoks, float(smoothing_k))
    lp_r, unk_r = _lp_table(toks.select("__tok"), float(smoothing_k))
    per_doc = (
        toks.join(lp_t.withColumnRenamed("__lp", "__lp_t"), "__tok", "left")
        .join(lp_r.withColumnRenamed("__lp", "__lp_r"), "__tok", "left")
        .join(F.broadcast(unk_t.withColumnRenamed("__unk", "__unk_t")))
        .join(F.broadcast(unk_r.withColumnRenamed("__unk", "__unk_r")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.coalesce(F.col("__lp_t"), F.col("__unk_t"))
                - F.coalesce(F.col("__lp_r"), F.col("__unk_r"))
            ).alias("imp_micro"),
        )
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
        .withColumn("imp_micro", F.coalesce(F.col("imp_micro"), F.lit(0)))
    )


def perplexity_buckets(
    scored: DataFrame,
    group_cols: list[str] | None = None,
    lo: float = 1.0 / 3.0,
    hi: float = 2.0 / 3.0,
) -> DataFrame:
    """Per-group head/middle/tail partitioning by LM score (the CCNet
    recipe: bucket each language's documents by perplexity tertile and
    treat the head as highest-quality). Input is ``unigram_logprob_scores``
    output; adds ``ppl_bucket``: head = highest mean log-prob (lowest
    perplexity), tail = lowest; empty documents get 'empty'.

    Thresholds are per-group exact interpolated percentiles of the mean
    log-prob — a grouped bounds aggregate broadcast back onto the data
    (same shape as grouped_percentile_trim: no per-group global sort, no
    rank window over the corpus; the bounds frame is group-cardinality-
    sized). The mean is ONE float division of two BIGINTs and the
    interpolation formula is shared by Spark and DuckDB, so bucket
    membership is engine-portable (grouped_percentile_trim precedent).
    """
    group_cols = group_cols or ["lang"]
    avg = F.col("lp_micro") / (F.lit(float(MICRO)) * F.col("n_tokens"))
    nonempty = scored.where(F.col("n_tokens") > 0).withColumn("__avg", avg)
    bounds = nonempty.groupBy(*group_cols).agg(
        F.percentile(F.col("__avg"), F.lit(lo)).alias("__t_lo"),
        F.percentile(F.col("__avg"), F.lit(hi)).alias("__t_hi"),
    )
    out = scored.join(F.broadcast(bounds), group_cols, "left")
    bucket = (
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
        .when(avg < F.col("__t_lo"), F.lit("tail"))
        .when(avg < F.col("__t_hi"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return out.withColumn("ppl_bucket", bucket).drop("__t_lo", "__t_hi")
