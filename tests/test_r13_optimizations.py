"""Focused pins for the r13 optimization-round rewrites: each test
pins an equivalence the optimization relies on, so a later refactor
cannot silently undo it.

- curation_pipeline_v3's arithmetic chunk statistics == the
  chunk_documents-derived aggregate they replaced (per lang, over the
  real sf0.001 corpus run through the same cleaning/scoring stages);
- unigram_logprob_scores' (doc, tok)-preaggregated BIGINT fold == the
  naive per-token-occurrence fold it compressed;
- bm25_topk's single-tokenize slim table changes nothing: the operator
  still matches a from-first-principles Python BM25 on a tiny corpus.

(The prefix x prefix candidate rewrite in setsim.py is already pinned
by tests/test_properties.py::test_prefix_filter_equals_brute_force —
a hypothesis sweep against brute force on adversarial tiny universes.)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_v3_chunk_arithmetic_matches_chunk_documents(spark, sf_dir):
    """The closed-form chunk stats (sequence/least over n_tokens) must
    equal counting chunk_documents' actual rows, per doc, on the same
    kept frame curation_pipeline_v3 builds."""
    from hse_etl_ochirov_aldar_spark.operators.lm_score import (
        perplexity_buckets,
        unigram_logprob_scores,
    )
    from hse_etl_ochirov_aldar_spark.operators.normalize import (
        chunk_documents,
    )
    from hse_etl_ochirov_aldar_spark.operators.text_dedup import (
        remove_duplicate_spans,
    )
    from hse_etl_ochirov_aldar_spark.queries._base import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    boiler = " common boilerplate passage appears in many documents verbatim"
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(boiler))
        ).otherwise(F.col("text")),
    )
    cleaned = remove_duplicate_spans(seeded, span_tokens=5, min_docs=2)
    scored = unigram_logprob_scores(cleaned)
    kept = perplexity_buckets(scored, ["lang"]).where(
        (F.col("n_tokens") > 0) & (F.col("ppl_bucket") != "tail")
    ).persist()

    # old formulation: count chunk_documents' actual rows
    chunks = chunk_documents(
        kept.select("doc_id", "text"), chunk_tokens=64, stride=48
    )
    old = {
        r["doc_id"]: (r["nc"], r["ct"])
        for r in chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nc"),
            F.sum("n_chunk_tokens").alias("ct"),
        )
        .collect()
    }
    # new formulation: arithmetic over n_tokens
    starts = F.sequence(F.lit(1), F.col("n_tokens"), F.lit(48))
    new = {
        r["doc_id"]: (r["nc"], r["ct"])
        for r in kept.select(
            "doc_id",
            F.size(starts).alias("nc"),
            F.aggregate(
                F.transform(
                    starts,
                    lambda x: F.least(F.lit(64), F.col("n_tokens") - x + 1),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("ct"),
        ).collect()
    }
    kept.unpersist()
    assert old, "fixture degenerate: no kept docs"
    assert old == new


def test_unigram_preagg_matches_per_token_fold(spark):
    """sum(k * lp) over distinct (doc, tok) == sum(lp) over token
    occurrences, bit-for-bit, including OOV mass on a cross-corpus
    model."""
    from hse_etl_ochirov_aldar_spark.operators.lm_score import (
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),
            (2, "b c"),
            (3, ""),
            (4, "zz a zz zz"),  # zz is OOV vs the model corpus below
        ],
        "doc_id LONG, text STRING",
    )
    model = spark.createDataFrame(
        [(10, "a a b c c c")], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["lp_micro"])
        for r in unigram_logprob_scores(docs, model_df=model).collect()
    }
    # naive reference fold in Python bigints
    mtoks = ["a", "a", "b", "c", "c", "c"]
    counts = {t: mtoks.count(t) for t in set(mtoks)}
    total, vocab = len(mtoks), len(counts)
    def lp(tok):
        c = counts.get(tok, 0)
        return int(round(math.log((c + 1.0) / (total + vocab)) * 1e6))
    texts = {1: "a a a b", 2: "b c", 3: "", 4: "zz a zz zz"}
    for d, txt in texts.items():
        toks = [t for t in txt.lower().split() if t]
        assert got[d] == (len(toks), sum(lp(t) for t in toks)), d


def test_bm25_single_tokenize_matches_reference_scoring(spark):
    """bm25_topk after the slim-table rewrite still equals the exact
    integer BM25 computed from first principles in Python."""
    from hse_etl_ochirov_aldar_spark.operators.bm25 import bm25_topk

    corpus = [
        (1, "the quick brown fox"),
        (2, "the lazy dog sleeps"),
        (3, "quick quick fox runs"),
        (4, "unrelated text entirely"),
        (5, ""),
    ]
    queries = [(100, "quick fox"), (200, "lazy dog")]
    docs = spark.createDataFrame(corpus, "doc_id LONG, text STRING")
    got = {
        (r["query_id"], r["doc_id"]): (r["score_micro"], r["rank"])
        for r in bm25_topk(spark, docs, queries, k=10).collect()
    }
    # reference: integer BM25 per module-doc rewrite
    toks = {d: t.lower().split() for d, t in corpus}
    n_docs = len(corpus)
    corpus_len = sum(len(v) for v in toks.values())
    expected = {}
    for qid, qtext in queries:
        scores = {}
        for term in sorted(set(qtext.lower().split())):
            df_t = sum(1 for v in toks.values() if term in v)
            if df_t == 0:
                continue
            idf_micro = int(round(math.log((n_docs + 1) / (df_t + 0.5)) * 1e6))
            for d, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                num = idf_micro * 22 * corpus_len * tf
                den = 10 * corpus_len * tf + 3 * corpus_len + 9 * len(v) * n_docs
                scores[d] = scores.get(d, 0) + num // den
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, s) in enumerate(ranked, 1):
            expected[(qid, d)] = (s, rank)
    assert got == expected
