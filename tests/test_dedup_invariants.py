"""Near-dup detection invariants, mirroring the reference's
deliberately-seeded-duplicates test strategy (SURVEY.md §5: after dedup,
counts must equal base counts exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.text_dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from hse_etl_ochirov_aldar_spark.queries import _docs_with_near_dups
from hse_etl_ochirov_aldar_spark.sources.readers import load_table

N_DUPS = 20


def test_exact_dedup_removes_exact_copies(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.count()
    dups = docs.limit(15).withColumn("doc_id", F.col("doc_id") + 2_000_000)
    kept = exact_dedup(docs.unionByName(dups))
    assert kept.count() == base
    # survivors keep the smallest doc_id
    assert kept.where(F.col("doc_id") >= 2_000_000).count() == 0


def test_minhash_lsh_finds_injected_candidates(spark, sf_dir):
    corpus = _docs_with_near_dups(spark, sf_dir, N_DUPS)
    cands = minhash_lsh_candidates(corpus)
    hits = cands.where(
        (F.col("id_b") - F.col("id_a") == 1_000_000) & (F.col("id_a") < N_DUPS)
    ).count()
    # banded LSH is probabilistic; at jaccard ~0.85+ with 4 bands x 4 rows
    # expected recall >> 0.9
    assert hits >= int(N_DUPS * 0.8), f"LSH recall too low: {hits}/{N_DUPS}"


def test_minhash_dedup_removes_injected_near_dups(spark, sf_dir):
    # the driver's documents table contains NATURAL near-dups (observed
    # jaccard ~0.98 pairs), so the invariant is: dedup of the injected
    # corpus keeps exactly what dedup of the original corpus keeps —
    # all injected copies (larger ids, always the id_b loser side) gone.
    docs = load_table(spark, sf_dir, "documents")
    corpus = _docs_with_near_dups(spark, sf_dir, N_DUPS)
    kept = minhash_dedup(corpus, threshold=0.6)
    kept_natural = minhash_dedup(docs, threshold=0.6)
    injected_survivors = kept.where(F.col("doc_id") >= 1_000_000).count()
    assert injected_survivors <= int(N_DUPS * 0.2), (
        f"{injected_survivors}/{N_DUPS} injected dups survived"
    )
    assert kept.where(F.col("doc_id") < 1_000_000).count() == kept_natural.count()


def test_ngram_jaccard_scores_injected_pairs_high(spark, sf_dir):
    corpus = _docs_with_near_dups(spark, sf_dir, N_DUPS)
    cands = minhash_lsh_candidates(corpus)
    verified = ngram_jaccard_pairs(corpus, cands, threshold=0.6)
    rows = verified.collect()
    assert all(r.jaccard >= 0.6 for r in rows)
    injected = [r for r in rows if r.id_b - r.id_a == 1_000_000]
    assert len(injected) >= int(N_DUPS * 0.8)


def test_simhash_finds_injected_near_pairs(spark, sf_dir):
    corpus = _docs_with_near_dups(spark, sf_dir, N_DUPS)
    pairs = simhash_near_pairs(corpus, max_hamming=6, prefix_bits=4)
    injected = pairs.where(F.col("id_b") - F.col("id_a") == 1_000_000).count()
    # simhash prefix bucketing trades recall for cost; expect most found
    assert injected >= int(N_DUPS * 0.5), f"simhash recall too low: {injected}"


def test_ivf_kmeans_recall_vs_brute_force(spark, sf_dir):
    """The k-means IVF path must return complete top-k lists and keep a
    material fraction of the exact neighbors while scoring only
    n_probe/n_cells of the corpus."""
    from pyspark.sql import functions as F

    from hse_etl_ochirov_aldar_spark.operators.similarity import (
        brute_force_topk,
        ivf_kmeans_topk,
    )
    from hse_etl_ochirov_aldar_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ivf_kmeans_topk(emb, qs, k=5, n_cells=8, n_probe=2)
    ivf_rows = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert len(ivf_rows) == 50  # complete top-5 per query

    bf = brute_force_topk(emb, qs, k=5)
    bf_rows = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    recall = len(ivf_rows & bf_rows) / len(bf_rows)
    assert recall >= 0.3, recall


def test_lsh_recall_matches_exact_jaccard(spark, sf_dir):
    """On the deterministic corpus, LSH-candidate + verify recovers
    EXACTLY the brute-force Jaccard >= 0.6 pair set (100% recall, no
    false positives after verification)."""
    from hse_etl_ochirov_aldar_spark.queries import (
        q_jaccard_exact_pairs,
        q_ngram_jaccard_pairs,
    )

    lsh = {
        (r.id_a, r.id_b) for r in q_ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    exact = {
        (r.id_a, r.id_b) for r in q_jaccard_exact_pairs(spark, sf_dir).collect()
    }
    assert lsh == exact
    assert len(exact) > 0
