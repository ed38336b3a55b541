"""Arrow MinHash signature twin (r7 verdict stretch task #7):
minhash_signature_frame must be BIT-IDENTICAL to the expression fold —
the finding-24/25 exact-integer-twin pattern applied to the
most-used LLM-pipeline family. Also pins the numpy XXH64 block
functions against Spark's own xxhash64."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.text_dedup import (
    _np_xxh64_int,
    _np_xxh64_long,
    banded_minhash_keys,
    minhash_lsh_candidates,
    minhash_signature_frame,
    minhash_signatures,
)


def test_np_xxh64_matches_spark_on_random_inputs(spark):
    """The two numpy XXH64 block functions are the whole bit-identity
    argument — pin them against Spark's xxhash64 over random longs and
    the (long, int) two-column chain the signature fold uses."""
    rng = np.random.default_rng(11)
    longs = rng.integers(-(2**63), 2**63, size=500, dtype=np.int64)
    ints = rng.integers(0, 1024, size=500, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(longs, ints)], "h long, j int"
    )
    spark_long = [r[0] for r in df.select(F.xxhash64("h")).collect()]
    spark_chain = [r[0] for r in df.select(F.xxhash64("h", "j")).collect()]

    mine_long = _np_xxh64_long(longs.view(np.uint64), np.uint64(42)).view(
        np.int64
    )
    mine_chain = _np_xxh64_int(
        ints.astype(np.uint64),
        _np_xxh64_long(longs.view(np.uint64), np.uint64(42)),
    ).view(np.int64)
    assert [int(x) for x in mine_long] == spark_long
    assert [int(x) for x in mine_chain] == spark_chain


def test_np_minhash_fold_matches_elementwise_grid():
    """The chunked in-place kernel must equal the straightforward
    broadcast form for ragged rows, including a row wider than the
    chunk (the take-it-alone branch)."""
    from hse_etl_ochirov_aldar_spark.operators.text_dedup import (
        _np_minhash_fold,
    )

    rng = np.random.default_rng(5)
    lens = np.array([3, 1, 700, 12, 40, 2], dtype=np.int64)
    flat = rng.integers(-(2**63), 2**63, size=int(lens.sum()), dtype=np.int64)
    a = flat.view(np.uint64)
    seeds = np.arange(16, dtype=np.uint64)
    got = _np_minhash_fold(seeds, a, lens, chunk=64)
    ref_grid = _np_xxh64_int(seeds[None, :], a[:, None]).view(np.int64)
    starts = np.cumsum(lens) - lens
    ref = np.minimum.reduceat(ref_grid, starts, axis=0)
    assert np.array_equal(got, ref)


def _docs(spark):
    words = F.transform(
        F.sequence(F.lit(1), (F.pmod(F.xxhash64("id"), 12) + 1).cast("int")),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), 50).cast("string")
        ),
    )
    return spark.range(200).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def test_minhash_frame_bit_identical_to_expression(spark):
    df = _docs(spark)
    expr = {
        r["doc_id"]: r["minhash"]
        for r in minhash_signatures(df, "text", 16, 3)
        .select("doc_id", "minhash")
        .collect()
    }
    arrow = {
        r["id"]: r["minhash"]
        for r in minhash_signature_frame(df, "doc_id", "text", 16, 3).collect()
    }
    assert arrow == expr
    assert len(arrow) == 200


def test_minhash_frame_null_and_short_text_semantics(spark):
    """Null text -> null signature; text shorter than the shingle
    width -> the whole-text fallback shingle, exactly like the
    expression path (word_shingles' contract)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one"), (4, "one two three four")],
        "doc_id long, text string",
    )
    expr = {
        r["doc_id"]: r["minhash"]
        for r in minhash_signatures(df, "text", 8, 3)
        .select("doc_id", "minhash")
        .collect()
    }
    arrow = {
        r["id"]: r["minhash"]
        for r in minhash_signature_frame(df, "doc_id", "text", 8, 3).collect()
    }
    assert arrow == expr


def test_banded_keys_arrow_path_identical(spark):
    df = _docs(spark)
    a = sorted(
        tuple(r)
        for r in banded_minhash_keys(df, signature="expr").collect()
    )
    b = sorted(
        tuple(r)
        for r in banded_minhash_keys(df, signature="arrow").collect()
    )
    assert a == b and len(a) == 200 * 8


def test_lsh_candidates_arrow_path_identical(spark):
    df = _docs(spark)
    dups = df.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    corpus = df.unionByName(dups)
    a = sorted(
        tuple(r) for r in minhash_lsh_candidates(corpus).collect()
    )
    b = sorted(
        tuple(r)
        for r in minhash_lsh_candidates(corpus, signature="arrow").collect()
    )
    assert a == b and len(a) >= 10


def test_banded_keys_rejects_unknown_signature(spark):
    with pytest.raises(ValueError, match="kernel must be"):
        banded_minhash_keys(_docs(spark), signature="nope")


def test_np_minhash_fold_property_random_ragged():
    """Property pin (hypothesis): the chunked in-place kernel equals
    the broadcast grid + reduceat reference for arbitrary ragged
    segmentations and chunk sizes, including chunk boundaries landing
    mid-row-group."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hse_etl_ochirov_aldar_spark.operators.text_dedup import (
        _np_minhash_fold,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        lens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=25),
        k=st.integers(min_value=1, max_value=20),
        chunk=st.integers(min_value=1, max_value=64),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(lens, k, chunk, seed):
        rng = np.random.default_rng(seed)
        lens_a = np.asarray(lens, dtype=np.int64)
        flat = rng.integers(
            -(2**63), 2**63, size=int(lens_a.sum()), dtype=np.int64
        ).view(np.uint64)
        seeds = np.arange(k, dtype=np.uint64)
        got = _np_minhash_fold(seeds, flat, lens_a, chunk=chunk)
        grid = _np_xxh64_int(seeds[None, :], flat[:, None]).view(np.int64)
        starts = np.cumsum(lens_a) - lens_a
        ref = np.minimum.reduceat(grid, starts, axis=0)
        assert np.array_equal(got, ref)

    check()


def test_banded_keys_arrow_plan_shape(spark):
    """The arrow path's documented plan properties: exactly one
    Arrow/pandas boundary (the signature frame), the band explode
    ABOVE it (the mapInPandas node is the projection barrier, so the
    signature is materialized once per doc), and no extra shuffle
    versus the expression path."""
    plan = (
        banded_minhash_keys(_docs(spark), signature="arrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Generate explode" in plan
    # Generate (the explode) must sit above MapInPandas in the tree:
    # in the printed plan, parents print BEFORE children
    assert plan.index("Generate") < plan.index("MapInPandas")
