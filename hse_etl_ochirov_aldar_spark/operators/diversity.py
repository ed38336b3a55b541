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

Scale shape (100 TB): per n in {1,2,3} one (slice, key) census with
map-side partials, where the key is the 8-byte xxhash64 of the n-gram
— NEVER the n-gram text (the segment_boilerplate_removal census rule:
longs shuffle, strings don't). Census rows are Zipf-compressed so the
shuffle tracks vocabulary, not corpus size; the n-gram arrays are
row-local (one Generate each, no joins); per-slice rollups are
slice-count-sized. Distinct counts and count-of-counts are identical
under the hash absent collisions (~n_grams²/2^64 — negligible, and
the DuckDB twins count raw n-grams so a collision would surface as a
driver mismatch, not silently). No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens

MICRO = 1_000_000


def _ngram_array(toks, n: int):
    """Row-local array of space-joined n-grams of ``toks``, built by
    zipping n shifted slices (empty when the document is shorter than
    n). The slice form references ``toks`` a CONSTANT number of times
    per row; an element_at(toks, i) inside the transform lambda would
    be re-inlined per element by CollapseProject, re-running the
    upstream tokenization O(len) times per row (PERF.md finding 1)."""
    if n == 1:
        return toks
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, m).alias(f"g{j}") for j in range(n)]
    )
    return F.transform(
        zipped,
        lambda x: F.concat_ws(" ", *[x[f"g{j}"] for j in range(n)]),
    )


def ngram_diversity_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    approx: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """Per-``group_col`` diversity report:

    - ``n_tokens``/``n_bigrams``/``n_trigrams``  BIGINT totals
    - ``distinct_unigrams``/``_bigrams``/``_trigrams``  BIGINT
    - ``ttr_bp``/``bigram_ttr_bp``/``trigram_ttr_bp``  BIGINT distinct
      ratio in basis points (10000·distinct div total; 0 when empty)
    - ``unigram_entropy``  DOUBLE Shannon entropy in nats (micro-nat
      integer pipeline, see module docstring)

    ``approx=True`` is the 100 TB escape hatch: bigram/trigram distinct
    counts switch to HLL++ (``approx_count_distinct`` at ``rsd``),
    collapsing the dominant cost — the (slice, key) census over ~one
    row per DISTINCT n-gram, which partial aggregation cannot compress
    when most n-grams are near-unique — into fixed-size sketches
    merged in one pass (2M-doc scale check: 51s -> 28s same-session,
    distincts within 1.7% at rsd=0.01; the residual cost is the
    explode totals plus the exact unigram census). The unigram census
    stays exact either way:
    entropy needs true counts, and vocabulary is Zipf-compressed so
    that census is cheap. The catalog oracle runs exact mode.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )

    def census(n: int, total_name: str, distinct_name: str) -> DataFrame:
        grams = base.select(
            "__g",
            F.explode(
                F.transform(
                    _ngram_array(F.col("__toks"), n), lambda t: F.xxhash64(t)
                )
            ).alias("__t"),
        )
        if approx and n > 1:
            return grams.groupBy("__g").agg(
                F.count(F.lit(1)).alias(total_name),
                F.approx_count_distinct("__t", rsd).alias(distinct_name),
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
    return _assemble_report(group_col, uni, bi, tri)


def _assemble_report(
    group_col: str, uni: DataFrame, bi: DataFrame, tri: DataFrame
) -> DataFrame:

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


def ngram_diversity_audit(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    rsd: float = 0.01,
    tolerance_bp: int = 500,
) -> DataFrame:
    """Cross-checkable twin of ``approx=True``: per slice, the EXACT
    totals/distincts PLUS a boolean verdict that the HLL++ sketch
    estimate lands within ``tolerance_bp`` basis points (default 5% =
    5x the rsd=0.01 standard error) of the exact distinct count.

    The sketch is fed the (slice, key) census rows rather than the raw
    exploded n-grams: HLL state depends only on the SET of distinct
    values, and the census holds each distinct key exactly once per
    slice, so the estimate is bit-identical to sketching the raw
    stream while costing one extra fixed-size aggregate instead of a
    second full census. That makes the audit ~the price of the exact
    report, while still executing the production sketch path for real
    — if approx_count_distinct ever drifted outside its documented
    error, the verdict flips false and the driver's oracle compare
    (which emits literal ``true``) goes red instead of silently
    recording a bad estimate.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )

    def census_audit(n: int, total: str, distinct: str, est: str) -> DataFrame:
        grams = base.select(
            "__g",
            F.explode(
                F.transform(
                    _ngram_array(F.col("__toks"), n), lambda t: F.xxhash64(t)
                )
            ).alias("__t"),
        )
        cnt = grams.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__c"))
        return cnt.groupBy("__g").agg(
            F.sum("__c").alias(total),
            F.count(F.lit(1)).alias(distinct),
            F.approx_count_distinct("__t", rsd).alias(est),
        )

    uni = census_audit(1, "n_tokens", "distinct_unigrams", "__e1")
    bi = census_audit(2, "n_bigrams", "distinct_bigrams", "__e2")
    tri = census_audit(3, "n_trigrams", "distinct_trigrams", "__e3")

    def within(est: str, exact: str):
        # |est - exact| * 10000 <= tolerance_bp * exact, integer-only
        return (
            F.abs(F.col(est) - F.col(exact)) * 10000
            <= F.lit(tolerance_bp) * F.col(exact)
        )

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
            within("__e1", "distinct_unigrams").alias("unigram_sketch_ok"),
            F.coalesce(within("__e2", "distinct_bigrams"), F.lit(True)).alias(
                "bigram_sketch_ok"
            ),
            F.coalesce(within("__e3", "distinct_trigrams"), F.lit(True)).alias(
                "trigram_sketch_ok"
            ),
        )
    )
