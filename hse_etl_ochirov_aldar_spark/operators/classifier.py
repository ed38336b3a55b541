"""Model-based quality classification (FineWeb-Edu-style filtering).

A linear classifier over the Gopher quality signals, evaluated as pure
column algebra — the inference-side plumbing of "score every document
with a quality model and keep the top band", with a transparent
hand-set weight vector standing in for trained fasttext/regression
weights (no model runtime exists in this environment; swapping in
learned weights is a constructor argument, not a code change).

Reference analogue: the quality CHECK rules applied before load
(mongo_to_postgres_replication.py:205-215) generalized from hard
per-rule gates to a weighted soft score.

Cross-engine exactness: the logit is built in a FIXED left-associative
expression order from ratios of identical integers, and the sigmoid
output snaps to BIGINT micro-units (round(sigmoid(z) * 1e6)) — the
same order-proof policy as operators/lm_score.py. Threshold tests
compare micro-units as integers.

Scale shape (100 TB): zero shuffles — every signal and the score are
per-row expressions inside whole-stage codegen; the only exchange is
whatever aggregation the caller adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count, with_gopher_signals

MICRO = 1_000_000

#: Hand-set stand-in weights (positive evidence: alphabetic words,
#: moderate length; negative: symbol spam, duplicate lines, long words).
DEFAULT_WEIGHTS = {
    "bias": -2.0,
    "alphar": 2.5,
    "symr": -8.0,
    "dupliner": -2.0,
    "mwl": -0.08,
    "log_tokens": 0.4,
}


def linear_quality_scores(
    df: DataFrame,
    text_col: str = "text",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """``df`` + ``quality_micro`` (BIGINT, sigmoid(logit) in 1e-6
    units; 0 for token-less documents) and ``n_tokens``."""
    w = weights or DEFAULT_WEIGHTS
    text = F.col(text_col)
    # Generate-barrier struct (functions/text.with_gopher_signals):
    # four fields read below, one fold per row
    df = with_gopher_signals(df, text_col, "__gsig")
    sig = F.col("__gsig")
    n = token_count(text)
    # fixed left-associative order — mirror the oracle SQL term order
    z = (
        F.lit(float(w["bias"]))
        + F.lit(float(w["alphar"])) * sig["alphar"]
        + F.lit(float(w["symr"])) * sig["symr"]
        + F.lit(float(w["dupliner"])) * sig["dupliner"]
        + F.lit(float(w["mwl"])) * sig["mwl"]
        + F.lit(float(w["log_tokens"])) * F.log(F.lit(1.0) + n)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        df.withColumn("n_tokens", n.cast("long"))
        .withColumn(
            "quality_micro",
            F.when(
                F.col("n_tokens") > 0,
                F.round(score * F.lit(MICRO), 0).cast("long"),
            ).otherwise(F.lit(0)),
        )
        .drop("__gsig")
    )


def keep_by_quality(scored: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Keep documents with quality score >= ``threshold`` (compared in
    integer micro-units)."""
    return scored.where(F.col("quality_micro") >= int(round(threshold * MICRO)))
