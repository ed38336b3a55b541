"""Document chunking for retrieval / context-window preparation.

RAG indexing and long-context training both shard documents into
fixed-size overlapping windows before anything else touches them; a
chunker that is deterministic and engine-portable makes the chunk ids
stable across re-index runs, so downstream embeddings/dedup keyed on
(doc_id, chunk_idx) survive pipeline restarts and engine migrations.

No reference analogue (the reference's ETL copies documents whole,
SURVEY §2.8); extends the engine for LLM-corpus preparation alongside
operators/sampling.py. The TOKEN-window twin is
operators/normalize.chunk_documents (whitespace-token windows over a
split array); this module chunks in CHARACTER units — the contract
embedding APIs and context-length character limits are specified in —
without tokenizing at all, so it also applies to whitespace-free
scripts where token windows degenerate.

Scale shape (100 TB): chunking is ROW-LOCAL — a sequence + explode
per document, no shuffle, no state; output partitioning inherits the
input, and the explode multiplies rows inside each task. Pure column
algebra (sequence/substring), so the whole operator stays in
whole-stage codegen — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Explode each row into fixed-window character chunks.

    Windows start at ``0, stride, 2*stride, ...`` while the start lies
    inside the text; each chunk is ``substring(start, size)`` — with
    ``stride < size`` consecutive chunks overlap by ``size - stride``
    characters (the standard RAG windowing), and the final chunk is
    simply shorter. The rule is a pure function of (text, size,
    stride): any engine recomputes identical chunks, which is what
    keeps (doc id, ``chunk_idx``) a stable key across re-index runs.

    Adds ``chunk_idx`` (0-based), ``chunk_start`` (0-based char
    offset) and ``chunk_text``; rows with NULL or empty text produce
    no chunks (a row-preserving caller can left-join the result back).

    Spark gotcha, guarded here: ``sequence(start, stop)`` runs
    DESCENDING when start > stop, so an empty text (stop = -1) would
    fabricate garbage indices instead of an empty array — the
    non-empty filter runs BEFORE the sequence.
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    n = F.length(F.col(text_col))
    out = (
        df.where(n > 0)
        .withColumn(
            "chunk_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int")
                )
            ),
        )
        .withColumn("chunk_start", F.col("chunk_idx") * F.lit(stride))
        .withColumn(
            "chunk_text",
            F.col(text_col).substr(
                F.col("chunk_start") + 1, F.lit(size)
            ),
        )
    )
    return out
