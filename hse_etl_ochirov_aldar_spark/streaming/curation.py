"""Streaming corpus curation (SURVEY §2.9 extension): the two curation
ops that make sense on a live document feed.

- ``streaming_content_dedup`` — exact content dedup over a stream with
  BOUNDED state: keys are 16-byte md5 digests of normalized text and
  ``dropDuplicatesWithinWatermark`` evicts seen-keys once the watermark
  passes, so state is O(docs per watermark window), not O(stream
  lifetime). Plain ``dropDuplicates`` (used for keyed event dedup
  elsewhere) would grow its seen-set forever on an unbounded crawl.
- ``streaming_decontaminate`` — benchmark n-gram decontamination via
  ``foreachBatch`` + the verified BATCH operator
  (operators/decontaminate.py). Contamination is row-local given the
  static eval set (no cross-batch state), so per-micro-batch execution
  is semantically exact, and the batch operator's broadcast-semi-join
  plan (corpus rows never shuffle) is reused unchanged — the same
  production idiom as streaming/joins.write_stream_upsert.

No reference analogue (its pipelines are scheduled batches); these are
the stream flavors of the dedup-before-load and quality-gate contracts
(mongo_to_postgres_replication.py:35-39, 205-215).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.decontaminate import ngram_decontaminate


def streaming_content_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-seen document per normalized content hash within
    the watermark horizon. Emits the input columns unchanged."""
    return (
        stream.withColumn(
            "__content_key", F.md5(F.lower(F.trim(F.col(text_col))))
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )


def streaming_decontaminate(
    stream: DataFrame,
    eval_df: DataFrame,
    out_path: str,
    checkpoint: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Start a query appending eval-clean documents to ``out_path``
    (parquet). Each micro-batch runs the batch decontamination operator
    against the static eval set; exactly-once per batch via the
    checkpoint. Returns the StreamingQuery."""

    def _clean(batch: DataFrame, _epoch: int) -> None:
        ngram_decontaminate(
            batch, eval_df, n=n, id_col=id_col, text_col=text_col
        ).write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(_clean)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
