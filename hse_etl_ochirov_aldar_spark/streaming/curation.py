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


def streaming_near_dedup_ingest(
    stream: DataFrame,
    corpus_path: str,
    checkpoint: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
    **lsh_kwargs,
):
    """Start a query that near-dedups each micro-batch against the
    ACCUMULATED corpus at ``corpus_path`` (parquet) and appends only
    the survivors — the streaming flavor of the per-crawl-snapshot
    ingest loop (operators/text_dedup.py: incremental_minhash_dedup).

    Cross-batch state is the corpus itself, not Spark streaming state:
    every batch sees all previous batches' survivors because they were
    appended before the checkpoint committed. An empty/missing corpus
    dir means a first batch (the operator then only dedups within the
    batch). At 100 TB the corpus side would also maintain a banded-key
    table (the operator's ``corpus_keys`` seam) so each batch reads
    keys, not text; here the corpus re-derives keys per batch, which is
    exact but re-scans the corpus.

    Returns the StreamingQuery.
    """
    from ..operators.text_dedup import incremental_minhash_dedup

    spark = stream.sparkSession

    def _ingest(batch: DataFrame, _epoch: int) -> None:
        from ..sources.sinks import _hadoop_fs

        # Explicit FS existence probe, not exception-message matching: a
        # genuine read failure whose text happened to contain
        # "Path does not exist" (e.g. a missing nested path) must raise,
        # not silently skip cross-corpus dedup for the batch.
        fs, jpath = _hadoop_fs(spark, corpus_path)
        persisted: list = []
        if fs.exists(jpath):
            corpus = spark.read.parquet(corpus_path).select(*batch.columns)
            kept = incremental_minhash_dedup(
                batch, corpus, id_col=id_col, text_col=text_col,
                threshold=threshold, persisted_out=persisted, **lsh_kwargs,
            )
        else:
            from ..operators.text_dedup import minhash_dedup

            kept = minhash_dedup(
                batch, id_col, text_col, threshold=threshold, **lsh_kwargs
            )
        kept.write.mode("append").parquet(corpus_path)
        # per-batch cache hygiene: without this a long-running ingest
        # accumulates cached blocks for the query lifetime
        for df_ in persisted:
            df_.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
