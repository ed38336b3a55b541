"""Structured Streaming extension (SURVEY.md §2.9).

The reference has no true streaming — its `@daily` Airflow schedule
re-runs a batch (HW-4/airflow/dags/iot_temperature.py:271). The
Spark-native reading of that contract is a Structured Streaming job
with:

- ``trigger(availableNow=True)``: process everything available, then
  stop — exactly a scheduled batch run, but incremental via the
  checkpoint (only new files are read on the next run; the reference
  re-downloads and recomputes everything every day).
- watermark + tumbling 1-day window: the principled late-data story the
  reference lacks (its only late-data handling is the last-7-days
  rebuild window, I2).

At scale: state is bounded by (watermark horizon x days) aggregate rows
UNDER update/append output (the production modes — e.g. update +
write_stream_upsert), which write only changed windows per micro-batch;
the complete-mode memory runner below is the test/driver surface and
deliberately retains everything. File-source listing is incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exact import avg_units_expr, units_sum

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_daily_avg(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 days",
) -> DataFrame:
    """readStream over a parquet directory of events -> watermarked
    1-day tumbling-window average of ``value`` (streaming twin of
    operators.aggregates.daily_avg / SURVEY Q2)."""
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    # Exact integer cent units + half-up division (functions/exact.py):
    # round(avg(double), 2) is summation-order nondeterministic across
    # engines AND across micro-batch orderings — the unit sum is not.
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            units_sum("value").alias("s_units"),
            F.count(F.lit(1)).alias("n_readings"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            avg_units_expr("s_units", "n_readings", 2, 2).alias("avg_value"),
            "n_readings",
        )
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, query_name: str = "daily_avg_stream"
):
    """Run to completion with availableNow (the scheduled-batch analogue)
    into an in-memory sink; returns the finished StreamingQuery.

    HARNESS RUNNER, deliberately complete-mode: the memory sink must
    hold the whole queryable result, and in complete mode the
    watermark never evicts aggregation state — state and output grow
    with every distinct window, which is exactly what a collectible
    test/driver surface wants and exactly what an unbounded production
    stream must NOT do. The bounded-state production path is
    update-mode + ``streaming/joins.write_stream_upsert`` (keep-newest
    per window into parquet), where the module docstring's
    "state bounded by watermark horizon" contract actually applies."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_sliding_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window per-type event counts — the trending/monitoring
    shape the tumbling daily aggregate cannot express (each event
    contributes to window/slide overlapping windows, so a spike shows
    up within one slide interval instead of at the day boundary).

    State grows with (overlapping windows in the watermark horizon x
    active types), both bounded; with append output only windows the
    watermark has closed emit, exactly once each. The batch twin is
    the same F.window(ts, window, slide) aggregate — equivalence is
    pinned in the streaming test suite.
    """
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    kind = F.lower(F.trim(F.col("event_type")))
    return (
        stream.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"),
            kind.alias("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def hll_daily_state_merge(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    *,
    key_col: str = "day",
    id_col: str = "user_id",
    lg_k: int = 12,
) -> None:
    """Merge one batch into a persisted per-key HLL sketch table —
    the incremental-uniques state step (PERF.md finding 34 made
    streaming: per-day DataSketches sketches are MERGEABLE, so
    arriving data folds into history without ever rescanning it).

    The state table is one binary sketch row per key (days, not rows —
    tiny); the merge reads it, unions the batch's per-key sketches
    (``hll_union_agg`` refuses mismatched lgK rather than silently
    degrading), writes to a staging dir and swaps in via FS rename
    (sinks._swap_into — the read completes during the staging write,
    before the target is touched).

    Replay safety: foreachBatch is AT-LEAST-ONCE, and additive state
    (counts, sums) double-counts on replay. HLL registers take MAX, so
    re-merging a replayed batch is a no-op on every estimate — the
    at-least-once seam is exactly-once for sketch state, with no epoch
    bookkeeping (pinned in tests/test_streaming_and_incremental.py).
    """
    from ..sources.sinks import _hadoop_fs, _swap_into, recover_swap

    batch_sk = batch.groupBy(key_col).agg(
        F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("sk")
    )
    staging = state_path + "__stage"
    # Crash-mid-swap recovery (r10 ADVICE): if a prior merge died
    # between _swap_into's renames, the only complete copy of the
    # sketch history may sit in staging/target__old while the target
    # is missing — without this, the merge would rebuild state from
    # just the current batch and the staging overwrite below would
    # destroy the surviving history.
    recover_swap(spark, staging, state_path)
    fs, jpath = _hadoop_fs(spark, state_path)
    if fs.exists(jpath):
        merged = (
            spark.read.parquet(state_path)
            .unionByName(batch_sk)
            .groupBy(key_col)
            .agg(F.hll_union_agg("sk").alias("sk"))
        )
    else:
        merged = batch_sk
    merged.write.mode("overwrite").parquet(staging)
    _swap_into(spark, staging, state_path)


def streaming_hll_uniques(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint: str,
    *,
    ts_col: str = "ts",
    id_col: str = "user_id",
    lg_k: int = 12,
    trigger_available_now: bool = True,
):
    """Structured-Streaming daily-uniques state: each micro-batch's
    per-day sketches merge into the table at ``state_path`` via
    :func:`hll_daily_state_merge`; estimates (daily or trailing-N-day)
    come from :func:`hll_uniques_estimates` WITHOUT touching raw
    history. COUNT(DISTINCT) has no mergeable state — streaming exact
    distinct must keep every id in the state store; this keeps 2^lg_k
    registers per day, unconditionally.

    Returns the started StreamingQuery (availableNow by default — the
    scheduled-batch analogue; the checkpoint makes the next run read
    only new files).
    """
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _merge(batch: DataFrame, _epoch: int) -> None:
        days = batch.where(F.col(ts_col).isNotNull()).select(
            F.col(ts_col).cast("date").alias("day"), id_col
        )
        hll_daily_state_merge(
            batch.sparkSession, days, state_path, id_col=id_col, lg_k=lg_k
        )

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hll_uniques_estimates(
    spark: SparkSession, state_path: str, window_days: int = 1
) -> DataFrame:
    """(day, n_users_est) from the sketch table — per-day for
    ``window_days=1``, else trailing-N-day via the calendar cover
    union (same shape as the rolling_unique_users_hll catalog entry:
    the sketch of day d joins every window ending in [d, d+N-1]).
    Operates on ≤ n_days tiny rows; raw data is never read."""
    sk = spark.read.parquet(state_path)
    if window_days == 1:
        return sk.select(
            "day", F.hll_sketch_estimate("sk").alias("n_users_est")
        )
    cover = F.explode(
        F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
    ).alias("wday")
    est = (
        sk.select(cover, "sk")
        .groupBy("wday")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users_est"))
    )
    observed = sk.select(F.col("day").alias("wday"))
    return est.join(observed, "wday", "left_semi").select(
        F.col("wday").alias("day"), "n_users_est"
    )
