"""CDC change-feed application: the batch MERGE that turns a snapshot
plus an I/U/D change feed into the next snapshot.

Generalizes the reference's keep-newest upsert
(mongo_to_postgres_replication.py:149-185 keeps the max-version row per
key; sources/sinks.upsert_keep_newest is its sink form) with DELETE
semantics — the missing third of the replication contract: a key whose
NEWEST change is a delete leaves the snapshot entirely, instead of its
tombstone row surviving as data.

Scale shape (100 TB): one window over the CHANGE FEED keyed on the
business key (the feed is deltas — orders of magnitude smaller than
the snapshot), then ONE full-outer equi-join snapshot <-> newest-change
on the same key. The snapshot shuffles once; with a bucketed snapshot
(sources/sinks.write_bucketed) even that shuffle disappears. No
row-at-a-time merge loop, no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ver_col: str = "ver",
    op_col: str = "op",
) -> DataFrame:
    """Next snapshot = ``snapshot`` with ``changes`` applied.

    ``changes`` carries the snapshot's columns plus ``op_col`` (one of
    'I'/'U'/'D' — insert and update are treated identically, as in any
    idempotent MERGE) and ``ver_col`` (per-key monotonically increasing
    version; ties break toward the delete so a same-version
    upsert+delete pair is deterministic rather than order-dependent).

    Per key, only the NEWEST change matters: op 'D' removes the key,
    anything else replaces/creates the row with the change's payload.
    Keys untouched by the feed pass through unchanged. Output schema is
    the snapshot schema.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    payload = [c for c in snapshot.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ver_col).desc(),
        # delete wins a same-version tie: the only order-independent
        # reading of a feed that emits both at one version
        F.when(F.col(op_col) == "D", 1).otherwise(0).desc(),
    )
    newest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__c_{c}") for c in payload],
        )
    )
    cond = None
    for k in keys:
        eq = snapshot[k].eqNullSafe(F.col(f"__k_{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = snapshot.join(newest, cond, "full_outer")
    survives = F.col("__op").isNull() | (F.col("__op") != "D")
    out_cols = [
        F.coalesce(F.col(f"__k_{k}"), snapshot[k]).alias(k) for k in keys
    ] + [
        F.when(F.col("__op").isNotNull(), F.col(f"__c_{c}"))
        .otherwise(snapshot[c])
        .alias(c)
        for c in payload
    ]
    return joined.where(survives).select(*out_cols)


def streaming_cdc_apply(
    stream: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols: Sequence[str],
    ver_col: str = "ver",
    op_col: str = "op",
    trigger_available_now: bool = True,
):
    """Maintain the parquet snapshot at ``snapshot_path`` from a CDC
    change STREAM: each micro-batch applies through :func:`cdc_apply`
    and atomically swaps the snapshot (write-staging-then-rename, the
    compaction sink's idiom). The first batch bootstraps an empty
    snapshot from the batch schema minus the CDC columns.

    Replay safety: cdc_apply is idempotent for U/D ops but an 'I' of a
    key deleted in a LATER already-applied batch would resurrect it on
    replay — so, like plans/ivm.streaming_additive_mart, an
    epoch-marker directory turns replayed batches into no-ops (marker
    written after the swap; the residual crash window between swap and
    marker is the usual non-transactional two-store gap).
    Returns the StreamingQuery.
    """
    from ..sources.sinks import _hadoop_fs, _swap_into, recover_swap

    def _apply(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        fs, _ = _hadoop_fs(spark, snapshot_path.rstrip("/") + "__epochs")
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            snapshot_path.rstrip("/") + "__epochs", str(epoch)
        )
        staging = snapshot_path.rstrip("/") + "__cdc_staging"
        # adopt the surviving snapshot if a prior apply died mid-swap —
        # BEFORE the marker early-return (r10 ADVICE): a REPLAYED epoch
        # arriving after a different epoch crashed mid-swap used to
        # no-op here and leave the snapshot path missing until the next
        # new epoch, failing readers even though a complete copy sat in
        # staging/__old. Any batch, replay included, now repairs first.
        recover_swap(spark, staging, snapshot_path)
        if fs.exists(marker):
            return
        out_cols = [c for c in batch.columns if c not in (ver_col, op_col)]
        try:
            snap = spark.read.parquet(snapshot_path)
        except Exception as exc:
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise
            snap = batch.select(*out_cols).limit(0)
        nxt = cdc_apply(snap, batch, list(key_cols), ver_col, op_col)
        nxt.write.mode("overwrite").parquet(staging)
        _swap_into(spark, staging, snapshot_path)
        fs.mkdirs(marker)

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_apply_versioned(
    spark,
    root: str,
    batch: DataFrame,
    key_cols: Sequence[str],
    ver_col: str = "ver",
    op_col: str = "op",
    epoch: int | None = None,
    keep_versions: int = 2,
) -> int | None:
    """EXACTLY-ONCE CDC batch apply into a versioned snapshot: the
    batch epoch rides INSIDE the atomic commit marker (the
    plans/ivm.maintain_additive_mart_versioned protocol), so the
    epoch-directory variant's residual window — a crash between the
    snapshot swap and the marker mkdir replays an 'I' whose key a
    later batch deleted — does not exist: publication and replay-guard
    are one rename. Returns the committed version, or None when
    ``epoch`` is already committed (replay)."""
    from ..sources.sinks import (
        _commit_payload,
        _gc_data_dirs,
        _hadoop_fs,
        _publish_commit,
        _versioned_data_dir,
        current_version,
    )

    cur = current_version(spark, root)
    committed_epoch = None
    if cur is not None:
        payload = _commit_payload(spark, root, cur) or ""
        for line in payload.splitlines():
            if line.startswith("epoch="):
                committed_epoch = int(line[len("epoch="):])
    if (
        epoch is not None
        and committed_epoch is not None
        and epoch <= committed_epoch
    ):
        return None

    out_cols = [c for c in batch.columns if c not in (ver_col, op_col)]
    if cur is None:
        snap = batch.select(*out_cols).limit(0)
        nxt = 1
    else:
        snap = spark.read.parquet(_versioned_data_dir(root, cur))
        nxt = cur + 1
    result = cdc_apply(snap, batch, list(key_cols), ver_col, op_col)
    data_dir = _versioned_data_dir(root, nxt)
    fs, jdata = _hadoop_fs(spark, data_dir)
    if fs.exists(jdata):  # orphan of a crashed writer
        fs.delete(jdata, True)
    result.write.parquet(data_dir)
    payload = f"v{nxt:08d}\n"
    if epoch is not None:
        payload += f"epoch={epoch}\n"
    _publish_commit(spark, root, nxt, payload)
    _gc_data_dirs(spark, root, nxt - keep_versions)
    return nxt


def streaming_cdc_apply_versioned(
    stream: DataFrame,
    root: str,
    checkpoint: str,
    key_cols: Sequence[str],
    ver_col: str = "ver",
    op_col: str = "op",
    trigger_available_now: bool = True,
):
    """The EXACTLY-ONCE form of :func:`streaming_cdc_apply`: each
    micro-batch applies through :func:`cdc_apply_versioned` with its
    epoch recorded atomically with the snapshot publication. Readers
    use sinks.read_versioned(root) and never observe a partial apply;
    replays (same epoch id) are no-ops with no residual crash window.
    Returns the StreamingQuery."""

    def _apply(batch: DataFrame, epoch: int) -> None:
        cdc_apply_versioned(
            batch.sparkSession,
            root,
            batch,
            list(key_cols),
            ver_col,
            op_col,
            epoch=epoch,
        )

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
