"""Sinks (SURVEY.md §2.1 S7-S12).

The reference writes row-at-a-time INSERTs (anti-pattern,
sources_to_linear.py:59-79), TRUNCATE+rebuild full refreshes
(HW-3/airflow/dags/iot_temperature.py:44-46), ON CONFLICT DO NOTHING /
DO UPDATE keyed sinks (mongo_to_postgres_replication.py:61;
HW-4/airflow/dags/iot_temperature.py:209-216), and monthly
range-partitioned tables (final-module-3/init/init.sql:91-136).

Spark-first mapping: vectorized Parquet writes. Partitioned layout via
``partitionBy`` (partition pruning replaces PG's range partitions);
window-scoped rebuilds via dynamic partition overwrite (only touched
partitions are replaced — the Spark analogue of DELETE WHERE + INSERT);
upserts via read-union-keep-newest (the plain-Parquet idiom; on Delta
Lake this is MERGE, noted per call).

Scale: overwriting a 100 TB table never rewrites untouched partitions
(dynamic mode); upsert reads only the target partitions the new data
touches when a partition column is provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop FS API — the
    object-store-correct way to test/list/size/move dataset directories
    (driver-side ``pathlib`` only works on local disk)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _checked_rename(fs, src, dst) -> None:
    """Hadoop FileSystem.rename reports most failures by RETURNING
    FALSE, not raising — an unchecked call can silently drop the only
    remaining copy of a dataset after its destination was deleted.
    Every sink rename goes through this guard."""
    if not fs.rename(src, dst):
        raise IOError(f"filesystem rename failed: {src} -> {dst}")


def _swap_into(spark: SparkSession, staging: str, target: str) -> None:
    """Replace ``target`` with ``staging`` by FS renames — one metadata
    operation instead of a second full Spark write of the same rows.

    Crash-safe ordering (r10): the old target is renamed ASIDE
    (``target + "__old"``), never deleted before the staging copy is
    in place — at every instant at least one complete copy of the
    data sits at a known path (target, target__old, or a staging dir
    with Spark's ``_SUCCESS`` marker). The delete-then-rename form
    had a window where a crash left ONLY the staging dir, which the
    next run's ``mode=overwrite`` would destroy after bootstrapping
    state from a single batch. Read-modify-write state mergers call
    :func:`recover_swap` on entry to adopt the surviving copy."""
    fs, jtarget = _hadoop_fs(spark, target)
    _, jstaging = _hadoop_fs(spark, staging)
    _, jold = _hadoop_fs(spark, target + "__old")
    if fs.exists(jold):
        fs.delete(jold, True)
    if fs.exists(jtarget):
        _checked_rename(fs, jtarget, jold)
    _checked_rename(fs, jstaging, jtarget)
    if fs.exists(jold):
        fs.delete(jold, True)


def recover_swap(spark: SparkSession, staging: str, target: str) -> None:
    """Adopt the surviving copy of a dataset after a crash mid-swap.

    No-op when ``target`` exists. Otherwise a previous
    :func:`_swap_into` died between its renames; exactly one complete
    copy survives: a staging dir carrying Spark's ``_SUCCESS`` marker
    (the NEWER, already-merged copy — adopt it) or the
    ``target__old`` dir (the previous copy — restore it). Every
    read-modify-write state merger (HLL sketch state, additive-mart
    IVM, CDC snapshot) calls this before reading state, so the
    recovery is automatic on the next run, not an operator runbook."""
    fs, jtarget = _hadoop_fs(spark, target)
    if fs.exists(jtarget):
        return
    _, jstaging = _hadoop_fs(spark, staging)
    _, jok = _hadoop_fs(spark, staging.rstrip("/") + "/_SUCCESS")
    _, jold = _hadoop_fs(spark, target + "__old")
    if fs.exists(jstaging) and fs.exists(jok):
        _checked_rename(fs, jstaging, jtarget)
        if fs.exists(jold):
            fs.delete(jold, True)
    elif fs.exists(jold):
        _checked_rename(fs, jold, jtarget)


def write_overwrite(df: DataFrame, path: str) -> None:
    """S8: full-refresh sink (TRUNCATE + INSERT == mode=overwrite)."""
    df.write.mode("overwrite").parquet(path)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """S12: partitioned table sink; replaces PG range partitioning.

    Rows with NULL partition values land in the
    ``__HIVE_DEFAULT_PARTITION__`` directory — the analogue of the
    reference's DEFAULT partition (init.sql:107).
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def overwrite_window(
    spark: SparkSession, df: DataFrame, path: str, partition_col: str
) -> None:
    """S11+I2: dynamic partition overwrite — replace only the partitions
    present in ``df``, leaving others untouched (the Spark analogue of
    ``DELETE ... WHERE day >= cutoff`` + window rebuild,
    HW-4/airflow/dags/iot_temperature.py:160-216).

    Dynamic mode is set as a PER-WRITE option, not on the session —
    mutating the shared session conf would silently turn every later
    full-refresh ``write_partitioned`` (S8/S12 TRUNCATE+INSERT) into a
    partial overwrite that stops deleting absent partitions."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed table sink (co-located join layout; no reference
    analogue — PG has no bucketing, SURVEY §2.1).

    Two fact tables bucketed on their join key with the SAME bucket
    count join with ZERO shuffle: each task reads matching bucket
    files from both sides (plan shows SortMergeJoin with no Exchange).
    At 100 TB this converts the repeated multi-TB join shuffle into a
    one-time write-side cost — the single highest-leverage layout
    decision for a fact-to-fact join pipeline. Bucketing requires the
    table catalog (saveAsTable); ``path`` makes it an external table.
    """
    writer = df.write.mode("overwrite").option("path", path).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def upsert_keep_newest(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
    partition_col: str | None = None,
) -> None:
    """S10/I3: ``ON CONFLICT (key) DO UPDATE`` == keep-newest-per-key.

    Plain-Parquet idiom: read target, unionByName, rank by version desc
    within key, keep rn=1, overwrite. On Delta/Iceberg this is a single
    ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` — swap this
    body, keep the signature.

    With ``partition_col`` the upsert is PARTITION-SCOPED: only target
    partitions present in ``df`` are read and replaced — upserting one
    day into a 100 TB table touches that day, not the table. Requires
    the target to be laid out by ``partition_col``.

    The merged result is shuffled and WRITTEN ONCE (to a staging dir),
    then swapped into place with filesystem renames — the earlier
    stage-then-rewrite form paid the full shuffle+write twice and could
    lose the target if it died between the two overwrites. Target
    existence is checked explicitly via the Hadoop FS API: a transient
    read error (permissions, corrupt footer) now propagates instead of
    being mistaken for "first write" and silently discarding the table.
    The rename swap is not transactional across partitions; the
    production path for atomic upsert is Delta/Iceberg MERGE, as noted.
    """
    fs, jpath = _hadoop_fs(spark, path)
    # adopt the surviving copy if a previous non-partitioned upsert
    # died mid-swap — otherwise this run reads target_exists=False,
    # merges from just the batch, and the staging overwrite (plus
    # _swap_into's old-dir cleanup) destroys the last full copy
    recover_swap(spark, path.rstrip("/") + "__staging", path)
    target_exists = fs.exists(jpath)
    if partition_col is not None:
        touched = [
            r[0] for r in df.select(partition_col).distinct().collect()
        ]
        if target_exists:
            # NULL partition values need an explicit isNull branch:
            # `col IN (..., NULL)` is NULL (never true) in SQL, so the
            # existing __HIVE_DEFAULT_PARTITION__ rows would be left
            # out of the merge and then clobbered by the rename loop.
            non_null = [t for t in touched if t is not None]
            pred = (
                F.col(partition_col).isin(non_null)
                if non_null
                else F.lit(False)
            )
            if any(t is None for t in touched):
                pred = pred | F.col(partition_col).isNull()
            existing = spark.read.parquet(path).where(pred)
            merged = existing.unionByName(df, allowMissingColumns=True)
        else:
            merged = df
    else:
        if target_exists:
            existing = spark.read.parquet(path)
            merged = existing.unionByName(df, allowMissingColumns=True)
        else:
            merged = df
    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col))
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Parquet can't overwrite a path while reading it — write-to-new-
    # then-rename. A leftover staging dir from a crashed PRE-swap run
    # is harmlessly overwritten here (a mid-swap crash was already
    # adopted by recover_swap above, before the target read). Staging
    # is deleted ONLY on success: after a failed rename (target
    # already deleted) it holds the sole surviving copy of the merged
    # data, so a finally-block delete would turn a recoverable crash
    # into silent total loss.
    staging = path.rstrip("/") + "__staging"
    if partition_col is not None:
        result.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        # move only the touched partition directories into place;
        # listStatus preserves Spark's partition-value escaping
        _, jstaging = _hadoop_fs(spark, staging)
        if not target_exists:
            fs.mkdirs(jpath)
        prefix = f"{partition_col}="
        for status in fs.listStatus(jstaging):
            name = status.getPath().getName()
            if not name.startswith(prefix):
                continue
            dst = spark._jvm.org.apache.hadoop.fs.Path(jpath, name)
            if fs.exists(dst):
                fs.delete(dst, True)
            _checked_rename(fs, status.getPath(), dst)
    else:
        result.write.mode("overwrite").parquet(staging)
        _swap_into(spark, staging, path)
    sfs, jstaging = _hadoop_fs(spark, staging)
    sfs.delete(jstaging, True)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_col: str | None = None,
    zorder_cols: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ~target_file_mb files, returning the new file count.

    Streaming sinks and incremental upserts accrete small files; at
    scale the scan's task-per-file overhead and the NameNode/listing
    pressure dominate. Rewrites via write-to-staging-then-rename (one
    write, one shuffle). Sizing uses the Hadoop FS ContentSummary —
    correct on object storage, where driver-side ``pathlib`` sees
    nothing. ``sort_col`` additionally sorts within partitions so
    row-group min/max statistics become selective for that column
    (data skipping on later filtered scans).

    ``zorder_cols`` (mutually exclusive with ``sort_col``) clusters by
    the Morton interleave of the named numeric columns instead
    (functions/zorder.z_value): files then have bounded min/max extents
    in EVERY listed dimension, so box predicates over any of them skip
    files — a linear sort only ever serves its leading column. Rows are
    RANGE-partitioned by the key (repartitionByRange), not hashed: hash
    partitioning would scatter each z-range across all files and throw
    the clustering away.
    """
    import math

    # a compaction that died mid-swap left the (identical-content)
    # compacted copy in staging and no target — adopt it so the read
    # below sees the table instead of failing on a missing path
    recover_swap(spark, path.rstrip("/") + "__compacting", path)
    fs, jpath = _hadoop_fs(spark, path)
    size_bytes = fs.getContentSummary(jpath).getLength()
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(size_bytes / (target_file_mb * 1024 * 1024)))
    if zorder_cols:
        if sort_col:
            raise ValueError("sort_col and zorder_cols are mutually exclusive")
        from ..functions.zorder import z_value

        key = z_value([F.col(c) for c in zorder_cols])
        out = (
            df.withColumn("__z", key)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif sort_col:
        # RANGE partition + sort: each output file owns a disjoint value
        # range, so min/max footers prune at FILE granularity. A plain
        # repartition would hand every file a random sample — row
        # groups inside a file stay sorted, but every file would still
        # intersect every predicate.
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(n_files)
    staging = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(staging)
    _swap_into(spark, staging, path)
    return n_files


# --- versioned atomic-commit table (plain-parquet Delta-log idiom) ----------


def _versioned_log_dir(root: str) -> str:
    return root.rstrip("/") + "/_log"


def _versioned_data_dir(root: str, version: int) -> str:
    return f"{root.rstrip('/')}/v{version:08d}"


def _publish_commit(
    spark: SparkSession, root: str, version: int, payload: str
) -> None:
    """Publish version ``version`` by atomically renaming
    ``_log/<v>.commit.tmp`` -> ``_log/<v>.commit`` carrying
    ``payload``. Rename-to-a-NEW-NAME is atomic on HDFS/local (and an
    S3 marker PUT is atomic), so readers resolve either the old or the
    new version, never a mix. Raises if the commit already exists
    (single-writer contract)."""
    log_dir = _versioned_log_dir(root)
    fs, jlog = _hadoop_fs(spark, log_dir)
    fs.mkdirs(jlog)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(jlog, f"{version:08d}.commit.tmp")
    final = jvm.org.apache.hadoop.fs.Path(jlog, f"{version:08d}.commit")
    out = fs.create(tmp, True)
    out.write(bytearray(payload, "utf-8"))
    out.close()
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"commit {version} already exists under {log_dir}: concurrent "
            "writer (this sink is single-writer; use Delta/Iceberg for OCC)"
        )


def _commit_payload(spark: SparkSession, root: str, version: int) -> str | None:
    """Content of a committed marker (tiny), or None if uncommitted —
    how the exactly-once streaming mart reads back the epoch its last
    commit atomically recorded."""
    fs, jpath = _hadoop_fs(
        spark, _versioned_log_dir(root) + f"/{version:08d}.commit"
    )
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        chunks = []
        while True:
            b = stream.read()
            if b < 0:
                break
            chunks.append(b)
        return bytes(chunks).decode("utf-8")
    finally:
        stream.close()


def _gc_data_dirs(spark: SparkSession, root: str, cutoff: int) -> None:
    """Reclaim data dirs for versions <= cutoff by ONE listing of the
    live dirs, not exists-probes from v1: after steady-state GC only
    ~keep_versions dirs remain, so each commit's GC is O(keep), not
    O(total versions ever written) — the difference between a
    per-micro-batch streaming sink that stays flat and one that
    degrades O(N^2) over its lifetime. Commit markers stay (tiny, the
    time-travel log — the Delta log idiom)."""
    fs, jroot = _hadoop_fs(spark, root)
    for status in fs.listStatus(jroot):
        name = status.getPath().getName()
        if (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) <= cutoff
        ):
            fs.delete(status.getPath(), True)


def current_version(spark: SparkSession, root: str) -> int | None:
    """Highest COMMITTED version of a versioned table, or None.

    A version exists iff its commit marker ``_log/<n>.commit`` exists;
    data directories without a marker are invisible (crashed writers).
    """
    fs, jlog = _hadoop_fs(spark, _versioned_log_dir(root))
    if not fs.exists(jlog):
        return None
    versions = []
    for status in fs.listStatus(jlog):
        name = status.getPath().getName()
        if name.endswith(".commit"):
            try:
                versions.append(int(name[: -len(".commit")]))
            except ValueError:
                continue
    return max(versions) if versions else None


def list_versions(spark: SparkSession, root: str) -> list[int]:
    """COMMITTED versions whose data is still retained (time-travel
    targets), ascending. Commit markers are kept forever, data dirs
    only for the last ``keep_versions`` — a version is readable iff
    both exist."""
    fs, jlog = _hadoop_fs(spark, _versioned_log_dir(root))
    if not fs.exists(jlog):
        return []
    out = []
    for status in fs.listStatus(jlog):
        name = status.getPath().getName()
        if name.endswith(".commit"):
            try:
                v = int(name[: -len(".commit")])
            except ValueError:
                continue
            _, jdata = _hadoop_fs(spark, _versioned_data_dir(root, v))
            if fs.exists(jdata):
                out.append(v)
    return sorted(out)


def read_versioned(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a committed snapshot of a versioned table — the current one
    by default, or ``version`` for time travel (plain-parquet twin of
    Delta's ``versionAsOf``). Raises FileNotFoundError for a version
    that was never committed or whose data dir has been retained out
    (``keep_versions`` GC); a crashed writer's orphan data dir is not
    readable because it has no commit marker."""
    if version is None:
        v = current_version(spark, root)
        if v is None:
            raise FileNotFoundError(f"no committed version under {root}")
    else:
        if version not in list_versions(spark, root):
            raise FileNotFoundError(
                f"version {version} of {root} is not committed+retained "
                f"(available: {list_versions(spark, root)})"
            )
        v = version
    return spark.read.parquet(_versioned_data_dir(root, v))


def versioned_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Row-level diff between two retained snapshots: (id, status) with
    status in ('added', 'removed', 'changed', 'unchanged') by content
    md5 — time travel composed with operators/snapshot.corpus_diff, the
    audit query "what did the last upsert actually change". One
    full-outer join on the key; both sides are column-pruned scans of
    (id, content)."""
    from ..operators.snapshot import corpus_diff

    return corpus_diff(
        read_versioned(spark, root, v_old),
        read_versioned(spark, root, v_new),
        id_col=id_col,
        text_col=content_col,
    )


def versioned_upsert(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    key_cols: list[str],
    version_col: str,
    keep_versions: int = 2,
    _crash_before_commit: bool = False,
) -> int:
    """S10/I3, ATOMIC form (VERDICT r2 #6): keep-newest-per-key upsert
    into a versioned table whose readers can never observe a partial
    state — the plain-parquet reconstruction of the Delta/Iceberg
    commit protocol, with zero new dependencies.

    Protocol (single writer, as Delta without optimistic concurrency):

    1. merge = keep-newest(current snapshot ∪ df) — same ranking as
       upsert_keep_newest.
    2. write the FULL merged snapshot to a fresh data dir
       ``v<n+1>`` — invisible to readers, who only follow commit
       markers. An orphan dir left by a crashed writer at the same
       version is deleted first.
    3. publish by renaming ``_log/<n+1>.commit.tmp`` ->
       ``_log/<n+1>.commit``. Rename-to-a-NEW-NAME is atomic on HDFS
       and local filesystems (and an S3 PUT of the marker object is
       atomic too), so a reader either resolves version n or version
       n+1 — never a mix, never a partial directory. This is exactly
       the one-file-per-commit log idiom; a ``_SUCCESS``-flag-in-place
       scheme cannot give this, because overwriting a flag truncates in
       place.
    4. retain the last ``keep_versions`` data dirs (time travel /
       in-flight readers), GC older ones; markers are tiny and kept.

    A crash before step 3 leaves only an orphan data dir: readers are
    untouched and the next upsert reclaims the version number. Crash
    after step 3 is a completed commit. The partition-scoped variant
    (upsert_keep_newest with partition_col) intentionally remains
    non-versioned: it rewrites only touched partitions at the cost of
    the cross-partition atomicity documented there; this sink pays a
    full-snapshot write for all-or-nothing visibility — at 100 TB you
    reserve it for dimension/mart tables (fact tables take the
    partition-scoped path or a real Delta/Iceberg MERGE).

    Returns the committed version number.
    """
    cur = current_version(spark, root)
    if cur is None:
        merged = df
        nxt = 1
    else:
        existing = spark.read.parquet(_versioned_data_dir(root, cur))
        merged = existing.unionByName(df, allowMissingColumns=True)
        nxt = cur + 1
    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col))
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    data_dir = _versioned_data_dir(root, nxt)
    fs, jdata = _hadoop_fs(spark, data_dir)
    if fs.exists(jdata):  # orphan of a crashed writer at this version
        fs.delete(jdata, True)
    result.write.parquet(data_dir)

    if _crash_before_commit:  # test hook: die with data written, unpublished
        raise RuntimeError("simulated crash before commit rename")
    _publish_commit(spark, root, nxt, f"v{nxt:08d}\n")
    _gc_data_dirs(spark, root, nxt - keep_versions)
    return nxt
