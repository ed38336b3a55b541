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
    HW-4/airflow/dags/iot_temperature.py:160-216)."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


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
    partitions present in ``df`` are read and dynamically overwritten —
    upserting one day into a 100 TB table touches that day, not the
    table. Requires the target to be laid out by ``partition_col``.
    """
    if partition_col is not None:
        touched = [
            r[0] for r in df.select(partition_col).distinct().collect()
        ]
        try:
            existing = spark.read.parquet(path).where(
                F.col(partition_col).isin(touched)
            )
            merged = existing.unionByName(df, allowMissingColumns=True)
        except Exception:  # first write: target does not exist yet
            merged = df
    else:
        try:
            existing = spark.read.parquet(path)
            merged = existing.unionByName(df, allowMissingColumns=True)
        except Exception:
            merged = df
    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col))
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Parquet can't overwrite a path while reading it — standard
    # practice is write-to-new-then-swap; locally we stage through a
    # sibling dir.
    staging = path.rstrip("/") + "__staging"
    result.write.mode("overwrite").parquet(staging)
    final = spark.read.parquet(staging)
    if partition_col is not None:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        final.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    else:
        final.write.mode("overwrite").parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_col: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ~target_file_mb files, returning the new file count.

    Streaming sinks and incremental upserts accrete small files; at
    scale the scan's task-per-file overhead and the NameNode/listing
    pressure dominate. Rewrites via write-to-staging-then-swap.
    ``sort_col`` additionally sorts within partitions so row-group
    min/max statistics become selective for that column (data
    skipping on later filtered scans).
    """
    import math
    import shutil
    from pathlib import Path

    df = spark.read.parquet(path)
    size_bytes = sum(
        f.stat().st_size for f in Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(size_bytes / (target_file_mb * 1024 * 1024)))
    out = df.repartition(n_files)
    if sort_col:
        out = out.sortWithinPartitions(sort_col)
    staging = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(staging)
    final = spark.read.parquet(staging)
    final.write.mode("overwrite").parquet(path)
    shutil.rmtree(staging, ignore_errors=True)
    return n_files
