"""SparkSession construction with scale-aware defaults.

The same builder serves local tests (``local[N]``) and a real cluster —
only ``master`` and sizing configs differ. The knobs below are the ones
that matter at 100 TB:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces it down, so we set it to ~2-3x core count locally and would
  set it to ~2-3x total executor cores on a cluster.
- Arrow on: every Pandas-UDF boundary (multimodal plumbing, similarity
  escape hatches) moves columnar batches, not pickled rows.
- ``maxPartitionBytes`` 128m keeps scan partitions executor-memory-sized;
  at 100 TB that yields ~800k scan tasks, which Spark handles fine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hse-etl-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``extra_conf``: caller-specific configs applied last (e.g. the plan
    auditor raises ``spark.sql.ui.retainedExecutions`` so the status
    store cannot evict plans mid-audit). Only effective when this call
    CREATES the session — getOrCreate cannot retrofit static confs onto
    an existing one, so pass it from the process's first builder."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing floor deliberately left at its 1 MB default
        # (r12): an A/B at 64k/256k/1m showed a catalog-wide smaller
        # floor taxes every light multi-stage pipeline with extra
        # task overhead (~+0.5-1.4s each on ewma/semantic_dedup/
        # redirect/kcore/v3) for wins on a handful of EXPRESSION-bound
        # stages. Those stages get explicit repartitions instead (the
        # cosine_dup_ids precedent): Catalyst prices partitions by
        # bytes, so where per-row CPU dominates, the operator states
        # the parallelism it needs.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Postgres-compatible null-on-error casts (SURVEY.md §2.8 F1/F11:
        # the reference relies on to_timestamp/cast failure -> NULL paths).
        .config("spark.sql.ansi.enabled", "false")
        # size(NULL) = 0 would be nicer but we keep the default and wrap
        # with coalesce/when in the expression library (SURVEY.md A8).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
