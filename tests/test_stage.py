"""Session-scoped staging lifecycle (_stage.py — r7 verdict task #4,
ADVICE r7 medium: temp-dir leak + driver-local path on multi-node)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark import _stage
from hse_etl_ochirov_aldar_spark._stage import (
    STAGE_DIR_ENV,
    purge_stage_root,
    scratch_dir,
    stage_parquet,
    stage_root,
)


def test_stage_parquet_roundtrip_and_shared_root(spark):
    """Staged frames read back identically, and every stage lands under
    ONE per-process root (the leak fix: old code mkdtemp'd per call at
    top-level /tmp with no cleanup registration)."""
    df = spark.range(100).withColumn("k", F.col("id") % 7)
    staged = stage_parquet(df, prefix="hse_test_")
    assert staged.count() == 100
    assert sorted(staged.columns) == ["id", "k"]
    root = stage_root(spark)
    staged2 = stage_parquet(df, prefix="hse_test_")
    files = [
        f.replace("file://", "")
        for f in staged.inputFiles() + staged2.inputFiles()
    ]
    assert files and all(f.startswith(root) for f in files)
    # distinct per-call dirs under the shared root
    dirs = {f.rsplit("/", 2)[1] for f in files}
    assert len(dirs) == 2


def test_stage_coalesce_bounds_file_count(spark):
    df = spark.range(1000).repartition(64)
    staged = stage_parquet(df, prefix="hse_test_", coalesce=4)
    assert len(staged.inputFiles()) <= 4


def test_scratch_dir_unique_and_under_root(spark):
    a = scratch_dir(spark, "hse_test_ws_")
    b = scratch_dir(spark, "hse_test_ws_")
    assert a != b
    assert os.path.isdir(a) and os.path.isdir(b)
    assert a.startswith(stage_root(spark))


def test_env_override_wins(spark, tmp_path, monkeypatch):
    monkeypatch.setenv(STAGE_DIR_ENV, str(tmp_path) + "/")
    assert stage_root(spark) == str(tmp_path)


def test_unique_names_across_processes():
    """Per-call names embed pid + uuid, never just a counter: under a
    CONFIGURED shared root two concurrent sessions each start their
    counter at 0, so '<root>/<prefix>0' would collide and one job
    would silently read the other's staged rows (ADVICE r8 medium)."""
    a = _stage._unique_name("hse_x_")
    b = _stage._unique_name("hse_x_")
    assert a != b
    assert str(os.getpid()) in a
    # counter-only suffixes are the failure mode being excluded: the
    # name must carry entropy beyond the per-process sequence number
    assert len(a) >= len("hse_x_") + len(str(os.getpid())) + 1 + 1 + 12


def test_shared_root_stage_names_collision_free(spark, tmp_path,
                                                monkeypatch):
    """Simulate the two-process race: reset the module counter (as a
    second process would see it) and stage into the SAME shared root —
    the dirs must still be distinct."""
    monkeypatch.setenv(STAGE_DIR_ENV, str(tmp_path))
    df = spark.range(5)
    s1 = stage_parquet(df, prefix="hse_race_")
    monkeypatch.setattr(_stage, "_seq", __import__("itertools").count())
    s2 = stage_parquet(df, prefix="hse_race_")
    d1 = {f.rsplit("/", 2)[1] for f in s1.inputFiles()}
    d2 = {f.rsplit("/", 2)[1] for f in s2.inputFiles()}
    assert d1 and d2 and d1.isdisjoint(d2)
    assert s1.count() == 5 and s2.count() == 5


def test_purge_removes_default_root_and_recreates(spark):
    df = spark.range(10)
    staged = stage_parquet(df, prefix="hse_test_")
    staged.count()
    root = stage_root(spark)
    assert os.path.isdir(root)
    purge_stage_root()
    assert not os.path.exists(root)
    # next stage call transparently re-creates a fresh root
    again = stage_parquet(df, prefix="hse_test_")
    assert again.count() == 10
    assert stage_root(spark) != root


def test_nonlocal_master_without_config_raises(monkeypatch):
    """A driver-local default on a real cluster silently drops
    executor-written files — the helper must refuse."""

    class _Ctx:
        master = "spark://host:7077"

    class _Conf:
        def get(self, key, default=None):
            return default

    class _Spark:
        sparkContext = _Ctx()
        conf = _Conf()

    monkeypatch.delenv(STAGE_DIR_ENV, raising=False)
    with pytest.raises(ValueError, match="shared stage directory"):
        stage_root(_Spark())


def test_nonlocal_master_with_env_config_ok(monkeypatch):
    class _Ctx:
        master = "yarn"

    class _Conf:
        def get(self, key, default=None):
            return default

    class _Spark:
        sparkContext = _Ctx()
        conf = _Conf()

    monkeypatch.setenv(STAGE_DIR_ENV, "hdfs://nn/scratch/")
    assert stage_root(_Spark()) == "hdfs://nn/scratch"


def test_atexit_registered_for_default_root(spark):
    """The default root registers interpreter-exit removal — the
    actual leak-fix contract."""
    import atexit  # noqa: F401  (behavioral check below)

    _stage._process_root = None
    calls: list[tuple] = []
    orig = _stage.atexit.register
    try:
        _stage.atexit.register = lambda *a, **k: calls.append((a, k))
        root = _stage._default_root()
    finally:
        _stage.atexit.register = orig
    assert calls and calls[0][0][1] == root
