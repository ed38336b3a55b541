"""Layered pipeline runner (SURVEY.md I1, I5, §3).

The reference orchestrates with Airflow DAGs: task dependencies
(``t_load >> t_transform``), fan-in lists, retries=2 with delay
(mongo_to_postgres_replication.py:18-22,307), and validation gates that
fail the run. Here a pipeline is driver-side function composition —
each stage is a named ``(SparkSession) -> DataFrame | None`` callable;
lineage is Spark's own logical plan, so there is nothing like a
scheduler to implement. Retries wrap transient-failure stages
(the HTTP-fetch analogue), not deterministic transforms.

This is deliberately thin: orchestration is NOT an engine concern
(SURVEY §0) — the engine's value is the operators; this runner exists
so reference pipelines (raw -> clean -> mart + gates) can be expressed
1:1 and tested.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession], object]
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class Pipeline:
    """Ordered stages with per-stage retry; mirrors the reference's
    DAG semantics (sequential chain + fan-in = plain ordering here)."""

    name: str
    stages: list[Stage] = field(default_factory=list)

    def add(self, name: str, fn: Callable[[SparkSession], object], retries: int = 0,
            retry_delay_s: float = 0.0) -> "Pipeline":
        self.stages.append(Stage(name, fn, retries, retry_delay_s))
        return self

    def run(self, spark: SparkSession) -> dict[str, object]:
        results: dict[str, object] = {}
        for stage in self.stages:
            attempt = 0
            while True:
                try:
                    results[stage.name] = stage.fn(spark)
                    break
                except Exception:
                    attempt += 1
                    if attempt > stage.retries:
                        raise
                    if stage.retry_delay_s:
                        time.sleep(stage.retry_delay_s)
        return results
