"""Data-quality gates (SURVEY.md P9, A9, I6).

The reference's only correctness machinery: non-empty row-count gates
that fail the DAG (mongo_to_postgres_replication.py:274-287,
build_analytical_marts.py:130-138) and a CHECK constraint
(rating BETWEEN 1 AND 5, final-module-3/init/init.sql:67).

Spark has no constraints; these are explicit validation actions. Each
is a single job (count / limited aggregation) — cheap relative to the
pipeline they gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class QualityError(RuntimeError):
    """Raised when a gate fails — the DAG-failure analogue."""


def expect_nonempty(df: DataFrame, name: str = "dataset") -> DataFrame:
    """A9/I6: fail unless the dataset has at least one row."""
    if df.limit(1).count() == 0:
        raise QualityError(f"{name}: expected non-empty result")
    return df


def violation_count(df: DataFrame, predicate: Column) -> int:
    """P9: rows violating a domain check (e.g. ``rating BETWEEN 1 AND 5``)."""
    return df.where(~predicate).count()


def expect_check(df: DataFrame, predicate: Column, name: str = "check") -> DataFrame:
    """CHECK-constraint analogue: fail if any row violates the predicate."""
    bad = violation_count(df, predicate)
    if bad:
        raise QualityError(f"{name}: {bad} rows violate the constraint")
    return df


def expect_unique_key(df: DataFrame, key_cols: list[str], name: str = "pk") -> DataFrame:
    """PK analogue: fail if the key is not unique."""
    dupes = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if dupes:
        raise QualityError(f"{name}: duplicate keys on {key_cols}")
    return df


def observed_checks(
    df: DataFrame,
    checks: dict[str, Column],
    name: str = "observed",
):
    """Zero-extra-job gates via ``DataFrame.observe``: metrics are
    accumulated DURING the write/action that consumes ``df``, instead
    of re-running the pipeline once per gate (each ``expect_*`` above
    costs a full job — fine for small gates, wasteful when the gated
    frame is a 100 TB write).

    ``checks`` maps metric name -> aggregate Column (e.g.
    ``F.count(F.when(~pred, 1))`` for a violation count). Returns
    ``(df, validate)`` where ``validate()`` must be called AFTER an
    action on the returned df; it raises QualityError if any metric is
    nonzero.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in checks.items()])

    def validate() -> dict:
        got = obs.get
        bad = {k: v for k, v in got.items() if v}
        if bad:
            raise QualityError(f"{name}: violations {bad}")
        return got

    return observed, validate


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Rows of ``child`` whose foreign key has no match in ``parent``
    (NULL keys are NOT orphans — a nullable FK is 'unknown', not
    'dangling'; gate NULLs separately with expect_check). LEFT ANTI
    join: the parent side carries only its key column through
    projection, broadcasts when small, and nothing is collected."""
    keys = parent.select(F.col(parent_key).alias(child_key)).dropDuplicates()
    return child.where(F.col(child_key).isNotNull()).join(
        keys, child_key, "left_anti"
    )


def expect_referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str = "fk",
) -> DataFrame:
    """Gate: raise QualityError when any non-NULL child key dangles.
    Returns ``child`` unchanged for pipeline chaining."""
    n = fk_orphans(child, parent, child_key, parent_key).count()
    if n:
        raise QualityError(f"{name}: {n} orphaned {child_key} rows")
    return child
