"""Corpus snapshot diff (dataset-versioning bookkeeping).

Incremental corpus pipelines (CommonCrawl-style refreshes) need the
delta between two snapshot versions before deciding what to re-process:
which documents are new, which disappeared, which changed content.
Reference analogue: the incremental last-N-days rebuild contract (I2,
incremental_mart.py) generalized from a time-window cutoff to a
content-hash comparison — and the S9/S10 insert-if-absent/upsert pair
is exactly "apply the ADDED/CHANGED partitions of this diff".

Scale shape (100 TB): both sides reduce to (id, 16-byte md5) BEFORE
the full-outer join, so the shuffle carries 24-byte rows, never
document payloads; the join is a keyed equi-join AQE can plan either
direction. Output is row-per-id with a status enum — feed it to a
left-semi join against the new snapshot to materialize just the
changed slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status) for every id in either snapshot: status in
    ('added', 'removed', 'changed', 'unchanged') by content md5."""
    o = old.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("__ho"))
    n = new.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("__hn"))
    return (
        o.join(n, "id", "full_outer")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("__ho").isNull(), F.lit("added"))
            .when(F.col("__hn").isNull(), F.lit("removed"))
            .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
