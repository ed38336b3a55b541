"""Funnel analysis: ordered multi-step conversion over an event stream.

The product-analytics staple the reference's mart layer approximates
with per-status conditional counts (build_analytical_marts.py:102-124)
— upgraded to true SEQUENTIAL semantics: a user completes step k only
with an event of step k's type STRICTLY AFTER their step k-1
completion time (first-touch attribution; re-orderings don't count).

Scale shape (100 TB): events are filtered to the funnel's types before
anything shuffles; step 1 is one user-keyed aggregate, and each later
step is one equi-join of the (user, t_{k-1}) aggregate — user-count
sized, NOT event-sized — back to that step's filtered events plus one
more user-keyed aggregate. k steps = k aggregates + k-1 key joins, all
on the same user key (co-partitioned after the first shuffle; AQE
reuses the exchange). No window over the full event stream, no
per-user array materialization, so a power user with millions of
events costs only their share of the filtered scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_seconds: int | None = None,
) -> DataFrame:
    """One row per user who completed step 1: columns ``t1..tk``
    (timestamp of the FIRST qualifying event per step, strictly
    increasing; NULL from the first uncompleted step onward).
    ``window_seconds`` is the standard conversion window: step k must
    land within that many seconds after step k-1 (default: any time
    after)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.where(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(user_col, ts_col, type_col)
    out = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = F.col(f"t{i - 1}")
        in_window = F.col(ts_col) > prev
        if window_seconds is not None:
            in_window = in_window & (
                F.col(ts_col)
                <= prev + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
            )
        nxt = (
            ev.where(F.col(type_col) == step)
            .join(out.select(user_col, f"t{i - 1}"), user_col)
            .where(in_window)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_report(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_seconds: int | None = None,
) -> DataFrame:
    """One-row funnel summary: per-step completing-user counts
    (``n_step1..k`` BIGINT) and conversion from step 1 in exact basis
    points (``conv_step2..k_bp`` = 10000·n_k div n_1)."""
    per_user = funnel_steps(
        df, steps, user_col, ts_col, type_col, window_seconds
    )
    aggs = [F.count(F.col("t1")).alias("n_step1")]
    for i in range(2, len(steps) + 1):
        aggs.append(F.count(F.col(f"t{i}")).alias(f"n_step{i}"))
    summary = per_user.agg(*aggs)
    # zero guard: with no step-1 completers Spark's `div` yields NULL
    # while SQL `//` raises division-by-zero — pin the empty funnel to
    # 0 bp on both engines (oracle mirrors the CASE)
    convs = [
        F.expr(
            f"CAST(CASE WHEN n_step1 > 0 "
            f"THEN n_step{i} * 10000 div n_step1 ELSE 0 END AS BIGINT)"
        ).alias(f"conv_step{i}_bp")
        for i in range(2, len(steps) + 1)
    ]
    return summary.select("*", *convs)
