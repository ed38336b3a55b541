"""Unit tests for operators/timeseries.gap_fill_daily."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.timeseries import gap_fill_daily


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def test_gap_fill_fills_interior_gaps_forward(spark):
    rows = [
        ("a", _d("2024-01-01"), 10.0),
        ("a", _d("2024-01-04"), 40.0),
        ("b", _d("2024-02-10"), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {
        (r["k"], r["day"].isoformat()): r
        for r in gap_fill_daily(df, ["k"], "day", ["v"]).collect()
    }
    # a: 4 calendar days, gaps on 02/03 carry 10.0 forward
    assert len(out) == 5
    assert out[("a", "2024-01-02")]["v"] == 10.0
    assert out[("a", "2024-01-02")]["is_observed"] is False
    assert out[("a", "2024-01-03")]["v"] == 10.0
    assert out[("a", "2024-01-04")]["v"] == 40.0
    assert out[("a", "2024-01-04")]["is_observed"] is True
    # b: single observation -> single-row span, no fabricated days
    assert out[("b", "2024-02-10")]["v"] == 7.0


def test_gap_fill_span_is_per_key_not_global(spark):
    rows = [
        ("a", _d("2024-01-01"), 1.0),
        ("a", _d("2024-01-02"), 2.0),
        ("b", _d("2024-03-01"), 3.0),
        ("b", _d("2024-03-03"), 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = gap_fill_daily(df, ["k"], "day", ["v"]).collect()
    days = {r["k"]: sorted(r2["day"].isoformat() for r2 in out if r2["k"] == r["k"]) for r in out}
    assert days["a"] == ["2024-01-01", "2024-01-02"]
    assert days["b"] == ["2024-03-01", "2024-03-02", "2024-03-03"]


def test_gap_fill_multiple_value_columns(spark):
    rows = [("a", _d("2024-01-01"), 1.0, 100.0), ("a", _d("2024-01-03"), 3.0, 300.0)]
    df = spark.createDataFrame(rows, "k string, day date, v double, w double")
    mid = [
        r
        for r in gap_fill_daily(df, ["k"], "day", ["v", "w"]).collect()
        if r["day"] == _d("2024-01-02")
    ][0]
    assert mid["v"] == 1.0 and mid["w"] == 100.0 and mid["is_observed"] is False


def test_gap_fill_plan_has_no_udf_and_bounded_shuffles(spark):
    df = spark.createDataFrame(
        [("a", _d("2024-01-01"), 1.0), ("a", _d("2024-01-05"), 5.0)],
        "k string, day date, v double",
    )
    plan = (
        gap_fill_daily(df, ["k"], "day", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # pure JVM: sequence + window, no UDF
    assert "Cartesian" not in plan


# --- benford_screen (operators/profile) -----------------------------------


def test_benford_screen_digits_and_exclusions(spark):
    from hse_etl_ochirov_aldar_spark.operators.profile import (
        BENFORD_PCT,
        benford_screen,
    )

    # 1000 and 100000 are exact powers of ten -> digit 1 (the float
    # log10 trap); 0, -5, NULL are excluded.
    rows = [(1000,), (100000,), (23,), (250,), (999,), (0,), (-5,), (None,)]
    df = spark.createDataFrame(rows, "u long")
    out = {r["digit"]: r for r in benford_screen(df, F.col("u")).collect()}
    assert out[1]["n"] == 2
    assert out[2]["n"] == 2
    assert out[9]["n"] == 1
    assert all(r["n_excluded"] == 3 for r in out.values())
    assert out[1]["observed_pct"] == 0.4  # 2/5
    assert out[1]["benford_pct"] == BENFORD_PCT[1]
    assert out[1]["deviation"] == round(0.4 - BENFORD_PCT[1], 6)
    # digits with zero observations are absent, not fabricated
    assert 3 not in out
