"""Unit tests for operators/agreement.py and rolling_median_daily."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


# --- cohens_kappa ----------------------------------------------------------


def _kappa_df(spark, n11, n10, n01, n00, nulls=0):
    rows = (
        [(True, True)] * n11
        + [(True, False)] * n10
        + [(False, True)] * n01
        + [(False, False)] * n00
        + [(None, True)] * nulls
    )
    return spark.createDataFrame(rows, "a boolean, b boolean")


def test_kappa_textbook_value(spark):
    from hse_etl_ochirov_aldar_spark.operators.agreement import cohens_kappa

    # classic worked example: 20/5/10/15 -> po=0.7, pe=0.5, kappa=0.4
    df = _kappa_df(spark, 20, 5, 10, 15)
    r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["n_items"] == 50
    assert (r["n_both_pass"], r["n_only_a"], r["n_only_b"], r["n_neither"]) == (
        20, 5, 10, 15,
    )
    assert r["p_o"] == 0.7
    assert r["p_e"] == 0.5
    assert r["kappa"] == 0.4


def test_kappa_perfect_and_chance(spark):
    from hse_etl_ochirov_aldar_spark.operators.agreement import cohens_kappa

    perfect = _kappa_df(spark, 7, 0, 0, 3)
    assert cohens_kappa(perfect, F.col("a"), F.col("b")).collect()[0]["kappa"] == 1.0
    # judge A constant (B not): chance agreement fully explains p_o ->
    # kappa exactly 0, still defined
    const_a = _kappa_df(spark, 5, 5, 0, 0)
    assert cohens_kappa(const_a, F.col("a"), F.col("b")).collect()[0]["kappa"] == 0.0
    # BOTH judges constant -> denominator 0 -> NULL kappa, not a crash
    const_both = _kappa_df(spark, 8, 0, 0, 0)
    assert cohens_kappa(const_both, F.col("a"), F.col("b")).collect()[0]["kappa"] is None


def test_kappa_null_judges_excluded(spark):
    from hse_etl_ochirov_aldar_spark.operators.agreement import cohens_kappa

    df = _kappa_df(spark, 4, 1, 1, 4, nulls=3)
    r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["n_items"] == 10
    assert r["n_unjudged"] == 3


# --- rolling_median_daily --------------------------------------------------


def _d(s):
    return datetime.date.fromisoformat(s)


def test_rolling_median_calendar_window_and_gaps(spark):
    from hse_etl_ochirov_aldar_spark.operators.timeseries import rolling_median_daily

    rows = [
        ("k", _d("2024-01-01"), 100),
        ("k", _d("2024-01-02"), 300),
        ("k", _d("2024-01-03"), 200),
        # 6-day gap: 2024-01-10 is > 6 days after 01-02/01-03? 01-03 is
        # 7 days before -> OUTSIDE the 6-preceding range frame
        ("k", _d("2024-01-10"), 900),
    ]
    df = spark.createDataFrame(rows, "key string, day date, units long")
    out = {r["day"].isoformat(): r for r in rolling_median_daily(df).collect()}
    assert out["2024-01-01"]["n_in_window"] == 1
    assert out["2024-01-01"]["median_value"] == 1.0  # 100/100
    # [100, 300] -> even: (100+300)/2 = 200 units = 2.0
    assert out["2024-01-02"]["median_units_x2"] == 400
    assert out["2024-01-02"]["median_value"] == 2.0
    # [100, 200, 300] -> 200 units
    assert out["2024-01-03"]["median_units_x2"] == 400
    assert out["2024-01-03"]["median_value"] == 2.0
    # calendar gap: only itself in range
    assert out["2024-01-10"]["n_in_window"] == 1
    assert out["2024-01-10"]["median_value"] == 9.0


def test_rolling_median_robust_vs_outlier_and_plan(spark):
    from hse_etl_ochirov_aldar_spark.operators.timeseries import rolling_median_daily

    days = [(f"2024-02-{i:02d}", 100) for i in range(1, 7)] + [("2024-02-07", 100000)]
    rows = [("k", _d(d), u) for d, u in days]
    df = spark.createDataFrame(rows, "key string, day date, units long")
    out = {r["day"].isoformat(): r for r in rolling_median_daily(df).collect()}
    # the outlier day's median stays at the typical level
    assert out["2024-02-07"]["median_value"] == 1.0
    plan = rolling_median_daily(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
