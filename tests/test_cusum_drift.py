"""Unit tests for operators/timeseries.cusum_changepoints and
operators/drift.ks_two_sample."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.drift import ks_two_sample
from hse_etl_ochirov_aldar_spark.operators.timeseries import cusum_changepoints


def _python_cusum(xs, med2, devmed2):
    """Textbook recursion the relational form must reproduce (x4 scale):
    y+ = 4x - 4*med - 4*MAD = 4x - 2*med2 - devmed2, symmetric below."""
    s_pos = s_neg = 0
    out = []
    for x in xs:
        s_pos = max(0, s_pos + 4 * x - 2 * med2 - devmed2)
        s_neg = max(0, s_neg + 2 * med2 - devmed2 - 4 * x)
        out.append((s_pos, s_neg))
    return out


def test_cusum_matches_textbook_recursion(spark):
    # one key, hand-built drift: stable around 10, then shifts to ~14
    # for the final third (short enough that the robust center stays
    # at the base level: med2=20, devmed2=2 -> threshold 10).
    xs = [10, 11, 9, 10, 10, 10, 10, 10, 14, 14, 15, 14]
    day0 = dt.date(2024, 1, 1)
    rows = [("k", day0 + dt.timedelta(days=i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, day date, units long")
    out = cusum_changepoints(df, "k", "day", "units").orderBy("day").collect()
    med2, devmed2 = out[0]["med2"], out[0]["devmed2"]
    assert (med2, devmed2) == (20, 2)
    ref = _python_cusum(xs, med2, devmed2)
    got = [(r["cusum_pos_x4"], r["cusum_neg_x4"]) for r in out]
    assert got == [(int(a), int(b)) for a, b in ref]
    # the level shift must raise a positive alarm by the end
    assert out[-1]["alarm_pos"] is True
    assert not any(r["alarm_neg"] for r in out)


def test_cusum_reset_to_zero(spark):
    # a single spike then return to center: the reflected-min identity
    # must reset the statistic, not let it linger.
    xs = [10, 10, 50, 10, 10, 10, 10, 10, 10]
    day0 = dt.date(2024, 1, 1)
    rows = [("k", day0 + dt.timedelta(days=i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, day date, units long")
    out = cusum_changepoints(df, "k", "day", "units").orderBy("day").collect()
    med2, devmed2 = out[0]["med2"], out[0]["devmed2"]
    ref = _python_cusum(xs, med2, devmed2)
    assert [(r["cusum_pos_x4"], r["cusum_neg_x4"]) for r in out] == ref


def test_ks_two_sample_exact(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: D = 2/4 at value 2.
    rows = [("g", "a", v) for v in [1, 2, 3, 4]] + [
        ("g", "b", v) for v in [3, 4, 5, 6]
    ]
    df = spark.createDataFrame(rows, "g string, s string, vu long")
    out = ks_two_sample(df, "g", "vu", F.col("s") == "a").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["d_num"] == 8  # |2*4 - 0*4| = 8 -> D = 0.5
    assert r["ks_stat"] == 0.5
    assert r["at_units"] == 2


def test_ks_identical_samples_zero(spark):
    rows = [("g", s, v) for s in ("a", "b") for v in [1, 2, 2, 7]]
    df = spark.createDataFrame(rows, "g string, s string, vu long")
    r = ks_two_sample(df, "g", "vu", F.col("s") == "a").collect()[0]
    assert r["d_num"] == 0 and r["ks_stat"] == 0.0
