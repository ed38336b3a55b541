"""Property-based tests for the census order-statistic machinery
(robust medians, KS, Gini, distributed NTILE/prefix sums) vs plain
Python references. One Spark job per example batch."""

from __future__ import annotations

import statistics

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.drift import ks_two_sample
from hse_etl_ochirov_aldar_spark.operators.profile import gini_coefficient
from hse_etl_ochirov_aldar_spark.operators.rfm import _ntile_from_rank
from hse_etl_ochirov_aldar_spark.operators.robust import _group_median2

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=60))
def test_group_median2_is_twice_python_median(spark, vals):
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    out = _group_median2(df, "g", "v", "med2").collect()[0]
    assert out["med2"] == round(2 * statistics.median(vals))
    assert out["n_rows"] == len(vals)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=40),
    st.lists(st.integers(0, 30), min_size=1, max_size=40),
)
def test_ks_two_sample_matches_python_ecdf(spark, xs, ys):
    rows = [("g", "a", v) for v in xs] + [("g", "b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, s string, v long")
    r = ks_two_sample(df, "g", "v", F.col("s") == "a").collect()[0]
    na, nb = len(xs), len(ys)
    support = sorted(set(xs) | set(ys))
    best = max(
        abs(sum(1 for x in xs if x <= t) * nb - sum(1 for y in ys if y <= t) * na)
        for t in support
    )
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["d_num"] == best


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 1_000), min_size=1, max_size=50))
def test_gini_matches_python_reference(spark, vals):
    if sum(vals) == 0:
        return
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = gini_coefficient(df, "g", "v").collect()[0]
    xs = sorted(vals)
    n, t = len(xs), sum(xs)
    s = sum((i + 1) * x for i, x in enumerate(xs))
    ref = (2 * s - (n + 1) * t) / (n * t)
    assert abs(r["gini"] - round(ref, 6)) <= 1e-9
    assert r["n"] == n and r["total_units"] == t


@settings(**_SETTINGS)
@given(st.integers(1, 200), st.integers(1, 12))
def test_ntile_formula_matches_spec(spark, n, k):
    # ANSI NTILE: first n%k buckets hold n//k + 1 rows, the rest n//k.
    df = spark.range(1, n + 1).select(
        F.col("id").cast("long").alias("rank"), F.lit(n).cast("long").alias("n")
    )
    got = [
        r["b"]
        for r in df.withColumn("b", _ntile_from_rank("rank", "n", k))
        .orderBy("rank")
        .collect()
    ]
    q, rem = divmod(n, k)
    ref = []
    for b in range(1, k + 1):
        ref.extend([b] * (q + 1 if b <= rem else q))
    assert got == ref[:n]
