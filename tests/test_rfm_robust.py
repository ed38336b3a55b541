"""Unit tests for operators/rfm.py and operators/robust.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.rfm import _ntile_from_rank, rfm_scores
from hse_etl_ochirov_aldar_spark.operators.robust import _group_median2, mad_outliers


def test_ntile_formula_matches_sql_ntile(spark):
    # n = 7, k = 5 -> bucket sizes 2,2,1,1,1 (ANSI: first n%k buckets
    # get one extra row). Compare the formula against Spark's own NTILE.
    n, k = 7, 5
    df = spark.range(1, n + 1).select(
        F.col("id").cast("long").alias("rank"), F.lit(n).cast("long").alias("n")
    )
    got = {
        r["rank"]: r["b"]
        for r in df.withColumn("b", _ntile_from_rank("rank", "n", k)).collect()
    }
    from pyspark.sql import Window

    ref = {
        r["rank"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy("rank"))
        ).collect()
    }
    assert got == ref == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 4, 7: 5}


def test_ntile_formula_small_n(spark):
    # n < k: every row its own bucket, no division-by-zero.
    df = spark.range(1, 4).select(
        F.col("id").cast("long").alias("rank"), F.lit(3).cast("long").alias("n")
    )
    got = sorted(
        r["b"] for r in df.withColumn("b", _ntile_from_rank("rank", "n", 5)).collect()
    )
    assert got == [1, 2, 3]


def test_rfm_scores_toy(spark):
    # 5 customers with strictly ordered metrics -> each quintile hit once.
    day0 = dt.datetime(2024, 1, 1)
    rows = []
    for c in range(5):
        # customer c: last order day0+c days, c+1 orders of 100*(c+1) each
        for i in range(c + 1):
            rows.append((c, day0 + dt.timedelta(days=c), 100.0 * (c + 1)))
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp, o_totalprice double")
    out = {r["o_custkey"]: r.asDict() for r in rfm_scores(df).collect()}
    # customer 4: most recent, most frequent, highest spend -> 5/5/5 champion
    assert out[4]["r_score"] == out[4]["f_score"] == out[4]["m_score"] == 5
    assert out[4]["segment"] == "champion"
    # customer 0: oldest, least frequent, least spend -> 1/1/1 hibernating
    assert out[0]["r_score"] == out[0]["f_score"] == out[0]["m_score"] == 1
    assert out[0]["segment"] == "hibernating"
    assert out[2]["recency_days"] == 2 and out[2]["frequency"] == 3
    assert out[3]["monetary"] == 1600.0


def test_group_median2_odd_even(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 100), ("b", 2), ("b", 4), ("b", 6), ("b", 8)],
        "g string, v long",
    )
    out = {r["g"]: (r["med2"], r["n_rows"]) for r in _group_median2(df, "g", "v", "med2").collect()}
    assert out["a"] == (6, 3)  # median 3 -> med2 = 6
    assert out["b"] == (10, 4)  # median (4+6)/2 = 5 -> med2 = 10


def test_mad_outliers_plants_and_degenerates(spark):
    # group 'x': values 10.0 +/- small noise and one huge outlier.
    rows = [("x", i, float(v)) for i, v in enumerate([9.9, 10.0, 10.1, 10.0, 9.8, 10.2, 500.0])]
    # group 'z': constant values -> MAD = 0 -> no rows emitted.
    rows += [("z", 100 + i, 5.0) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, id long, value double")
    out = mad_outliers(df, group_col="g", value_col="value").collect()
    assert [r["id"] for r in out] == [6]
    assert out[0]["robust_z"] > 1000  # (500-10)/(1.4826*0.15) ~ 2200
    assert all(r["g"] == "x" for r in out)


def test_gini_coefficient_known_values(spark):
    from hse_etl_ochirov_aldar_spark.operators.profile import gini_coefficient

    rows = (
        [("eq", 5), ("eq", 5), ("eq", 5)]          # perfect equality -> 0
        + [("conc", 0), ("conc", 0), ("conc", 10)]  # one holder -> 2/3
        + [("zero", 0), ("zero", 0)]                # total 0 -> filtered out
    )
    df = spark.createDataFrame(rows, "g string, u long")
    out = {r["g"]: r["gini"] for r in gini_coefficient(df, "g", "u").collect()}
    assert out["eq"] == 0.0
    assert abs(out["conc"] - 2 / 3) < 1e-6
    assert "zero" not in out


def test_global_cumsum_matches_single_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hse_etl_ochirov_aldar_spark.operators.rank import global_cumsum

    rng = random.Random(7)
    rows = [(i, rng.randint(-50, 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        r["k"]: r["cs"]
        for r in global_cumsum(df, ["k"], "v", "cs").collect()
    }
    ref = {
        r["k"]: r["cs"]
        for r in df.withColumn(
            "cs",
            F.sum("v").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == ref
