"""Quality gates: explicit actions and observe()-based zero-job gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.plans.quality import (
    QualityError,
    expect_check,
    expect_nonempty,
    expect_unique_key,
    observed_checks,
)


def test_expect_nonempty_pass_and_fail(spark):
    df = spark.range(3)
    assert expect_nonempty(df) is df
    with pytest.raises(QualityError):
        expect_nonempty(df.where(F.col("id") < 0))


def test_expect_check(spark):
    df = spark.createDataFrame([(1,), (5,)], ["rating"])
    expect_check(df, F.col("rating").between(1, 5), "rating_domain")
    bad = spark.createDataFrame([(1,), (9,)], ["rating"])
    with pytest.raises(QualityError, match="rating_domain"):
        expect_check(bad, F.col("rating").between(1, 5), "rating_domain")


def test_expect_unique_key(spark):
    ok = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    expect_unique_key(ok, ["k"])
    dup = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    with pytest.raises(QualityError):
        expect_unique_key(dup, ["k"])


def test_observed_checks_single_job(spark):
    df = spark.createDataFrame([(1,), (3,), (9,)], ["rating"])
    observed, validate = observed_checks(
        df,
        {
            "rating_violations": F.count(
                F.when(~F.col("rating").between(1, 5), 1)
            )
        },
    )
    observed.collect()  # the ONE action; metrics ride along
    with pytest.raises(QualityError, match="rating_violations"):
        validate()

    ok_df = spark.createDataFrame([(1,), (3,)], ["rating"])
    observed2, validate2 = observed_checks(
        ok_df,
        {
            "rating_violations": F.count(
                F.when(~F.col("rating").between(1, 5), 1)
            )
        },
        name="observed_ok",
    )
    observed2.collect()
    assert validate2() == {"rating_violations": 0}


def test_profile_table_counts_nulls_and_distincts(spark):
    from hse_etl_ochirov_aldar_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], ["k", "s"]
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_nulls == 1
    assert prof["k"].n_distinct == 2  # NULL not counted as distinct value
    assert (prof["k"].min_value, prof["k"].max_value) == ("1", "2")
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no columns"):
        profile_table(df, columns=[])


def test_profile_table_approx_tracks_exact(spark, sf_dir):
    from hse_etl_ochirov_aldar_spark.operators.profile import profile_table
    from hse_etl_ochirov_aldar_spark.sources.readers import load_table

    ords = load_table(spark, sf_dir, "orders")
    exact = {r.col_name: r.n_distinct for r in profile_table(ords).collect()}
    approx = {
        r.col_name: r.n_distinct
        for r in profile_table(ords, approx=True).collect()
    }
    for c, e in exact.items():
        assert abs(approx[c] - e) <= max(2, 0.05 * e), (c, approx[c], e)


def test_skew_report_ranks_hot_key_first(spark):
    from hse_etl_ochirov_aldar_spark.operators.profile import skew_report

    rows = [(0,)] * 50 + [(1,)] * 30 + [(2,)] * 20 + [(None,)] * 5
    df = spark.createDataFrame(rows, "k INT")
    rep = skew_report(df, "k", top_n=3).collect()
    assert [r.key_value for r in rep] == ["0", "1", "2"]
    assert rep[0].share_bp == 50 * 10000 // 105
    assert [r.rank for r in rep] == [1, 2, 3]


def test_value_histogram_shape_and_clamping(spark):
    from hse_etl_ochirov_aldar_spark.operators.profile import value_histogram

    df = spark.createDataFrame(
        [(x,) for x in [-5.0, 0.0, 4.9, 5.0, 9.9, 10.0, 25.0, None]],
        "v DOUBLE",
    )
    h = value_histogram(df, "v", buckets=2, lo=0.0, hi=10.0).collect()
    assert [r.bucket for r in h] == [0, 1]
    # bucket 0: -5 (clamped), 0.0, 4.9; bucket 1: 5.0, 9.9, and the
    # clamped 10.0 + 25.0; the NULL is excluded
    assert [r.n_rows for r in h] == [3, 4]
    assert (h[0].bucket_lo, h[0].bucket_hi) == (0.0, 5.0)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        value_histogram(df, "v", buckets=0)


def test_correlation_matrix_known_values(spark):
    from hse_etl_ochirov_aldar_spark.operators.profile import (
        correlation_matrix,
    )

    rows = [(float(i), 2.0 * i + 1, float(-i), float(i % 2)) for i in range(20)]
    df = spark.createDataFrame(rows, ["a", "b", "c", "d"])
    out = {(r.col_x, r.col_y): r.corr
           for r in correlation_matrix(df, ["a", "b", "c"], scales=2).collect()}
    assert out[("a", "b")] == 1.0      # perfectly linear
    assert out[("a", "c")] == -1.0     # perfectly anti-linear
    assert out[("b", "c")] == -1.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least two"):
        correlation_matrix(df, ["a"])
    with _pytest.raises(ValueError, match="scales must match"):
        correlation_matrix(df, ["a", "b"], scales=[2])


def test_fk_gate_raises_on_orphans_and_ignores_nulls(spark):
    from hse_etl_ochirov_aldar_spark.plans.quality import (
        QualityError,
        expect_referential_integrity,
        fk_orphans,
    )

    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], ["id", "fk"]
    )
    orphans = fk_orphans(child, parent, "fk", "pk").collect()
    assert [r.id for r in orphans] == [12]  # NULL fk is not an orphan

    import pytest as _pytest

    with _pytest.raises(QualityError, match="1 orphaned"):
        expect_referential_integrity(child, parent, "fk", "pk")

    clean = child.where(F.col("id") != 12)
    assert expect_referential_integrity(clean, parent, "fk", "pk") is clean


def test_global_rank_matches_single_partition_window(spark):
    from pyspark.sql import Window

    from hse_etl_ochirov_aldar_spark.operators.rank import global_rank

    df = spark.range(5000).selectExpr(
        "id", "CAST(pmod(id * 2654435761, 997) AS LONG) AS v"
    ).repartition(16)
    got = {
        r.id: r.global_rank
        for r in global_rank(df, ["v", "id"]).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r.id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want
    spark.catalog.clearCache()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        global_rank(df, [])
