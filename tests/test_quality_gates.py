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
