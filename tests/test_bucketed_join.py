"""Bucketed co-located join: the layout-level shuffle elimination
(sinks.write_bucketed). Asserts on the PHYSICAL PLAN, not just the
result: a join of two tables bucketed on the join key with equal
bucket counts must contain no shuffle exchange."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.sources.readers import load_table
from hse_etl_ochirov_aldar_spark.sources.sinks import write_bucketed


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="spark_bucketed_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmpdir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    try:
        write_bucketed(orders, "b_orders", f"{tmpdir}/o", ["o_orderkey"], 8)
        write_bucketed(lineitem, "b_lineitem", f"{tmpdir}/l", ["l_orderkey"], 8)

        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan

        # and the result matches the plain (shuffled) join
        expected = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_agg_avoids_shuffle(spark, sf_dir, tmpdir):
    """groupBy on the bucket key also rides the bucketed layout (no
    exchange before the final aggregate)."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    try:
        write_bucketed(lineitem, "b_li_agg", f"{tmpdir}/la", ["l_orderkey"], 8)
        agg = (
            spark.table("b_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert agg.count() == lineitem.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")
