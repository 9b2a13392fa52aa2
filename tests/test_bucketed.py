"""Bucketed co-located join: the join plan must contain NO Exchange —
the property that makes repeated large-fact joins viable at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from rusty_timeseries_db_spark.plans.explain import formatted_plan
from rusty_timeseries_db_spark.queries import T
from rusty_timeseries_db_spark.sources.bucketed import read_table, write_bucketed
from tests.conftest import SF_DIR


def test_bucketed_join_no_exchange(spark, tmp_path):
    orders = T(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = T(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], n_buckets=8,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=8,
        path=str(tmp_path / "b_lineitem"),
    )
    try:
        # hint merge: the tiny test tables would otherwise broadcast,
        # which proves nothing about bucketing — at real scale SMJ is
        # what the planner picks, and bucketing removes its shuffles.
        joined = read_table(spark, "b_orders").hint("merge").join(
            read_table(spark, "b_lineitem"), "o_orderkey"
        )
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        # result still correct
        expected = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_agg_no_exchange(spark, tmp_path):
    """Aggregation on the bucket key also skips the shuffle."""
    orders = T(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(
        orders, "b_orders_cust", ["o_custkey"], n_buckets=8,
        path=str(tmp_path / "b_orders_cust"),
    )
    try:
        agg = (
            read_table(spark, "b_orders_cust")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )
        assert "Exchange" not in formatted_plan(agg)
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_cust")
