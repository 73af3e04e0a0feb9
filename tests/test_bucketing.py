"""Bucketed co-located joins: the write-time shuffle must eliminate the
join-time exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE

from data_lakehouse_hygiene_spark import sinks
from data_lakehouse_hygiene_spark.schemas import load_table


def test_bucketed_join_has_no_exchange(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    sinks.write_bucketed(li, "bk_lineitem", "l_orderkey", 8)
    sinks.write_bucketed(orders, "bk_orders", "l_orderkey", 8)
    try:
        a = spark.table("bk_lineitem")
        b = spark.table("bk_orders")
        joined = a.join(b, "l_orderkey")
        # Disable auto-broadcast so the co-location (not a broadcast) is
        # what removes the shuffle; AQE off so the printed plan is final.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # And the result matches the plain (shuffled) join.
        plain = li.join(orders, "l_orderkey")
        assert joined.count() == plain.count()
        s = joined.agg(F.sum("l_quantity")).collect()[0][0]
        p = plain.agg(F.sum("l_quantity")).collect()[0][0]
        assert s == p
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")
        spark.sql("DROP TABLE IF EXISTS bk_orders")
