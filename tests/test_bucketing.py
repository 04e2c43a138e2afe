"""Bucketed co-located joins must be exchange-free — asserted on the
physical plan, since that's the entire point of the layout."""

from __future__ import annotations

import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
from real_time_data_pipeline_for_restaurant_analytics_spark.sources.bucketing import (
    cobucketed_join,
    write_bucketed,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_has_no_exchange(spark, no_broadcast):
    orders = load(spark, SF_SMOKE, "orders").selectExpr("o_orderkey", "o_totalprice")
    lineitem = load(spark, SF_SMOKE, "lineitem").selectExpr(
        "l_orderkey AS o_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "o_orderkey")
    try:
        joined = cobucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "co-bucketed join should not shuffle"
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
        # sanity: result matches the plain join
        expected = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
