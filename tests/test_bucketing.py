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


def test_bucketed_write_one_sorted_file_per_bucket(spark, tmp_path):
    """Review r8: without a pre-write repartition, every input
    partition emits a file per bucket (n_input x n_buckets slivers)
    and Spark only trusts per-bucket sortedness when a bucket holds
    exactly ONE file — the sortBy would be silently discarded and
    every downstream merge join would re-Sort. Pin the one-file-per-
    bucket layout on a deliberately many-partition input."""
    import os

    from real_time_data_pipeline_for_restaurant_analytics_spark.sources.bucketing import (
        write_bucketed,
    )

    df = spark.range(0, 2000).selectExpr("id AS k", "id % 7 AS v").repartition(16)
    write_bucketed(df, "bw_onefile", "k", n_buckets=4)
    try:
        files = [
            f
            for f in os.listdir(os.path.join("spark-warehouse", "bw_onefile"))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        assert len(files) == 4, (
            f"expected exactly one file per bucket, got {len(files)}: "
            "multi-file buckets void the sortedness guarantee"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bw_onefile")
