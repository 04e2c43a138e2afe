"""Partition pruning must show up in the plan, not just the docs."""

from __future__ import annotations

from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
from real_time_data_pipeline_for_restaurant_analytics_spark.sources.partitioned import (
    read_day,
    write_date_partitioned,
)

from .conftest import SF_SMOKE


def test_date_partition_pruning(spark, tmp_path):
    events = load(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    out = str(tmp_path / "events_by_day")
    write_date_partitioned(events, out, "ts")

    all_days = spark.read.parquet(out)
    n_days = all_days.select("event_date").distinct().count()
    assert n_days > 1, "fixture must span multiple days for pruning to mean anything"

    day = str(all_days.selectExpr("min(event_date)").collect()[0][0])
    one = read_day(spark, out, day)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the day predicate must land in PartitionFilters (directory-level
    # pruning), NOT as a post-scan data filter
    assert "PartitionFilters" in plan and "event_date" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "event_date" in pf and day in pf, f"day predicate not pruned: {pf}"
    # and the data line up with a full-scan filter
    assert one.count() == all_days.filter(all_days.event_date == day).count()
