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


def test_files_per_partition_actually_controls_files_per_date(spark, tmp_path):
    """Review r8: repartition(k, date) set the TOTAL partition count
    (1 file per date ALWAYS, and k=1 funneled the whole write through
    one task). The salted write must yield up to files_per_partition
    files inside each date dir — and more than one for a date with
    enough rows."""
    import os

    from real_time_data_pipeline_for_restaurant_analytics_spark.sources.partitioned import (
        write_date_partitioned,
    )

    df = spark.range(0, 4000).selectExpr(
        "id AS event_id",
        "timestamp'2024-05-01 00:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0) AS ts",
    )
    path = str(tmp_path / "byday")
    write_date_partitioned(df, path, "ts", files_per_partition=3)
    per_date = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("event_date="):
            continue
        per_date[d] = len(
            [
                f
                for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
        )
    assert len(per_date) == 3, per_date
    assert all(1 <= n <= 3 for n in per_date.values()), per_date
    assert any(n > 1 for n in per_date.values()), (
        f"salting must spread a date over multiple files: {per_date}"
    )
    # round-trip: no rows lost, salt column not written
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert "_fsalt" not in back.columns
