"""Approximate aggregates — the sketch path for the KPI family.

The reference computes exact COUNT(DISTINCT)/percentile-free KPIs
(fine at its scale); at 100 TB the distinct-count and quantile KPIs
move to sketches: HyperLogLog++ (`approx_count_distinct`) and
Greenwald-Khanna (`approx_percentile`) are both one-pass,
partial-aggregable (map-side combine, no second shuffle), and
mergeable across partitions — exactly what a 1000-executor rollup
needs. Exactness contracts live in tests (relative-error bounds vs
the exact kernels) rather than DuckDB oracles, since sketch values
are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def approx_user_stats(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Per event_type: HLL++ distinct users + GK value quantiles."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("value_q"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("value_q")[0].alias("value_p50"),
            F.col("value_q")[1].alias("value_p95"),
            F.col("value_q")[2].alias("value_p99"),
            "n_events",
        )
        .orderBy("event_type")
    )


@register(
    "q35_approx_user_stats",
    oracle=None,  # sketch outputs are engine-specific; error bounds
    # vs the exact kernels are pinned in tests/test_approx.py
    doc="HLL++ distinct users + approx quantiles per event_type — the "
    "one-pass mergeable-sketch path the exact KPIs switch to at 100TB.",
)
def q35_approx_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_user_stats(load(spark, sf_dir, "events"))
