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


def sketch_rollup_daily_monthly(events: DataFrame) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct users
    (Apache DataSketches via ``hll_sketch_agg``), merged with
    ``hll_union_agg`` into monthly estimates WITHOUT rescanning the
    fact — next to a direct monthly sketch for comparison.

    This is the incremental-distinct pattern a 100 TB warehouse runs:
    daily partials are tiny (KBs) and commutatively mergeable, so the
    monthly/quarterly rollup is a metadata-sized job instead of a
    fact-table rescan, and late days just re-merge. Union of per-day
    sketches over a partition of the data is mathematically the same
    sketch as one pass (same lgK), so merged == direct exactly —
    pinned in tests; registered rows-only (sketch internals are
    engine-specific, no DuckDB oracle).
    """
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    month = F.date_format("ts", "yyyy-MM").alias("month")
    daily = events.select(day, month, "user_id").groupBy("day", "month").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("merged_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    direct = events.select(month, "user_id").groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint").alias("direct_users")
    )
    return (
        merged.join(direct, "month")
        .select(
            "month",
            "n_days",
            "merged_users",
            "direct_users",
            (F.col("merged_users") == F.col("direct_users")).alias("merge_exact"),
        )
        .orderBy("month")
    )


@register(
    "q73_sketch_rollup",
    oracle=None,  # sketch bytes are DataSketches-specific; the contract
    # (merged-of-daily == direct monthly, estimates within HLL error of
    # exact) is pinned in tests/test_approx.py
    doc="Mergeable HLL sketch rollup: daily user sketches union-merged "
    "into monthly distinct estimates without rescanning the fact table "
    "— the incremental-distinct pattern; merged == direct is asserted "
    "in-row and test-pinned.",
)
def q73_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return sketch_rollup_daily_monthly(ev)
