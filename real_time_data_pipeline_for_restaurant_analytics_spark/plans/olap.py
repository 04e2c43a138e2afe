"""OLAP shapes beyond the reference's flat GROUP BYs: rollup
hierarchies and pivoted distributions.

The reference's KPI dashboard recomputes each rollup level as its own
query (revenue total / per state / per restaurant, README KPIs 1, 18,
19); `ROLLUP` produces the whole hierarchy in ONE pass — at scale
that's one shuffle instead of N. Pivot is the payment-method
distribution (KPI 14) turned columnar. Both stay fully
oracle-checkable: grouping flags via GROUPING(), pivots mirrored as
conditional aggregates in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

MONEY = "decimal(14,2)"


@register(
    "q40_rollup_revenue",
    oracle="""
SELECT COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'ALL') AS order_year,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(EXTRACT(year FROM o_orderdate)) * 2
            + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(22,2)) AS VARCHAR) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP(EXTRACT(year FROM o_orderdate), o_orderpriority)
ORDER BY gid, order_year, priority
""",
    doc="Rollup hierarchy (year → priority → grand total) in one pass — "
    "one shuffle for all KPI levels instead of one query per level.",
)
def q40_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast(MONEY).alias("price"),
    )
    return (
        o.rollup("yr", "prio")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("price").cast("decimal(22,2)").cast("string").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("order_year"),
            F.coalesce("prio", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("bigint").alias("gid"),
            "revenue",
            "n_orders",
        )
        .orderBy("gid", "order_year", "priority")
    )


EVENT_TYPES = ["click", "purchase", "refund", "view"]


@register(
    "q41_pivot_event_values",
    oracle=f"""
SELECT user_id,
       {", ".join(
           f"CAST(CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' "
           f"THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DECIMAL(24,6)) AS VARCHAR) AS {t}_value"
           for t in EVENT_TYPES)}
FROM events GROUP BY user_id ORDER BY user_id
""",
    doc="Pivoted per-user value sums by event type (KPI-14 distribution "
    "shape, columnar) — fixed pivot values so one pass, no discovery scan.",
)
def q41_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    # explicit pivot values: skips Spark's extra distinct-discovery job
    # AND keeps the output schema stable at any scale
    pivoted = (
        e.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(F.sum("value"))
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t).cast("decimal(24,6)"), F.lit(0).cast("decimal(24,6)"))
            .cast("string")
            .alias(f"{t}_value")
            for t in EVENT_TYPES
        ],
    ).orderBy("user_id")


@register(
    "q51_set_operations",
    oracle="""
WITH purchasers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
     clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
     viewers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
SELECT 'click_and_purchase' AS cohort, user_id
FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM purchasers)
UNION ALL
SELECT 'view_never_purchase', user_id
FROM (SELECT user_id FROM viewers EXCEPT SELECT user_id FROM purchasers)
ORDER BY cohort, user_id
""",
    doc="Set operations (INTERSECT / EXCEPT) for behavioral cohorts — "
    "compile to semi/anti joins over deduped key sets, one shuffle each.",
)
def q51_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def users_of(t: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select("user_id").distinct()

    both = users_of("click").intersect(users_of("purchase")).select(
        F.lit("click_and_purchase").alias("cohort"), "user_id"
    )
    lost = users_of("view").exceptAll(users_of("purchase")).select(
        F.lit("view_never_purchase").alias("cohort"), "user_id"
    )
    return both.unionByName(lost).orderBy("cohort", "user_id")


@register(
    "q52_moving_average",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       revenue_cents,
       CAST(FLOOR(SUM(revenue_cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            * 10000.0
            / COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS BIGINT) AS ma7_micro,
       CAST(SUM(revenue_cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
FROM daily ORDER BY day
""",
    doc="Daily revenue with 7-day moving average and running total — "
    "bounded window frames over the pre-aggregated day series (window "
    "input is days, not raw rows, so the sort is tiny at any scale). "
    "Money travels as exact integer cents; the moving average is "
    "floor(sum*1e4/n) micro-dollars so both engines do the identical "
    "IEEE division on exact integers (hash-stable, round-1 lesson).",
)
def q52_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast(MONEY)) * 100).cast("bigint").alias("revenue_cents")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "revenue_cents",
        F.floor(
            F.sum("revenue_cents").over(w7) * F.lit(10000.0) / F.count(F.lit(1)).over(w7)
        )
        .cast("bigint")
        .alias("ma7_micro"),
        F.sum("revenue_cents").over(wcum).cast("bigint").alias("cum_revenue_cents"),
    ).orderBy("day")
