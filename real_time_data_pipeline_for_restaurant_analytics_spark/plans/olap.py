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
    "q75_cube_segment_year",
    oracle="""
SELECT COALESCE(c.c_mktsegment, 'ALL') AS segment,
       COALESCE(CAST(EXTRACT(year FROM o.o_orderdate) AS VARCHAR), 'ALL') AS order_year,
       CAST(GROUPING(c.c_mktsegment) * 2
            + GROUPING(EXTRACT(year FROM o.o_orderdate)) AS BIGINT) AS gid,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY CUBE(c.c_mktsegment, EXTRACT(year FROM o.o_orderdate))
ORDER BY gid, segment, order_year
""",
    doc="CUBE over (segment, year): all four aggregation granularities "
    "— (seg,yr), per-segment, per-year, grand total — in ONE shuffle "
    "instead of four dashboard queries. Complements q40's ROLLUP "
    "(hierarchical prefixes) with the full cross-combination lattice; "
    "money travels as exact integer cents (hash-stable).",
)
def q75_cube_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast(MONEY).alias("price"),
    )
    return (
        joined.cube("seg", "yr")
        .agg(
            F.grouping_id().alias("gid"),
            (F.sum("price") * 100).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("seg", F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("order_year"),
            F.col("gid").cast("bigint").alias("gid"),
            "revenue_cents",
            "n_orders",
        )
        .orderBy("gid", "segment", "order_year")
    )


@register(
    "q76_group_percentiles",
    oracle="""
WITH q AS (
  SELECT c.c_mktsegment AS segment,
         quantile_cont(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100,
                       [0.25, 0.5, 0.75, 0.9]) AS qs,
         COUNT(*) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT segment,
       CAST(FLOOR(CAST(qs[1] AS DOUBLE) * 10 + 0.5) AS BIGINT) AS p25_decicents,
       CAST(FLOOR(CAST(qs[2] AS DOUBLE) * 10 + 0.5) AS BIGINT) AS p50_decicents,
       CAST(FLOOR(CAST(qs[3] AS DOUBLE) * 10 + 0.5) AS BIGINT) AS p75_decicents,
       CAST(FLOOR(CAST(qs[4] AS DOUBLE) * 10 + 0.5) AS BIGINT) AS p90_decicents,
       n_orders
FROM q ORDER BY segment
""",
    doc="Exact per-segment order-value percentiles (p25/p50/p75/p90, "
    "linear interpolation over integer cents — both engines run the "
    "identical IEEE arithmetic on exact ints, so deci-cent outputs are "
    "hash-stable). Spark's exact percentile is a mergeable partial "
    "aggregate whose state is a value→count map, so memory scales with "
    "DISTINCT values per group (bounded for money), not rows; the "
    "unbounded-cardinality fallback is the GK sketch path (q35).",
)
def q76_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_totalprice").cast(MONEY) * 100).cast("bigint").alias("cents"),
    )
    qs = F.expr("percentile(cents, array(0.25D, 0.5D, 0.75D, 0.9D))")
    agg = joined.groupBy("segment").agg(qs.alias("qs"), F.count(F.lit(1)).alias("n_orders"))
    return agg.select(
        "segment",
        *[
            F.floor(F.col("qs")[i] * 10 + F.lit(0.5)).cast("bigint").alias(name)
            for i, name in enumerate(
                ["p25_decicents", "p50_decicents", "p75_decicents", "p90_decicents"]
            )
        ],
        "n_orders",
    ).orderBy("segment")


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


@register(
    "q91_grouping_sets",
    oracle="""
SELECT COALESCE(c.c_mktsegment, 'ALL') AS segment,
       COALESCE(CAST(EXTRACT(year FROM o.o_orderdate) AS VARCHAR), 'ALL') AS order_year,
       COALESCE(o.o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(c.c_mktsegment) * 4
            + GROUPING(EXTRACT(year FROM o.o_orderdate)) * 2
            + GROUPING(o.o_orderpriority) AS BIGINT) AS gid,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((c.c_mktsegment, EXTRACT(year FROM o.o_orderdate)),
                        (o.o_orderpriority), ())
ORDER BY gid, segment, order_year, priority
""",
    doc="Custom GROUPING SETS — (segment,year), (priority), grand "
    "total — the dashboard set CUBE (q75) and ROLLUP (q40) can't "
    "express without computing unwanted combinations. One expand+"
    "shuffle pass instead of three queries; exact integer cents.",
)
def q91_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set lattice in one pass.

    Spark's EXPAND physical operator replicates each input row once
    per grouping set BEFORE the shuffle, and partial aggregation
    applies per set — so the cost is sets×scan map-side and the
    shuffle carries only partial states, same as q75's CUBE. Reference
    analog: the consumption-layer KPI dashboards recompute each
    granularity as its own query (SURVEY §3.3); this is the fused
    form.
    """
    from pyspark.sql.functions import broadcast

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast(MONEY).alias("price"),
    )
    return (
        joined.groupingSets([["seg", "yr"], ["prio"], []], "seg", "yr", "prio")
        .agg(
            F.grouping_id().alias("gid"),
            (F.sum("price") * 100).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("seg", F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("order_year"),
            F.coalesce("prio", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("bigint").alias("gid"),
            "revenue_cents",
            "n_orders",
        )
        .orderBy("gid", "segment", "order_year", "priority")
    )
