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


_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_bucket(row_j: int, key: "F.Column") -> "F.Column":
    """Bucket of ``key`` in CMS hash row ``row_j``: md5 of the salted
    key, first 8 hex chars folded to an int, mod width — reproducible
    in any engine (the q09 surrogate-key trick)."""
    salted = F.concat(F.lit(f"{row_j}:"), key.cast("string"))
    return (F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % _CMS_WIDTH).alias(
        f"b{row_j}"
    )


def cms_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies, from scratch: a
    depth×width grid of counters, each row counting under an
    independent hash. Returned as (row_j, bucket, cnt) cells.

    Scale shape: the explode multiplies rows by depth (4) BEFORE the
    groupBy, but map-side partial aggregation collapses every task to
    ≤ depth×width (1024) cells pre-shuffle, so the exchange moves
    O(tasks × 1024) rows regardless of corpus size — the sketch is
    mergeable by cell-wise SUM, which is exactly what the partial agg
    does. Point estimates read MIN over the depth rows (each row only
    overestimates, by collisions), the classic CM guarantee."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("row_j"), _cms_bucket(j, key).alias("bucket"))
            for j in range(_CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row_j").alias("row_j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_heavy_hitters(events: DataFrame, top_n: int = 10) -> DataFrame:
    """Heavy hitters with their CMS point estimates next to exact
    counts. The candidate set (exact top-N users) is tiny, so its
    4 probe cells join the 1024-cell sketch by broadcast; the only
    corpus-sized work is two groupBys over user_id — everything after
    is KB-scale."""
    sketch = cms_sketch(events, "user_id")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    cand = exact.orderBy(F.desc("exact_n"), "user_id").limit(top_n)
    probes = cand.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_j"), _cms_bucket(j, F.col("user_id")).alias("bucket")
                    )
                    for j in range(_CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_n", F.col("p.row_j").alias("row_j"), F.col("p.bucket").alias("bucket"))
    est = (
        F.broadcast(probes)
        .join(sketch, ["row_j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        F.col("exact_n").cast("bigint").alias("exact_n"),
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        (F.col("cms_estimate") >= F.col("exact_n")).alias("never_underestimates"),
    ).orderBy(F.desc("exact_n"), "user_id")


@register(
    "q77_cms_heavy_hitters",
    oracle=f"""
WITH rows_j AS (SELECT unnest(range({_CMS_DEPTH})) AS row_j),
cells AS (
  SELECT r.row_j,
         CAST(('0x' || substr(md5(CAST(r.row_j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)),
               1, 8)) AS BIGINT) % {_CMS_WIDTH} AS bucket,
         COUNT(*) AS cnt
  FROM events e CROSS JOIN rows_j r
  GROUP BY 1, 2
),
exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1),
cand AS (SELECT * FROM exact ORDER BY exact_n DESC, user_id LIMIT 10),
probes AS (
  SELECT c.user_id, c.exact_n, r.row_j,
         CAST(('0x' || substr(md5(CAST(r.row_j AS VARCHAR) || ':' || CAST(c.user_id AS VARCHAR)),
               1, 8)) AS BIGINT) % {_CMS_WIDTH} AS bucket
  FROM cand c CROSS JOIN rows_j r
)
SELECT p.user_id, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(MIN(s.cnt) AS BIGINT) AS cms_estimate,
       MIN(s.cnt) >= p.exact_n AS never_underestimates
FROM probes p JOIN cells s ON p.row_j = s.row_j AND p.bucket = s.bucket
GROUP BY p.user_id, p.exact_n
ORDER BY exact_n DESC, user_id
""",
    doc="From-scratch count-min sketch (4×256 md5-hashed counter grid, "
    "cell-wise-SUM mergeable, map-side-collapsed before the shuffle) "
    "with point estimates for the exact top-10 users — estimate ≥ "
    "exact (the CM overestimate-only guarantee) asserted in-row. The "
    "streaming/distributed heavy-hitter path when exact per-key "
    "counting stops fitting.",
)
def q77_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_estimate_heavy_hitters(load(spark, sf_dir, "events"))


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
