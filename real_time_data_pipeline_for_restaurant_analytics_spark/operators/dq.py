"""Data-quality audit operators.

The reference's QA practice is manual probe SELECTs sprinkled through
the scripts (`02:50,83,262-264,347`, row counts at `03:164,285`, the
duplicate-key audit at `menu_proc.sql:310` — SURVEY §5). This module
is that practice systematized: declarative checks that run as plain
aggregates (one pass per table, map-side partials) and return
violation/profile rows instead of eyeballed result grids.

- column profile: null counts, distinct counts, min/max per column —
  one pass, no per-column jobs.
- referential orphans: left-anti FK→PK checks; at scale the anti-join
  broadcasts the parent key set when small, else shuffles on the key
  like any equi-join.
- uniqueness: delegated to operators/merge.duplicate_key_audit (A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass per-column profile: rows, nulls, distincts, min, max
    (stringly-typed min/max so heterogeneous columns stack)."""
    total = F.count(F.lit(1))
    pieces = []
    for c in cols:
        pieces.append(
            F.struct(
                F.lit(c).alias("col_name"),
                total.alias("n_rows"),
                F.count(F.when(F.col(c).isNull(), 1)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    agg = df.agg(F.array(*pieces).alias("p"))
    return agg.select(F.explode("p").alias("p")).select("p.*")


def referential_orphans(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose FK has no parent PK (nulls are not orphans)."""
    return child.filter(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti"
    )


@register(
    "q45_dq_referential",
    oracle="""
SELECT 'events.user_id->customer' AS relationship,
       (SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL) AS n_children,
       (SELECT COUNT(*) FROM events e WHERE e.user_id IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS n_orphans
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL),
       (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'orders.o_custkey->customer',
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL),
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
ORDER BY relationship
""",
    doc="Referential-integrity audit over the star schema: FK->PK orphan "
    "counts via anti-joins (the reference's probe-SELECT QA, systematized).",
)
def q45_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    rels = [
        ("events.user_id->customer", load(spark, sf_dir, "events"), "user_id",
         load(spark, sf_dir, "customer"), "c_custkey"),
        ("lineitem.l_orderkey->orders", load(spark, sf_dir, "lineitem"), "l_orderkey",
         load(spark, sf_dir, "orders"), "o_orderkey"),
        ("orders.o_custkey->customer", load(spark, sf_dir, "orders"), "o_custkey",
         load(spark, sf_dir, "customer"), "c_custkey"),
    ]
    out = None
    for name, child, fk, parent, pk in rels:
        kids = child.filter(F.col(fk).isNotNull()).select(fk)
        parents = (
            parent.select(F.col(pk).alias(fk)).distinct().withColumn("_has", F.lit(1))
        )
        # one pass: count children and missing parents together (the
        # 1x1 crossJoin alternative plans as a nested-loop join)
        row = (
            kids.join(parents, on=fk, how="left")
            .agg(
                F.count(F.lit(1)).alias("n_children"),
                F.count(F.when(F.col("_has").isNull(), 1)).alias("n_orphans"),
            )
            .select(F.lit(name).alias("relationship"), "n_children", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")


@register(
    "q46_dq_profile",
    oracle="""
SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
       COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_null,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
ORDER BY col_name
""",
    doc="One-pass column profile (nulls/distincts/min/max) — the probe-"
    "SELECT inspection habit as a single aggregate.",
)
def q46_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return column_profile(o, ["o_custkey", "o_orderpriority", "o_orderstatus"]).orderBy(
        "col_name"
    )


_N_BUCKETS = 10


def equidepth_histogram(df: DataFrame, val_col: str, n_buckets: int = _N_BUCKETS) -> DataFrame:
    """Equi-depth histogram WITHOUT a global sort: the ntile() shape
    funnels the whole relation through one reducer (the q44 round-1
    lesson), so instead (1) boundary quantiles come from the exact
    percentile aggregate — a mergeable map-side-combined state, one
    tiny shuffle; (2) the single boundary row broadcast-crosses back
    (the q48 scalar-combine pattern) and bucket assignment is a
    map-side comparison sum; (3) one vocabulary-sized groupBy(bucket).
    Depths are approximately equal (exact up to boundary ties and
    interpolation), which is what a profiling histogram needs."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    arr = ", ".join(f"{p}D" for p in probs)
    bnds = df.agg(F.expr(f"percentile({val_col}, array({arr}))").alias("bnds"))
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (F.col(val_col).cast("double") > F.col("bnds")[i]).cast("int")
    return (
        df.crossJoin(F.broadcast(bnds))
        .select(bucket.cast("bigint").alias("bucket"), F.col(val_col))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.min(val_col).cast("bigint").alias("min_val"),
            F.max(val_col).cast("bigint").alias("max_val"),
        )
        .orderBy("bucket")
    )


def _hist_oracle() -> str:
    probs = [i / _N_BUCKETS for i in range(1, _N_BUCKETS)]
    arr = ", ".join(str(p) for p in probs)
    terms = " + ".join(
        f"(CASE WHEN CAST(cents AS DOUBLE) > q[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(_N_BUCKETS - 1)
    )
    return f"""
WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents FROM orders),
b AS (SELECT quantile_cont(CAST(cents AS DOUBLE), [{arr}]) AS q FROM v)
SELECT CAST(1 + {terms} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(MIN(cents) AS BIGINT) AS min_val,
       CAST(MAX(cents) AS BIGINT) AS max_val
FROM v CROSS JOIN b
GROUP BY 1 ORDER BY bucket
"""


@register(
    "q82_equidepth_histogram",
    oracle=_hist_oracle(),
    doc="Equi-depth (decile) histogram of order value WITHOUT a global "
    "sort: mergeable exact-percentile boundaries + scalar broadcast-"
    "cross + map-side bucket assignment — the scale-safe replacement "
    "for ntile() profiling; per-bucket count/min/max in exact cents.",
)
def q82_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast("bigint").alias("cents")
    )
    return equidepth_histogram(o, "cents")
