"""Snapshot-diff change-data-capture: classify every key across two
snapshots of an aggregate state as insert / delete / update /
unchanged.

This is the batch complement of the reference's stream-driven MERGE
surface (SURVEY §2.5; streams + 3-branch MERGE,
`02 Location Entity.sql:29-32`, `order_proc.sql:195-303`): when no
change feed exists, the only way to derive one is to diff two full
snapshots. The diff is ONE full-outer shuffle join on the key with
null-safe value comparison — the same join shape MERGE itself costs —
so at 100 TB it scales exactly like the merge it feeds, and both
snapshot aggregates are map-side partial before the join.

All compared values are integer (counts, cents), so the
changed/unchanged verdict is engine-exact, and absent sides are
COALESCEd to -1 sentinels to keep the output frame nullable-free
(pandas would otherwise coerce nullable int columns to float64 and
break hash stability).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _cents(col: str) -> Column:
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Full-outer diff of two keyed states. Emits one row per key in
    either snapshot with ``change_type`` ∈ {insert, delete, update,
    unchanged}; value columns come out as ``old_<c>`` / ``new_<c>``
    with -1 for the absent side — callers' value columns must be
    nonnegative or the sentinel is ambiguous (fine for the counts and
    cents used here). An empty ``value_cols`` degrades cleanly to a
    pure existence diff (insert/delete/unchanged). Single shuffle on
    the key."""
    o = old.select(
        *[F.col(k) for k in key],
        F.lit(True).alias("_in_old"),
        *[F.col(c).cast("bigint").alias(f"old_{c}") for c in value_cols],
    )
    n = new.select(
        *[F.col(k) for k in key],
        F.lit(True).alias("_in_new"),
        *[F.col(c).cast("bigint").alias(f"new_{c}") for c in value_cols],
    )
    j = o.join(n, on=key, how="full_outer")
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    changed = F.lit(False)  # empty value_cols = pure existence diff
    for c in value_cols:
        # NULL-SAFE inequality (review r8): the docstring promises
        # null-safe value comparison, but `!=` evaluates NULL vs value
        # to NULL → 'unchanged' with contradictory old/new columns
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    return j.select(
        *[F.col(k) for k in key],
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        *[
            col
            for c in value_cols
            for col in (
                F.coalesce(F.col(f"old_{c}"), F.lit(-1)).cast("bigint").alias(f"old_{c}"),
                F.coalesce(F.col(f"new_{c}"), F.lit(-1)).cast("bigint").alias(f"new_{c}"),
            )
        ],
    )


# Two one-year order windows, offset by a year: customers active only
# in the first read as deletes, only in the second as inserts.
_OLD_LO, _OLD_HI = "1995-01-01", "1997-01-01"
_NEW_LO, _NEW_HI = "1996-01-01", "1998-01-01"

_CDC_ORACLE = f"""
WITH old AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders
  WHERE o_orderdate >= '{_OLD_LO}' AND o_orderdate < '{_OLD_HI}'
  GROUP BY o_custkey
), new AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders
  WHERE o_orderdate >= '{_NEW_LO}' AND o_orderdate < '{_NEW_HI}'
  GROUP BY o_custkey
)
SELECT COALESCE(o.o_custkey, n.o_custkey) AS o_custkey,
       CASE WHEN o.o_custkey IS NULL THEN 'insert'
            WHEN n.o_custkey IS NULL THEN 'delete'
            WHEN o.n_orders <> n.n_orders OR o.revenue_cents <> n.revenue_cents
              THEN 'update'
            ELSE 'unchanged' END AS change_type,
       COALESCE(o.n_orders, -1) AS old_n_orders,
       COALESCE(n.n_orders, -1) AS new_n_orders,
       COALESCE(o.revenue_cents, -1) AS old_revenue_cents,
       COALESCE(n.revenue_cents, -1) AS new_revenue_cents
FROM old o FULL OUTER JOIN new n ON o.o_custkey = n.o_custkey
ORDER BY o_custkey
"""


@register(
    "q90_snapshot_diff_cdc",
    oracle=_CDC_ORACLE,
    doc="Snapshot-diff CDC: per-customer order state over two "
    "offset one-year windows, full-outer diffed into "
    "insert/delete/update/unchanged — the derived change feed when no "
    "stream exists; one shuffle, integer-exact comparisons.",
)
def q90_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both snapshots come from the SAME table over overlapping windows,
    # so the full-outer diff folds into ONE scan + ONE shuffle
    # (round 14, guide §2.2/§3.5): per row, membership in each window
    # is a flag, the per-window (count, cents-sum) are conditional
    # aggregates, and "key absent from a snapshot" is exactly
    # n_orders = 0 (every present key has >= 1 order). Results are
    # row-identical to snapshot_diff(snap(old), snap(new)) — that
    # generic two-frame operator remains for genuinely separate
    # snapshots (tests pin it); this query's windows share a scan.
    orders = load(spark, sf_dir, "orders")
    in_old = (F.col("o_orderdate") >= F.lit(_OLD_LO)) & (
        F.col("o_orderdate") < F.lit(_OLD_HI)
    )
    in_new = (F.col("o_orderdate") >= F.lit(_NEW_LO)) & (
        F.col("o_orderdate") < F.lit(_NEW_HI)
    )
    cents = _cents("o_totalprice")
    zero = F.lit(0).cast("bigint")
    agg = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(_OLD_LO))
            & (F.col("o_orderdate") < F.lit(_NEW_HI))
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(in_old, 1).otherwise(0)).cast("bigint").alias("old_n"),
            F.coalesce(F.sum(F.when(in_old, cents)), zero)
            .cast("bigint")
            .alias("old_c"),
            F.sum(F.when(in_new, 1).otherwise(0)).cast("bigint").alias("new_n"),
            F.coalesce(F.sum(F.when(in_new, cents)), zero)
            .cast("bigint")
            .alias("new_c"),
        )
    )
    has_old = F.col("old_n") > 0
    has_new = F.col("new_n") > 0
    return (
        agg.filter(has_old | has_new)
        .select(
            "o_custkey",
            F.when(~has_old, F.lit("insert"))
            .when(~has_new, F.lit("delete"))
            .when(
                (F.col("old_n") != F.col("new_n"))
                | (F.col("old_c") != F.col("new_c")),
                F.lit("update"),
            )
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
            F.when(has_old, F.col("old_n")).otherwise(-1).cast("bigint").alias("old_n_orders"),
            F.when(has_new, F.col("new_n")).otherwise(-1).cast("bigint").alias("new_n_orders"),
            F.when(has_old, F.col("old_c")).otherwise(-1).cast("bigint").alias("old_revenue_cents"),
            F.when(has_new, F.col("new_c")).otherwise(-1).cast("bigint").alias("new_revenue_cents"),
        )
        .orderBy("o_custkey")
    )
