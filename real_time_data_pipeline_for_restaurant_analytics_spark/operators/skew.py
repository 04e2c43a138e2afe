"""Skew-mitigation operators: salted aggregation and salted joins.

Not present in the reference (Snowflake's optimizer handles skew
internally); at 100 TB on Spark, hot keys are OUR problem. Two
standing mitigations, plus AQE's runtime skew-join splitting which
the session enables globally (session.py):

- **salted aggregation** — two-stage: partial aggregate on
  (key, salt) spreads one hot key over `n_salts` reducers, final
  aggregate on key merges the partials. Worth it when single keys
  carry a large share of all rows (power-law user activity, null-ish
  default keys). For algebraic aggregates only (sum/count/min/max) —
  the partials must compose.
- **salted join** — replicate the small side `n_salts`× with an
  explicit salt column, salt the big side deterministically, join on
  (key, salt). Each hot key's rows land on `n_salts` different
  reducers instead of one. Use when BOTH sides are too big to
  broadcast and AQE's split is not enough (e.g. one key >> one
  partition's budget).

The salt is derived with ``xxhash64`` from a high-cardinality column
of the big side — engine-private hash is fine here because the salt
only steers *distribution*; results are salt-invariant, which is
exactly what the DuckDB oracles verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

N_SALTS = 16


def salt_of(source: Column | str, n_salts: int = N_SALTS) -> Column:
    """Deterministic salt in [0, n_salts) from a high-cardinality column."""
    c = F.col(source) if isinstance(source, str) else source
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_count(
    df: DataFrame,
    keys: list[str],
    salt_source: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """COUNT(*) per key via two-stage salted aggregation.

    Stage 1 shuffles on (keys..., salt) — a hot key spreads over
    n_salts reducers; stage 2 shuffles n_salts rows per key, which is
    negligible. Output: keys + ``n`` (bigint).
    """
    partial = (
        df.withColumn("_salt", salt_of(salt_source, n_salts))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    return partial.groupBy(*keys).agg(F.sum("_pn").cast("bigint").alias("n"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_source: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Skew-resilient equi-join: replicate `small` n_salts×, salt `big`
    deterministically, join on (key, salt) with an explicit shuffle
    join (broadcast would make salting moot — this operator exists for
    the case where neither side broadcasts).
    """
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_big = big.withColumn("_salt", salt_of(salt_source, n_salts))
    joined = salted_big.hint("shuffle_hash").join(
        replicated,
        (F.col(big_key) == F.col(small_key)) & (salted_big["_salt"] == replicated["_salt"]),
    )
    return joined.drop("_salt")


# ---------------------------------------------------------------------------
# Registered queries + oracles (results are salt-invariant ⇒ plain SQL)
# ---------------------------------------------------------------------------


@register(
    "q32_salted_heavy_hitters",
    oracle="""
SELECT user_id, COUNT(*) AS n
FROM events GROUP BY user_id ORDER BY n DESC, user_id
""",
    doc="Per-user event counts via two-stage salted aggregation "
    "(hot-key spread over 16 reducers; salt-invariant result).",
)
def q32_salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id")
    return salted_count(e, ["user_id"], salt_source="event_id").orderBy(
        F.desc("n"), "user_id"
    )


@register(
    "q33_salted_join_segments",
    oracle="""
SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY mktsegment
""",
    doc="events⋈customer with a 16-way salted shuffle join (the "
    "neither-side-broadcasts skew path), rolled up per market segment.",
)
def q33_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(e, c, "user_id", "c_custkey", salt_source="event_id")
    return (
        j.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("mktsegment")
    )
