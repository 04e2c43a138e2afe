"""Bucketed table layout for shuffle-free co-located joins.

Not in the reference (Snowflake handles physical layout); at 100 TB
this is the Spark-side answer to its micro-partitioning: persist the
big fact tables bucketed (and sorted) by their join key and every
subsequent fact⋈fact equi-join on that key runs with ZERO exchanges —
each task reads matching buckets from both sides. The win repeats on
every downstream join of the same key, which is exactly the
orders⋈lineitem / fact⋈fact shape of the analytics layer.

Rules of thumb encoded here:
- bucket count sized once per deployment (a divisor/multiple of
  cluster parallelism; both sides MUST agree for exchange-free joins);
- sortBy(key) within buckets so the join is a streaming merge, not a
  hash build;
- verified by plan, not by faith: tests/test_bucketing.py asserts the
  joined plan contains no Exchange and scans report the bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Persist as a bucketed+sorted managed table (parquet).

    The ``repartition(n_buckets, *keys)`` before the write is
    load-bearing (review r8): without it EVERY input partition emits
    its own file per bucket (up to n_input_partitions × n_buckets
    slivers — at 100 TB, ~10k partitions × 8 buckets = 80k small
    files), and Spark only trusts per-bucket sortedness when a bucket
    holds exactly ONE file, so the ``sortBy`` would be silently
    discarded and every downstream merge join would re-Sort. With the
    repartition each bucket's rows land in one task → one sorted file
    per bucket, and the exchange-free AND sort-free join plan is
    real."""
    keys = [key] if isinstance(key, str) else key
    (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .saveAsTable(table)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str]
) -> DataFrame:
    """Equi-join two co-bucketed tables on their bucketing key. With
    matching bucket counts Catalyst plans a merge join with no
    shuffle on either side."""
    keys = [key] if isinstance(key, str) else key
    return spark.table(left_table).join(spark.table(right_table), on=keys)
