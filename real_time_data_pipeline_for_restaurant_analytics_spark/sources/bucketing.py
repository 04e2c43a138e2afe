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

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Persist as a bucketed+sorted managed table (parquet)."""
    keys = [key] if isinstance(key, str) else key
    (
        df.write.mode("overwrite")
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
