"""Date-partitioned warehouse layout (hive-style) for partition-pruned
scans.

The reference relies on Snowflake micro-partition pruning (SURVEY §4);
the Spark equivalent for time-organized facts is directory
partitioning: `.../event_date=2024-05-01/part-*.parquet`. A filter on
the partition column never touches excluded directories — at 100 TB
with daily partitions, a one-week query scans 7/365ths of the data
before a single row is read. Rules encoded here:

- partition column cardinality stays modest (days, not user ids — a
  100k-directory listing is its own bottleneck);
- files per partition sized by repartitioning on write so each
  partition holds a few full HDFS-block-sized files, not thousands of
  slivers;
- pruning is verified by plan (`tests/test_partitioned.py`), not
  assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "event_date",
    files_per_partition: int = 1,
) -> None:
    """Write parquet partitioned by the date of `ts_col`, at most
    ``files_per_partition`` files per date directory.

    Review r8: ``repartition(k, date)`` is NOT "k files per date" — k
    is the TOTAL partition count, every row of a date hashes to the
    same one (so each date always got exactly 1 file), and the default
    k=1 funneled the entire write through a single task — the opposite
    of the module's 100 TB promise. The correct shape salts WITHIN the
    date: hash-partition by (date, xxhash64(*) % k), so each date's
    rows spread over k task groups (k files per date dir, every file
    ~date-volume/k) while the cluster keeps full write parallelism.
    The salt column is dropped before the write (it is not part of the
    table schema). The partition count is EXPLICIT — an advisory
    ``repartition(cols...)`` is an AQE coalescing target, and coalesced
    (date, salt) groups land in one task again, silently undoing the
    salt."""
    n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    salted = df.withColumn(partition_col, F.to_date(F.col(ts_col))).withColumn(
        "_fsalt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_partition)),
    )
    (
        salted.repartition(n_shuffle, F.col(partition_col), F.col("_fsalt"))
        .drop("_fsalt")
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_day(
    spark: SparkSession, path: str, day: str, partition_col: str = "event_date"
) -> DataFrame:
    """Read one day — the filter prunes to a single directory."""
    return spark.read.parquet(path).filter(F.col(partition_col) == F.lit(day))
