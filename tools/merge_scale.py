"""Measured file-pruned MERGE vs snapshot rewrite — the round-7
evidence for the >TB-dim MERGE path (SCALE_r07.md).

Builds a wide dim from lineitem (sf0.1 = 600k rows; sf1.0 = 6M rows
when .scaledata exists), initial-loads it into both merge backends,
then times identical update batches through each in the TWO realistic
merge geometries:

- **trickle** (hash layout, default bucketing): a ~30-key corrections
  batch — the dim-maintenance drip. Touches <= 30 of 256 buckets;
  pruned merge reads/writes ~12% of the table regardless of dim size.
- **daily** (range layout, ``bucket_sql`` over the monotone order
  key): a batch updating the most recent ~1% key range — the
  reference's daily-load geometry (`order_proc.sql` merges yesterday's
  orders). Keys cluster, so the batch lands in 3-4 trailing buckets
  however many rows it has.

A uniformly-spread large batch (the third geometry) is measured too as
the honest negative control: random keys touch every hash bucket and
pruning buys nothing — at that point a full rewrite IS the right plan,
which is why SnapshotMergeBackend stays the default below ~TB.

Usage: python tools/merge_scale.py [n_buckets] (default 256)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.session import get_spark
from real_time_data_pipeline_for_restaurant_analytics_spark.sources.merge_backend import (
    BucketPrunedMergeBackend,
    SnapshotMergeBackend,
)

WORK = "/root/repo/.scaledata/merge_scale"
KEY = ["l_orderkey", "l_linenumber"]
ATTRS = ["l_returnflag", "l_extendedprice"]


def mark(df):
    return df.withColumn(
        "l_returnflag", F.concat(F.lit("U"), F.col("l_returnflag"))
    ).withColumn("l_extendedprice", F.col("l_extendedprice") + 1)


def timed_merge(spark, be, batch) -> float:
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    be.merge_upsert(batch, KEY, ATTRS)
    return time.perf_counter() - t0


def scenario(spark, label, li, batch, n_buckets, bucket_sql=None) -> None:
    root = os.path.join(WORK, label.replace(" ", "_"))
    shutil.rmtree(root, ignore_errors=True)
    snap = SnapshotMergeBackend(spark, root, "dim_snap")
    buck = BucketPrunedMergeBackend(
        spark, os.path.join(root, "dim_buck"), key=KEY,
        n_buckets=n_buckets, bucket_sql=bucket_sql,
    )
    snap.merge_upsert(li, KEY, ATTRS)
    buck.merge_upsert(li, KEY, ATTRS)
    touched = len(buck._touched_buckets(batch))
    t_snap = min(timed_merge(spark, snap, batch) for _ in range(2))
    t_buck = min(timed_merge(spark, buck, batch) for _ in range(2))
    print(
        f"{label:24s} dim={li.count():>9,} batch={batch.count():>6,} "
        f"touched={touched:>3}/{n_buckets}  snapshot={t_snap:6.2f}s  "
        f"pruned={t_buck:6.2f}s  speedup={t_snap / t_buck:5.2f}x",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


def run(spark, sf: str, sf_dir: str, n_buckets: int) -> None:
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]

    # trickle: ~30 distinct orders, hash layout
    trickle = mark(li.filter(F.col("l_orderkey") % (max_ok // 8) == 7))
    scenario(spark, f"{sf} trickle/hash", li, trickle, n_buckets)

    # daily: top ~1% of the (monotone) key range, range layout
    stride = max_ok // n_buckets + 1
    daily = mark(li.filter(F.col("l_orderkey") >= int(max_ok * 0.99)))
    scenario(
        spark, f"{sf} daily/range", li, daily, n_buckets,
        bucket_sql=f"least(cast(l_orderkey div {stride} as int), {n_buckets - 1})",
    )

    # negative control: uniformly spread ~0.3% batch, hash layout
    spread = mark(li.filter(F.col("l_orderkey") % 383 == 0))
    scenario(spark, f"{sf} spread/hash (control)", li, spread, n_buckets)


def main() -> None:
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spark = get_spark(app_name="merge_scale")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, "sf0.1", "/root/testdata/sf0.1", n_buckets)
    if os.path.exists("/root/repo/.scaledata/sf1.0/lineitem.parquet"):
        run(spark, "sf1.0", "/root/repo/.scaledata/sf1.0", n_buckets)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
