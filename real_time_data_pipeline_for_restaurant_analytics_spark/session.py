"""SparkSession factory.

The reference ran on a Snowflake x-small warehouse
(`01 Create DB+Schema.sql:5-15`); here the equivalent knob set is the
Spark conf. Defaults are chosen for the local[32] test box but every
knob is the one you would also tune on a 1000-executor cluster:

- AQE on (runtime join-strategy switch, skew-join splitting,
  partition coalescing) — replaces Snowflake's adaptive execution.
- shuffle partitions sized to the data (32 locally; at 100 TB you set
  this to ~2-3x total cores or rely on AQE coalescing from a high
  initial count).
- Arrow enabled so any pandas_udf/mapInPandas path is batched, never
  row-at-a-time.
- session timezone pinned to UTC so timestamp semantics are stable
  across drivers/executors (the reference uses TIMESTAMP_NTZ /
  explicit TZ columns; pinning UTC gives the same determinism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _local_dir() -> str:
    """Spark scratch (shuffle blocks, broadcast, disk spill) location.

    ``$SPARK_GRAFT_LOCAL_DIR`` if set, else the disk-backed system
    tempdir (via :func:`scratch_base`, which also honours
    ``$SPARK_GRAFT_TMPDIR``). On a cluster you point spark.local.dir
    at local NVMe (guide §2.1/§6); RAM-backed tmpfs is deliberately
    NOT auto-selected — shuffle/spill pages there compete with the
    JVM heap and Python workers for the same RAM/cgroup budget, and
    spill exists to relieve memory (guide §5). Opt in via the env
    vars only with measured headroom.
    """
    d = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if d:
        return d
    from .workdirs import scratch_base

    p = os.path.join(scratch_base(), "spark_graft_local")
    os.makedirs(p, exist_ok=True)
    return p


def get_spark(
    app_name: str = "real_time_data_pipeline_for_restaurant_analytics_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast threshold: dims in this model (region/nation/part/
        # supplier, menu/location/restaurant) are small — let them fly.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Files: 128 MB split target is right for local AND cluster.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.local.dir", _local_dir())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
