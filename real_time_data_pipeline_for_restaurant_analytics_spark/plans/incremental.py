"""Batch-SQL-expressible views of the incremental operators
(SURVEY §2.5 C1-C5).

The reference's heart is the stream→MERGE loop: SCD1 upserts into the
clean layer (`order_proc.sql:96-195`) and SCD2 versioning into the
dims (`order_proc.sql:195-303`). The *stateful* merge library lives in
``operators/merge.py`` (tested against golden day-01/day-02 fixtures);
the two queries here express the same semantics as pure relational
plans over an event history, so the driver's DuckDB oracle can verify
the versioning math value-for-value:

- q17: SCD1 "latest snapshot" — what the clean table holds after
  replaying all change records.
- q18: SCD2 "full version history" — eff_start/eff_end/is_current
  exactly as the dim would hold after replaying the history in order.

Treating `events` as the change feed: user_id = business key,
ts = change timestamp, (event_type, value) = tracked attributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "q17_scd1_latest_snapshot",
    oracle=f"""
WITH ranked AS (
  SELECT user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value,
         strftime(ts, '{_TS_FMT_DUCK}') AS updated_at,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, value, updated_at FROM ranked WHERE rn = 1 ORDER BY user_id
""",
    doc="SCD1 upsert result: latest attribute tuple per business key (C3 as a plan).",
)
def q17_scd1_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.select(
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("value"),
            F.date_format("ts", _TS_FMT_SPARK).alias("updated_at"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


@register(
    "q18_scd2_version_history",
    oracle=f"""
SELECT user_id,
       event_type,
       CAST(value AS DECIMAL(18,6)) AS value,
       strftime(ts, '{_TS_FMT_DUCK}') AS eff_start,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '{_TS_FMT_DUCK}') AS eff_end,
       CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN TRUE ELSE FALSE END AS is_current,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version_no
FROM events
ORDER BY user_id, version_no
""",
    doc="SCD2 dim content after replaying the change history (C4 as a plan).",
)
def q18_scd2_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lead_ts = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
        F.date_format("ts", _TS_FMT_SPARK).alias("eff_start"),
        F.date_format(lead_ts, _TS_FMT_SPARK).alias("eff_end"),
        lead_ts.isNull().alias("is_current"),
        F.row_number().over(w).alias("version_no"),
    ).orderBy("user_id", "version_no")
