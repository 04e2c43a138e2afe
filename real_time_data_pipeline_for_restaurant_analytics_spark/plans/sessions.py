"""Batch sessionization as a registered, oracle-checked query.

The streaming twin lives in streaming/windows.sessionize
(applyInPandasWithState); this is the window-function backfill form
over the events table — lag → session-break flag → running session
id → per-session aggregate. Fully SQL-expressible, so DuckDB verifies
the session math value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from ..streaming.windows import sessionize_batch

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "q31_sessionize_batch",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000 THEN 1
              ELSE 0 END AS is_new
  FROM events
  -- NULL event times are dropped on BOTH sides (review r9: the Spark
  -- twin filters them per the ADVICE r9 parity fix; without this the
  -- oracle would fold a NULL ts into the prior session on any future
  -- fixture that contains one)
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
       strftime(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
    doc="Gap-based (30 min) sessionization via window functions — batch twin "
    "of the stateful streaming operator.",
)
def q31_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize_batch(e, gap_minutes=30).select(
        "user_id",
        F.date_format("session_start", _TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_end", _TS_FMT_SPARK).alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")
