"""Streaming-shaped operators checked in batch mode (Structured
Streaming's unified API: the same plan runs on static frames — here the
DuckDB oracle can then verify semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.streaming import events as ev

# Spark session_window merges events whose [ts, ts+gap) windows overlap —
# i.e. a new session starts when the gap to the previous event is >= gap.
# The oracle expresses the same thing as gaps-and-islands.
_SESSION_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flags AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 5 MINUTE
                 THEN 1 ELSE 0 END AS new_s
  FROM e
),
isl AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
)
SELECT user_id,
       min(ts)  AS session_start,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS session_value
FROM isl
GROUP BY user_id, sid
"""


@register("sessionize_events", oracle=_SESSION_ORACLE, tags=("streaming", "window"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 5-minute inactivity gap
    (``session_window`` — streaming/events.py:sessionize). Identical
    code path serves the streaming facade; here checked in batch against
    a gaps-and-islands oracle.

    Scale notes: session windows are a stateful agg keyed by
    (user, session) — one shuffle on user_id; in streaming the watermark
    evicts closed sessions so state is bounded by the active-session set.
    """
    return ev.sessionize(_t(spark, sf_dir, "events"), gap="5 minutes")
