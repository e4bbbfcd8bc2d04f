"""Event-table operators: tumbling-window aggregation and sessionization.

Batch twins of the streaming operators (``quickner_spark.streaming``):
identical SQL semantics expressed over a static events table, so results
are oracle-checkable. At 100 TB both are shuffle-on-key aggregations; the
session window uses lag+cumsum (one shuffle-sort per user partition) —
hot users are the skew risk, bounded because per-user event counts are,
not corpus-size-proportional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["tumbling_window_stats", "sessionize", "session_stats"]


def tumbling_window_stats(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          value_col: str = "value",
                          minutes: int = 10) -> DataFrame:
    """Per (tumbling window, key): event count + value sum (sum kept as
    floor(long) for cross-engine exactness)."""
    win = F.window(ts_col, f"{minutes} minutes")
    return (events
            .groupBy(win.alias("w"), F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.floor(F.sum(value_col)).cast("long").alias("sum_value_fl"))
            .select(F.col("w.start").alias("window_start"), key_col,
                    "n_events", "sum_value_fl"))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the user's
    previous event exceeds ``gap_minutes``. Classic lag + cumulative-sum
    window; session_id is 1-based per user."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (events
            .withColumn("__new", new_session)
            .withColumn("session_id", F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
            .drop("__new"))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Per user: session count and largest session (by event count)."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    per_session = (s.groupBy(user_col, "session_id")
                   .agg(F.count("*").alias("n")))
    return (per_session.groupBy(user_col)
            .agg(F.max("session_id").alias("n_sessions"),
                 F.max("n").alias("max_session_events")))
