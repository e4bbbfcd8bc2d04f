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

__all__ = ["tumbling_window_stats", "sessionize", "session_stats",
           "latest_by_key"]


def latest_by_key(df: DataFrame, key_cols, ts_col: str,
                  tiebreak_cols=()) -> DataFrame:
    """Arg-max snapshot dedup: ONE row per key — the row with the
    greatest ``(ts, *tiebreak)``. The crawl use case: Common-Crawl
    archives revisit URLs across segments/snapshots, and the KG pipeline
    keys documents on url, so WARC ingest dedups to the latest capture
    (:func:`sources.warc.latest_by_url`).

    Shape: ``max_by(struct(<row>), struct(ts, *tiebreak))`` — an
    aggregate whose map-side PARTIAL keeps one candidate row per key per
    partition, so the exchange carries ~|keys| rows. (Struct buffers
    aren't hash-aggregable, so it plans as a SortAggregate with a local
    per-partition sort on the key — still no corpus-wide shuffle of
    candidate rows.) The window alternative (``row_number() over
    (partition by key order by ts desc)``) shuffles AND sorts every
    input row; at corpus scale the partial-aggregate form wins and is
    skew-immune for the same reason any map-side combine is. Ties beyond
    ``tiebreak_cols`` are broken by the whole remaining row (struct
    comparison is lexicographic), keeping the result deterministic even
    for full-duplicate rows."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    rest = [c for c in df.columns if c not in key_cols]
    order = F.struct(ts_col, *tiebreak_cols,
                     *[c for c in rest if c != ts_col
                       and c not in tiebreak_cols])
    return (df.groupBy(*key_cols)
            .agg(F.max_by(F.struct(*rest), order).alias("_r"))
            .select(*key_cols, *[F.col(f"_r.{c}").alias(c) for c in rest]))


def tumbling_window_stats(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          value_col: str = "value",
                          minutes: int = 10) -> DataFrame:
    """Per (tumbling window, key): event count + value sum (sum kept as
    floor(long) for cross-engine exactness).

    NULL-timestamp events are dropped — Spark's ``window()`` does this
    implicitly (no window is assignable); the explicit filter makes the
    policy visible in the plan and in relational restatements, where
    epoch arithmetic would otherwise keep a spurious NULL-window group."""
    events = events.where(F.col(ts_col).isNotNull())
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
    window; session_id is 1-based per user.

    NULL-timestamp events are dropped: their position in the ordered
    per-user stream is engine-defined (Spark sorts NULLS FIRST ascending,
    DuckDB NULLS LAST), so any session id assigned to them — and, worse,
    to their NEIGHBORS via the lag gap — would be nondeterministic.
    NULL ``user_col`` keys keep standard SQL grouping (one NULL group)."""
    events = events.where(F.col(ts_col).isNotNull())
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
