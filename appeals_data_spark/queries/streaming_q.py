"""Batch twins of the streaming computations (SURVEY.md §2.10).

Each query here is the batch form of an operator in
``appeals_data_spark.streaming``; pytest proves stream==batch on the
same files, and the DuckDB oracle proves the batch form against ANSI
SQL (session_window is re-derived with gaps-and-islands SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import SQL_DSUM, dsum
from ..registry import register


@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("STREAM", "A12"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts — the batch twin of
    streaming.tumbling_counts (same window() expression; epoch-aligned
    1-hour windows coincide with date_trunc('hour'))."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_session_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts >= INTERVAL '30 minutes' THEN 1
                  ELSE 0 END AS new_sess
      FROM seq
    ), grp AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM grp
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    tags=("STREAM", "W3", "X4"),
    bench=True,
)
def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) per user — batch twin of
    streaming.session_window_stats. The oracle re-derives sessions from
    first principles (gaps-and-islands: lag + cumulative sum), pinning
    Spark's merge semantics: windows [t, t+gap) merge iff the gap to
    the next event is strictly less than 30 minutes."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "stream_user_totals",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {SQL_DSUM.format(col="value")} AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("STREAM", "A1"),
)
def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event totals — batch twin of the
    applyInPandasWithState running accumulator (whose final update-mode
    emission per user equals this aggregate)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .orderBy("user_id")
    )
