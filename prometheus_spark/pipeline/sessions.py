"""Event sessionization — gap-based session assignment over the events
stream, the canonical behavioral-analytics operator a training-data /
telemetry pipeline needs next to the metric engine.

Scale design: one shuffle on ``user_id`` (the window partition key);
everything after is per-partition window arithmetic in whole-stage
codegen.  At 100 TB the user key-space is high-cardinality, so the
shuffle is well-spread; a per-user hot spot (bot traffic) is bounded by
that user's own event count, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``.  Session id
    = (user, running count of session starts) — the textbook
    lag + cumulative-sum formulation, fully expressible in SQL, so the
    DuckDB oracle verifies it value-for-value.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    ts_s = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts_s).over(w)
    new_session = F.when(
        prev.isNull() | (ts_s - prev > gap_minutes * 60.0), 1
    ).otherwise(0)
    return df.withColumn("_new", new_session).withColumn(
        "session_seq", F.sum("_new").over(w).cast("long")
    ).drop("_new")


def session_stats(
    df: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session summary: session count, mean session length in
    seconds, mean events per session.  Two aggregations over the same
    ``user_id`` partitioning — Catalyst reuses the exchange, so the
    sessionize shuffle is the only one.
    """
    s = sessionize(df, gap_minutes, user_col, ts_col)
    ts_s = F.col(ts_col).cast("timestamp").cast("double")
    per_session = s.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max(ts_s) - F.min(ts_s)).alias("dur_s"),
    )
    return (
        per_session.groupBy(user_col)
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.round(F.avg("dur_s"), 6).alias("avg_session_sec"),
            F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
        )
    )


def streaming_session_stats(
    stream: DataFrame,
    gap_minutes: float = 30.0,
    watermark_minutes: float = 60.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization with Spark's NATIVE session windows:
    ``session_window(ts, gap)`` merges events into dynamic per-user
    windows that close after ``gap_minutes`` of silence; the watermark
    bounds state and admits late events up to ``watermark_minutes``.

    Works on a streaming frame (append mode — a session row emits once
    its window is older than the watermark, i.e. the session is final)
    and on a batch frame (all sessions emit).  Returns one row per
    closed session: (user, session_start, session_end, n_events,
    sum_value).

    Scale: state is one open window per active user, managed by the
    state store across executors; no UDF, no driver involvement — this
    is the operator the batch ``sessionize`` (lag+cumsum) cannot be at
    streaming time, expressed the Structured-Streaming-native way
    instead of via hand-rolled applyInPandasWithState state.
    """
    gap = f"{int(gap_minutes * 60)} seconds"
    wm = f"{int(watermark_minutes * 60)} seconds"
    return (
        stream.withWatermark(ts_col, wm)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(user_col),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
