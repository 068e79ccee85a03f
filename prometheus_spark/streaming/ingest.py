"""Streaming ingest with out-of-order tolerance and duplicate rejection.

The reference's TSDB accepts samples within an out-of-order window behind
the head's max time and rejects anything older (tsdb/db.go:192-195,
``OutOfOrderTimeWindow``); duplicate (series, timestamp) appends are
dropped.  The Structured-Streaming-native mapping (SURVEY §2.8):

- OOO window  → ``withWatermark(event_time, window)``: the engine tracks
  ``max(event_time) - window`` and admits late rows only inside it.
- dup drop    → ``dropDuplicatesWithinWatermark([sig, t])``: state for the
  (series, timestamp) key is kept only within the watermark, so the state
  store stays bounded by window×ingest-rate — the property that keeps this
  running at 100 TB/day, unlike an unbounded ``dropDuplicates``.

Rows later than the watermark are dropped by the dedup operator itself —
the same "too old, reject" semantics as the reference's appender.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def samples_stream_from_events(
    events: DataFrame,
    name_col: str = "event_type",
    value_col: str = "value",
    label_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``storage.samples_from_events``: adapt an events
    stream to the canonical samples layout, keeping the event-time
    timestamp column (``event_ts``) for watermarking."""
    from prometheus_spark.model.labels import sig_expr
    from prometheus_spark.model.schema import METRIC_NAME_LABEL

    entries = [F.lit(METRIC_NAME_LABEL), F.col(name_col).cast("string")]
    for c in label_cols:
        entries += [F.lit(c), F.col(c).cast("string")]
    ts = F.col(ts_col)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    df = events.select(
        F.create_map(*entries).alias("labels"),
        F.col(name_col).cast("string").alias("name"),
        ts.alias("event_ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return df.select(
        sig_expr("labels").alias("sig"),
        "name",
        "labels",
        F.unix_millis("event_ts").alias("t"),
        "event_ts",
        "value",
        F.lit(False).alias("stale"),
    )


def with_ooo_window(
    samples: DataFrame,
    ooo_window_ms: int,
    event_time_col: str = "event_ts",
) -> DataFrame:
    """Apply the out-of-order acceptance window to a samples *stream*:
    watermark by the event-time column and drop duplicate (sig, t) pairs
    within it.  Late rows (older than max-event-time − window) are
    rejected exactly like the reference's OOO appender."""
    delay = f"{max(ooo_window_ms, 0) // 1000} seconds"
    return samples.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        ["sig", "t"]
    )


def ingest_events_stream(
    events: DataFrame,
    path: str,
    checkpoint: str,
    ooo_window_ms: int = 600_000,
    bucket_ms: int = 7_200_000,
    **adapt_kwargs,
):
    """End-to-end durable ingest: events stream → canonical samples with
    an OOO window → parquet sink partitioned by time bucket (the same
    layout ``storage.write_samples`` uses), with a checkpointed WAL.

    Returns the started ``StreamingQuery``.  Use
    ``trigger(availableNow=True)`` semantics by stopping after the query
    drains in tests."""
    samples = with_ooo_window(
        samples_stream_from_events(events, **adapt_kwargs), ooo_window_ms
    )
    out = samples.withColumn(
        "t_bucket", (F.col("t") / F.lit(bucket_ms)).cast("long")
    ).drop("event_ts")
    return (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("t_bucket", "name")
        .trigger(availableNow=True)
        .start()
    )
