"""Event-time tumbling-window aggregation for sample/event streams:
``readStream → withWatermark → groupBy(window) → agg`` — the
Spark-idiomatic path for continuous roll-ups (the streaming counterpart
of the batch hourly-stats query, and the building block the reference
covers with recording rules over range queries, rules/group.go Eval).

Late-data semantics come from the watermark: rows older than
``max(event_time) - watermark`` are dropped by the engine and their
windows are finalized exactly once (append mode), so downstream sinks
see each (key, window) row a single time with its complete aggregate.

Scale: Spark plans this as a partial (map-side) aggregation before the
shuffle, state keyed by (key, window) in the executor state stores —
state size is O(active windows × keys), independent of stream volume;
nothing accumulates on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_stats(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "ts",
    key_col: str = "sig",
    value_col: str = "value",
) -> DataFrame:
    """Per-key tumbling-window count/sum/min/max/avg over an event-time
    stream.  Works on batch DataFrames too (windows are then never
    withheld) — the streaming/batch parity is tested both ways.

    In append output mode a (key, window) row is emitted only once the
    watermark (max observed event time minus ``watermark``) passes the
    window end; with ``trigger(availableNow=True)`` Spark runs a final
    no-data micro-batch that advances the watermark past the last file,
    so every window except the trailing un-finalized one is flushed.
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(time_col, watermark)
    w = F.window(time_col, window)
    return (
        src.groupBy(F.col(key_col), w.alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list,
    watermark: str = "1 hour",
    time_col: str = "ts",
) -> DataFrame:
    """First-occurrence exact dedup over a stream:
    ``dropDuplicatesWithinWatermark`` keyed by ``key_cols`` — the
    incremental form of the batch exact-dedup operator
    (pipeline.dedup.dedup_exact) for continuously ingested corpora.

    A duplicate arriving within ``watermark`` of the first occurrence
    is dropped; state for a key is evicted once the watermark passes
    it, so the state store holds only the active horizon — O(keys per
    watermark window), never the full corpus.  For exactly-once global
    dedup over unbounded history, pair this with the batch
    cross-corpus anti-join (pipeline.dedup.cross_corpus_exact_dedup) as a
    periodic compaction.

    Works on batch frames too (falls back to plain dropDuplicates,
    the same semantics with an infinite horizon).
    """
    if stream.isStreaming:
        return stream.withWatermark(
            time_col, watermark
        ).dropDuplicatesWithinWatermark(key_cols)
    return stream.dropDuplicates(key_cols)
