"""Samples-table construction and persistence.

The reference's storage is series-major compressed chunks behind an
inverted index (SURVEY §1.3); our equivalent is Parquet partitioned by a
time bucket with ``name`` extracted as a hot column — Catalyst partition
pruning + min/max stats replace the postings index at scale.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prometheus_spark.model.labels import sig_for
from prometheus_spark.model.schema import METRIC_NAME_LABEL

from prometheus_spark.model.schema import HISTOGRAM_TYPE

_ROW_SCHEMA = T.StructType(
    [
        T.StructField("sig", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("hist", HISTOGRAM_TYPE, True),
        T.StructField("stale", T.BooleanType(), False),
        # start (created) timestamp in epoch-ms; NULL = unknown
        # (reference: created-timestamp / PROM-29 start timestamps)
        T.StructField("st", T.LongType(), True),
    ]
)


def samples_from_rows(
    spark: SparkSession,
    rows: Iterable[tuple[Mapping[str, str], int, Optional[float]]],
    stale_rows: Iterable[tuple[Mapping[str, str], int]] = (),
) -> DataFrame:
    """Build a samples frame from (labels, t_ms, value) tuples — the test
    fixture path (mirrors promqltest ``load``)."""
    def hist_row(h):
        if h is None:
            return None
        return (
            int(h["schema"]), float(h["zero_threshold"]), float(h["zero_count"]),
            float(h["count"]), float(h["sum"]),
            [(int(s["offset"]), int(s["length"])) for s in h["pos_spans"]],
            [float(x) for x in h["pos_buckets"]],
            [(int(s["offset"]), int(s["length"])) for s in h["neg_spans"]],
            [float(x) for x in h["neg_buckets"]],
            [float(x) for x in h["custom_values"]],
            int(h["counter_reset_hint"]),
        )

    data = []
    for row in rows:
        labels, t, v = row[0], row[1], row[2]
        st = int(row[3]) if len(row) > 3 and row[3] is not None else None
        if isinstance(v, dict):  # native histogram sample
            data.append(
                (sig_for(labels), labels.get(METRIC_NAME_LABEL), dict(labels),
                 int(t), None, hist_row(v), False, st)
            )
        else:
            data.append(
                (sig_for(labels), labels.get(METRIC_NAME_LABEL), dict(labels),
                 int(t), float(v), None, False, st)
            )
    data += [
        (sig_for(labels), labels.get(METRIC_NAME_LABEL), dict(labels), int(t),
         None, None, True, None)
        for labels, t in stale_rows
    ]
    return spark.createDataFrame(data, _ROW_SCHEMA)


def samples_from_events(
    spark: SparkSession,
    events: DataFrame,
    name_col: str = "event_type",
    value_col: str = "value",
    label_cols: Iterable[str] = ("user_id",),
) -> DataFrame:
    """Adapt the driver's ``events`` table (event_id, ts, user_id,
    event_type, value, props) into the canonical samples layout: the event
    type becomes the metric name, chosen columns become labels."""
    labels_entries = [F.lit(METRIC_NAME_LABEL), F.col(name_col).cast("string")]
    for c in label_cols:
        labels_entries += [F.lit(c), F.col(c).cast("string")]
    labels = F.create_map(*labels_entries)
    # The driver's events.parquet carries TIMESTAMP(µs) which Spark reads as
    # TIMESTAMP_NTZ; unix_millis requires TIMESTAMP, and under the UTC session
    # TZ the cast is an exact epoch-ms identity (matches DuckDB epoch_ms(ts)).
    ts_type = dict(events.dtypes).get("ts", "timestamp")
    ts_col = F.col("ts")
    if ts_type == "bigint":  # legacy nanosAsLong read path
        t_expr = (ts_col / F.lit(1_000_000)).cast("long")
    else:
        if ts_type != "timestamp":
            ts_col = ts_col.cast("timestamp")
        t_expr = F.unix_millis(ts_col)
    df = events.select(
        labels.alias("labels"),
        F.col(name_col).cast("string").alias("name"),
        t_expr.alias("t"),
        F.col(value_col).cast("double").alias("value"),
        F.lit(False).alias("stale"),
    )
    from prometheus_spark.model.labels import sig_expr

    return df.select(
        sig_expr("labels").alias("sig"), "name", "labels", "t", "value", "stale"
    )


def write_samples(
    df: DataFrame,
    path: str,
    bucket_ms: int = 7_200_000,
    hot_labels: Iterable[str] = (),
    series_dim_path: str | None = None,
) -> None:
    """Persist partitioned by 2h-style time bucket (reference block layout,
    tsdb/db.go:55) + metric name — enables partition pruning on both the
    time predicate and ``__name__`` equality matchers.

    ``hot_labels`` extracts chosen label keys as top-level ``__hot_<k>``
    string columns at write time: equality matchers on them then push
    down to the parquet scan (row-group min/max + dictionary pruning) —
    the postings-index role for high-selectivity labels like ``job`` or
    ``instance`` (SURVEY §4.1 predicate-pushdown note).  The engine picks
    them up automatically via ``matcher_predicate``.
    """
    out = df.withColumn("t_bucket", (F.col("t") / bucket_ms).cast("long"))
    for k in hot_labels:
        out = out.withColumn(
            f"__hot_{k}", F.element_at(F.col("labels"), F.lit(k))
        )
    (
        out.repartition("t_bucket", "name")
        .sortWithinPartitions("sig", "t")
        .write.mode("overwrite")
        .partitionBy("t_bucket", "name")
        .parquet(path)
    )
    if series_dim_path is not None:
        # maintain the postings-index analogue at write time so metadata
        # endpoints never scan the samples store (storage.series_dim)
        import os

        from prometheus_spark.storage.series_dim import (
            build_series_dim,
            merge_series_dim,
            read_series_dim,
            write_series_dim,
        )

        delta = build_series_dim(df)
        if os.path.isdir(series_dim_path) and any(
            n.startswith("name=") for n in os.listdir(series_dim_path)
        ):
            spark = df.sparkSession
            merged = merge_series_dim(
                read_series_dim(spark, series_dim_path), delta
            ).localCheckpoint()  # break lineage off the dir being replaced
            write_series_dim(merged, series_dim_path)
        else:
            write_series_dim(delta, series_dim_path)


def read_samples(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
