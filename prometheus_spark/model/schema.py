"""Canonical sample schema — the "long" time-series layout.

Reference data model: a time series is a stream of (timestamp, value)
samples identified by an immutable label set; the metric name is the
reserved label ``__name__`` (reference: model/labels/labels_common.go:44,
promql/engine.go:3616).  We map that to one fixed-schema DataFrame row per
sample; arbitrary dimensionality lives in the MAP column.

Native histograms (reference: model/histogram/histogram.go:50) are a
nullable struct column; staleness markers (reference:
model/value/value.go:24-33 — a signaling NaN) become an explicit boolean
column because Spark cannot round-trip NaN payload bits safely.

Timestamps are int64 **milliseconds** since epoch, matching the reference
(promql/engine.go:778-784).
"""

from __future__ import annotations

from pyspark.sql import types as T

METRIC_NAME_LABEL = "__name__"

# Default instant-vector lookback: 5 minutes (reference: promql/engine.go:64).
DEFAULT_LOOKBACK_MS = 5 * 60 * 1000

SPAN_TYPE = T.StructType(
    [
        T.StructField("offset", T.IntegerType()),
        T.StructField("length", T.IntegerType()),
    ]
)

# Native histogram struct (reference: model/histogram/float_histogram.go:34).
# counter_reset_hint: 0=unknown 1=reset 2=not_reset 3=gauge
# (reference: model/histogram/histogram.go:26-34).
HISTOGRAM_TYPE = T.StructType(
    [
        T.StructField("schema", T.IntegerType()),
        T.StructField("zero_threshold", T.DoubleType()),
        T.StructField("zero_count", T.DoubleType()),
        T.StructField("count", T.DoubleType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("pos_spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("pos_buckets", T.ArrayType(T.DoubleType())),
        T.StructField("neg_spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("neg_buckets", T.ArrayType(T.DoubleType())),
        T.StructField("custom_values", T.ArrayType(T.DoubleType())),
        T.StructField("counter_reset_hint", T.ByteType()),
    ]
)

SAMPLE_SCHEMA = T.StructType(
    [
        # sig: canonical serialization of the sorted label set — the stable
        # join/group key (mirrors labels.Hash() use, promql/value.go:295).
        T.StructField("sig", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("hist", HISTOGRAM_TYPE, True),
        T.StructField("stale", T.BooleanType(), False),
    ]
)

# Instant/range vector frames flowing between operators use this subset.
VECTOR_COLUMNS = ["sig", "labels", "t", "value"]
