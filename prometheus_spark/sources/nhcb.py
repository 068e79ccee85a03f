"""Ingest-time classic-histogram → NHCB conversion.

Reference: model/textparse/nhcbparse.go — classic ``x_bucket{le=...}`` /
``x_sum`` / ``x_count`` series are folded into one native histogram with
custom buckets (schema −53) per (base name, labelset, timestamp).

Spark-first: the whole fold is columnar — one ``groupBy`` over the
(base, labelset-sig, t) key with ``collect_list`` of (le, value) pairs,
then array algebra (sort, de-cumulate via ``zip_with`` against the
shifted array) to build the histogram struct.  No Python in the loop, one
shuffle, scales with sample count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prometheus_spark.model.labels import sig_expr
from prometheus_spark.model.schema import HISTOGRAM_TYPE, METRIC_NAME_LABEL

CUSTOM_BUCKETS_SCHEMA = -53


def _le_value(le: Column) -> Column:
    return (
        F.when(le.isin("+Inf", "Inf", "inf"), F.lit(float("inf")))
        .otherwise(le.cast("double"))
    )


def classic_to_nhcb(samples: DataFrame, keep_classic: bool = False) -> DataFrame:
    """Fold classic histogram series in a canonical samples frame into
    NHCB rows under the base metric name.

    Input/output schema: (sig, name, labels, t, value, hist, stale) — the
    output carries the synthesized histograms in ``hist`` and, unless
    ``keep_classic``, drops the constituent ``_bucket``/``_sum``/
    ``_count`` float rows (mirroring nhcbparse's replacement semantics).
    """
    if "hist" not in samples.columns:
        samples = samples.withColumn("hist", F.lit(None).cast(HISTOGRAM_TYPE))

    is_bucket = (
        F.col("name").endswith("_bucket") & F.element_at("labels", "le").isNotNull()
    )
    is_sum = F.col("name").endswith("_sum")
    is_count = F.col("name").endswith("_count")
    classic = is_bucket | is_sum | is_count

    base = F.when(
        is_bucket, F.expr("substring(name, 1, length(name) - 7)")
    ).when(is_sum, F.expr("substring(name, 1, length(name) - 4)")).otherwise(
        F.expr("substring(name, 1, length(name) - 6)")
    )
    # labelset without le / __name__, rebased to the base metric name
    rest = F.map_filter(
        F.col("labels"), lambda k, _: (k != F.lit("le")) & (k != F.lit(METRIC_NAME_LABEL))
    )
    parts = (
        samples.filter(classic & ~F.col("stale") & F.col("value").isNotNull())
        .select(
            base.alias("base"),
            rest.alias("rest"),
            F.col("t"),
            F.when(is_bucket, _le_value(F.element_at("labels", "le"))).alias("le"),
            F.when(is_bucket, F.col("value")).alias("bucket_v"),
            F.when(is_sum, F.col("value")).alias("sum_v"),
            F.when(is_count, F.col("value")).alias("count_v"),
        )
        .withColumn("rest_sig", sig_expr(F.col("rest")))
    )
    grouped = parts.groupBy("base", "rest_sig", "t").agg(
        F.first("rest", ignorenulls=True).alias("rest"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("le").isNotNull(),
                    F.struct(F.col("le"), F.col("bucket_v").alias("v")),
                )
            )
        ).alias("pairs"),
        F.max("sum_v").alias("hsum"),
        F.max("count_v").alias("hcount"),
    ).filter(F.size("pairs") > 0)

    finite = F.filter(F.col("pairs"), lambda p: ~F.isnan(p["le"]) & (p["le"] != float("inf")))
    inf_v = F.filter(F.col("pairs"), lambda p: p["le"] == float("inf"))
    cum = F.transform(finite, lambda p: p["v"])
    prev = F.concat(F.array(F.lit(0.0)), F.slice(cum, 1, F.greatest(F.size(cum) - 1, F.lit(0))))
    deltas = F.zip_with(cum, prev, lambda c, p: F.greatest(c - p, F.lit(0.0)))
    last_cum = F.coalesce(F.element_at(cum, -1), F.lit(0.0))
    overflow = F.when(
        F.size(inf_v) > 0,
        F.array(F.greatest(F.element_at(inf_v, 1)["v"] - last_cum, F.lit(0.0))),
    ).otherwise(F.array().cast("array<double>"))
    pos_buckets = F.concat(deltas, overflow)
    total = F.coalesce(
        F.col("hcount"),
        F.when(F.size(inf_v) > 0, F.element_at(inf_v, 1)["v"]).otherwise(last_cum),
    )
    hist = F.struct(
        F.lit(CUSTOM_BUCKETS_SCHEMA).cast("int").alias("schema"),
        F.lit(0.0).alias("zero_threshold"),
        F.lit(0.0).alias("zero_count"),
        total.cast("double").alias("count"),
        F.coalesce(F.col("hsum"), F.lit(0.0)).cast("double").alias("sum"),
        F.when(
            F.size(pos_buckets) > 0,
            F.array(F.struct(
                F.lit(0).cast("int").alias("offset"),
                F.size(pos_buckets).cast("int").alias("length"),
            )),
        ).otherwise(F.array().cast("array<struct<offset:int,length:int>>")).alias("pos_spans"),
        pos_buckets.alias("pos_buckets"),
        F.array().cast("array<struct<offset:int,length:int>>").alias("neg_spans"),
        F.array().cast("array<double>").alias("neg_buckets"),
        F.transform(finite, lambda p: p["le"]).alias("custom_values"),
        F.lit(0).cast("int").alias("counter_reset_hint"),
    )
    labels = F.map_concat(
        F.col("rest"), F.create_map(F.lit(METRIC_NAME_LABEL), F.col("base"))
    )
    hist_rows = grouped.select(
        sig_expr(labels).alias("sig"),
        F.col("base").alias("name"),
        labels.alias("labels"),
        F.col("t"),
        F.lit(None).cast("double").alias("value"),
        hist.cast(HISTOGRAM_TYPE).alias("hist"),
        F.lit(False).alias("stale"),
    )
    rest_rows = samples if keep_classic else samples.filter(~classic)
    return rest_rows.select(
        "sig", "name", "labels", "t", "value", "hist", "stale"
    ).unionByName(hist_rows)
