"""Exemplar storage — the reference's in-memory exemplar circular buffer
(tsdb/exemplar.go) mapped to a DataFrame keyed like samples.

An exemplar annotates a series sample with trace-scoped labels and its
own (value, timestamp); querying selects by series matchers over a time
range (web/api/v1/api.go:756 queryExemplars).
"""

from __future__ import annotations

from typing import Iterable, Mapping, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prometheus_spark.model.labels import sig_expr

EXEMPLAR_SCHEMA = T.StructType(
    [
        T.StructField("sig", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("t", T.LongType(), False),
        T.StructField(
            "ex_labels", T.MapType(T.StringType(), T.StringType()), False
        ),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("ex_t", T.LongType(), True),
    ]
)


def exemplars_from_rows(
    spark: SparkSession,
    rows: Iterable[
        Tuple[Mapping[str, str], int, Mapping[str, str], float, Optional[int]]
    ],
) -> DataFrame:
    """(series_labels, t_ms, exemplar_labels, value, ex_t_ms) → frame."""
    data = [
        (dict(labels), int(t), dict(exl), float(v),
         None if ex_t is None else int(ex_t))
        for labels, t, exl, v, ex_t in rows
    ]
    df = spark.createDataFrame(
        data,
        "labels map<string,string>, t long, ex_labels map<string,string>, "
        "value double, ex_t long",
    )
    # `name` column mirrors the samples layout so matcher_predicate's
    # hot-column __name__ path works unchanged
    return df.select(
        sig_expr("labels").alias("sig"),
        F.element_at("labels", "__name__").alias("name"),
        "labels", "t", "ex_labels", "value", "ex_t",
    )


def exemplars_from_openmetrics(spark: SparkSession, text: str, default_ts_ms: int = 0) -> DataFrame:
    """Parse an OpenMetrics body and keep only the exemplars."""
    from prometheus_spark.sources.openmetrics import parse_openmetrics_text

    _samples, _meta, exemplars, _created = parse_openmetrics_text(
        text, default_ts_ms=default_ts_ms
    )
    return exemplars_from_rows(
        spark,
        [
            (labels, t, exl, v, ex_t)
            for labels, t, exl, v, ex_t in exemplars
        ],
    )


def select_exemplars(
    exemplars: DataFrame, matchers, start_ms: int, end_ms: int
) -> DataFrame:
    """Matcher + time-range selection (ExemplarQuerier.Select)."""
    from prometheus_spark.engine.selectors import matcher_predicate

    return exemplars.where(
        matcher_predicate(list(matchers))
        & (F.col("t") >= start_ms)
        & (F.col("t") <= end_ms)
    )
