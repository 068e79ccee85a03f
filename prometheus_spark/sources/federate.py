"""Federation: expose the current state of selected series as
Prometheus text exposition lines.

Reference: web/federate.go:55 — for each ``match[]`` selector, emit the
latest sample per series within the lookback window, labels sorted, one
``name{labels} value timestamp_ms`` line per series.

Spark-first: the "latest sample per series" is ``max_by`` over the
lookback-filtered frame (one shuffle on sig), and the line rendering is
pure string expressions — the result is a DataFrame of lines, so a 100M-
series federation never materializes on the driver; stream it to the
HTTP response partition by partition."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prometheus_spark.model.schema import METRIC_NAME_LABEL


def _escape(col):
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\"'),
        "\n",
        r"\n",
    )


def federate(
    samples: DataFrame,
    matchers: Sequence[dict[str, str]],
    now_ms: int,
    lookback_ms: int = 300_000,
) -> DataFrame:
    """Latest-sample-per-series exposition lines for the union of the
    given equality matcher sets (each dict = one ``match[]`` selector).

    Returns a one-column (``line``) DataFrame ordered by metric name."""
    window = samples.filter(
        (F.col("t") > now_ms - lookback_ms)
        & (F.col("t") <= now_ms)
        & (~F.col("stale"))
        & F.col("value").isNotNull()
    )
    if matchers:
        conds = None
        for mset in matchers:
            c = F.lit(True)
            for k, v in mset.items():
                if k == METRIC_NAME_LABEL:
                    c = c & (F.col("name") == v)
                else:
                    c = c & (F.element_at("labels", k) == v)
            conds = c if conds is None else (conds | c)
        window = window.filter(conds)
    latest = window.groupBy("sig").agg(
        F.max_by(F.struct("t", "value", "name", "labels"), "t").alias("s")
    )
    entries = F.array_sort(
        F.map_entries(F.map_filter(F.col("s.labels"), lambda k, _: k != F.lit(METRIC_NAME_LABEL)))
    )
    label_blob = F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(e["key"], F.lit('="'), _escape(e["value"]), F.lit('"')),
        ),
        ",",
    )
    line = F.concat(
        F.col("s.name"),
        F.when(F.size(entries) > 0, F.concat(F.lit("{"), label_blob, F.lit("}"))).otherwise(F.lit("")),
        F.lit(" "),
        F.col("s.value").cast("string"),
        F.lit(" "),
        F.col("s.t").cast("string"),
    )
    return latest.select(F.col("s.name").alias("__n"), line.alias("line")).orderBy(
        "__n", "line"
    ).select("line")
