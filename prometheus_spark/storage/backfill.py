"""Backfill — bulk import into the partitioned block store.

Mirrors promtool's importers (cmd/promtool/main.go:288
``tsdb create-blocks-from``):

- ``backfill_openmetrics``: OpenMetrics text → samples → partitioned
  parquet blocks (cmd/promtool/backfill.go).  Timestamps in OpenMetrics
  are seconds; blocks land in the same (t_bucket, name) layout the
  engine queries, so imported history is immediately selectable.
- ``backfill_rules``: evaluate recording rules over a historical range
  and append their output as new series (cmd/promtool/rules.go:1283
  ``importRules``) — evaluation runs as ONE distributed range query per
  rule (the whole step grid in a single plan), not a per-step loop, so
  backfilling a year of 1m-resolution output is a handful of Spark jobs.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def backfill_openmetrics(
    spark: SparkSession,
    text: str,
    path: str,
    extra_labels: Optional[dict] = None,
    bucket_ms: int = 7_200_000,
) -> int:
    """Import an OpenMetrics exposition dump into the block store at
    ``path``.  Returns the number of samples written."""
    from prometheus_spark.sources.openmetrics import parse_openmetrics_text
    from prometheus_spark.storage.samples import (
        samples_from_rows,
        write_samples,
    )

    # strict importer semantics (cmd/promtool/backfill.go): the dump must
    # be a complete OpenMetrics document (# EOF terminator, nothing after
    # it) and every sample needs an explicit timestamp
    samples, _meta, _ex, _created = parse_openmetrics_text(
        text, strict_eof=True, require_timestamps=True
    )
    if extra_labels:
        samples = [
            ({**labels, **extra_labels}, t, v) for labels, t, v in samples
        ]
    if not samples:
        return 0
    df = samples_from_rows(spark, samples)
    write_samples(df, path, bucket_ms=bucket_ms)
    return len(samples)


def backfill_rules(
    engine,
    rules: Iterable,
    start_ms: int,
    end_ms: int,
    interval_ms: int = 60_000,
) -> DataFrame:
    """Evaluate recording rules over [start, end] at ``interval`` and
    return their output in the canonical samples layout (append it with
    ``write_samples`` / union into an existing store).  Alerting rules
    are skipped, exactly like promtool (rules.go importRules docstring).
    """
    from prometheus_spark.model.labels import sig_expr
    from prometheus_spark.model.schema import METRIC_NAME_LABEL
    from prometheus_spark.streaming.rules import RecordingRule

    frames = []
    for rule in rules:
        if not isinstance(rule, RecordingRule):
            continue
        result = engine.range_query(rule.expr, start_ms, end_ms, interval_ms)
        drop_keys = [METRIC_NAME_LABEL, *rule.labels]
        labels = F.map_concat(
            F.map_filter(F.col("labels"), lambda k, _: ~k.isin(*drop_keys)),
            F.create_map(
                F.lit(METRIC_NAME_LABEL), F.lit(rule.record),
                *(x for k, v in rule.labels.items()
                  for x in (F.lit(k), F.lit(v))),
            ),
        )
        frames.append(
            result.select(
                labels.alias("labels"),
                F.lit(rule.record).alias("name"),
                "t",
                "value",
            ).select(
                sig_expr("labels").alias("sig"), "name", "labels", "t",
                "value", F.lit(False).alias("stale"),
            )
        )
    if not frames:
        raise ValueError("no recording rules to backfill")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
