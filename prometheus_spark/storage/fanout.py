"""Fanout/merge across multiple sample sources.

Reference: storage/fanout.go:29 (primary + secondaries behave as one
storage) and storage/merge.go (merge querier: series from all sources,
duplicate (series, timestamp) samples collapsed, preferring the
first/primary source).

Spark-first: a union of canonical samples frames plus one window over
(sig, t) ordered by source priority — a single shuffle keyed exactly
like every other per-series operation, so at scale it co-partitions with
downstream selectors.  NaN-aware: a real value from a lower-priority
source beats NaN from a higher one (merge.go's sample preference).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prometheus_spark.model.schema import HISTOGRAM_TYPE


def _normalize(df: DataFrame) -> DataFrame:
    if "hist" not in df.columns:
        df = df.withColumn("hist", F.lit(None).cast(HISTOGRAM_TYPE))
    return df.select("sig", "name", "labels", "t", "value", "hist", "stale")


def merge_samples(sources: Sequence[DataFrame], dedupe: bool = True) -> DataFrame:
    """Union sample sources into one logical storage.

    ``dedupe`` keeps exactly one sample per (series, timestamp): sources
    are prioritized by list order (first = primary, fanout.go semantics),
    and within a source a non-NaN value wins over NaN."""
    if not sources:
        raise ValueError("merge_samples needs at least one source")
    frames = [
        _normalize(df).withColumn("__src", F.lit(i)) for i, df in enumerate(sources)
    ]
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    if not dedupe:
        return merged.drop("__src")
    w = Window.partitionBy("sig", "t").orderBy(
        F.when(F.isnan(F.coalesce(F.col("value"), F.lit(0.0))), 1).otherwise(0),
        F.col("__src"),
        F.col("value"),  # deterministic pick among equal-priority dups
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
