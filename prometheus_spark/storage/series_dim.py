"""Series-dimension table — the postings-index role for metadata APIs.

The reference answers ``/api/v1/labels``, ``/series`` and
``/label/<name>/values`` from the TSDB inverted index
(tsdb/index/postings.go) — never by scanning samples.  The Spark-native
equivalent is a compacted dimension table with ONE ROW PER SERIES:

    (sig, labels, name, min_t, max_t)

maintained at write/compaction time (storage.write_samples /
storage.compact hooks).  At 100 TB the samples store holds trillions of
rows but only millions of distinct series — metadata queries against
the dimension table are a small-table scan with the same matcher
pushdown (hot ``name`` column), while an unscoped ``distinct()`` over
the samples store would be a full-corpus shuffle.

``min_t``/``max_t`` bound each series' sample presence so time-scoped
metadata requests prune by overlap, mirroring the reference's per-block
index ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_series_dim(samples: DataFrame) -> DataFrame:
    """Aggregate a samples frame down to one row per series.

    One shuffle keyed by ``sig`` whose input is column-pruned to
    (sig, labels, name, t) — the wide value/hist columns never move.
    """
    return (
        samples.select("sig", "labels", "name", "t")
        .groupBy("sig")
        .agg(
            F.expr("first(labels)").alias("labels"),
            F.expr("first(name)").alias("name"),
            F.expr("min(t)").alias("min_t"),
            F.expr("max(t)").alias("max_t"),
        )
    )


def merge_series_dim(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a new batch's dimension rows into the existing table —
    min/max ranges widen, labels are identical by construction (sig is
    the canonical label signature)."""
    return (
        existing.unionByName(delta)
        .groupBy("sig")
        .agg(
            F.expr("first(labels)").alias("labels"),
            F.expr("first(name)").alias("name"),
            F.expr("min(min_t)").alias("min_t"),
            F.expr("max(max_t)").alias("max_t"),
        )
    )


def write_series_dim(dim: DataFrame, path: str) -> None:
    """Persist partitioned by metric name: name-equality matchers (the
    overwhelmingly common scoping) prune to one partition."""
    dim.write.mode("overwrite").partitionBy("name").parquet(path)


def read_series_dim(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
