"""Block compaction + retention (tsdb/compact.go, tsdb/db.go retention)."""

import os

from prometheus_spark.storage import samples_from_rows
from prometheus_spark.storage.compact import (
    apply_retention,
    compact_step,
    exponential_block_ranges,
    list_buckets,
    plan_compaction,
)
from prometheus_spark.storage.samples import write_samples

H2 = 7_200_000


def test_exponential_ranges():
    assert exponential_block_ranges(H2, 3, 5) == [H2, 5 * H2, 25 * H2]


def test_plan_groups_contiguous_buckets():
    # buckets 0-4 fill parent range [0,5), 5-6 partially fill [5,10)
    assert plan_compaction([0, 1, 2, 3, 4, 5, 6], H2) == [[0, 1, 2, 3, 4], [5, 6]]
    assert plan_compaction([0], H2) == []
    # buckets in different 10h windows merge at the next (50h) level
    assert plan_compaction([4, 5], H2) == [[4, 5]]


def test_compact_and_retention_roundtrip(spark, tmp_path):
    rows = []
    for b in range(6):  # 6 consecutive 2h buckets
        for i in range(3):
            rows.append((
                {"__name__": "m", "job": f"j{i}"}, b * H2 + i * 60_000, float(b)
            ))
    df = samples_from_rows(spark, rows)
    path = str(tmp_path / "blocks")
    write_samples(df, path)
    assert list_buckets(path) == [0, 1, 2, 3, 4, 5]

    n = compact_step(spark, path)
    assert n == 1  # [0..4] merge; bucket 5 has no partner in its window
    assert list_buckets(path) == [0, 5]

    # data survives byte-identical
    merged = spark.read.parquet(path)
    assert merged.count() == 18
    assert merged.filter("t_bucket = 0").count() == 15

    # retention at now = end of bucket 6, keep 1 block's worth:
    # cutoff = 7*H2 - 2*H2 = 5*H2 → bucket 0 block [0,5H2) expires...
    dropped = apply_retention(spark, path, retention_ms=2 * H2, now_ms=7 * H2)
    assert dropped == [0]
    assert list_buckets(path) == [5]
    assert spark.read.parquet(path).count() == 3


def test_retention_keeps_compacted_block_with_live_data(spark, tmp_path):
    # a compacted block named t_bucket=0 whose data extends to bucket 4
    # must survive a cutoff that only clears the name-implied range
    rows = [({"__name__": "m"}, b * H2 + 60_000, 1.0) for b in range(5)]
    path = str(tmp_path / "blocks")
    write_samples(samples_from_rows(spark, rows), path)
    compact_step(spark, path)  # [0..4] -> t_bucket=0
    assert list_buckets(path) == [0]
    dropped = apply_retention(spark, path, retention_ms=3 * H2, now_ms=6 * H2)
    assert dropped == []  # max(t) is in bucket 4, inside retention
    assert spark.read.parquet(path).count() == 5
