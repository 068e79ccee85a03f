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


def test_backfill_openmetrics_roundtrip(spark, tmp_path):
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import read_samples
    from prometheus_spark.storage.backfill import backfill_openmetrics

    om = (
        "# TYPE http_requests counter\n"
        "http_requests_total{job=\"api\"} 10 100\n"
        "http_requests_total{job=\"api\"} 20 160\n"
        "http_requests_total{job=\"web\"} 5 100\n"
        "# EOF\n"
    )
    out = str(tmp_path / "om_store")
    n = backfill_openmetrics(spark, om, out)
    assert n == 3
    eng = PromQLEngine(spark, read_samples(spark, out))
    rows = eng.instant_query("http_requests_total", 200_000).collect()
    got = {r["labels"]["job"]: r["value"] for r in rows}
    assert got == {"api": 20.0, "web": 5.0}


def test_backfill_rules(spark, tmp_path):
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import (
        read_samples,
        samples_from_rows,
        write_samples,
    )
    from prometheus_spark.storage.backfill import backfill_rules
    from prometheus_spark.streaming.rules import AlertingRule, RecordingRule

    M = 60_000
    rows = []
    for i in range(11):
        rows.append(({"__name__": "errors", "job": "a"}, i * M, float(i)))
        rows.append(({"__name__": "errors", "job": "b"}, i * M, 2.0 * i))
    store = str(tmp_path / "src")
    write_samples(samples_from_rows(spark, rows), store)
    eng = PromQLEngine(spark, read_samples(spark, store))
    out = backfill_rules(
        eng,
        [RecordingRule("job:errors:sum", "sum by (job) (errors)",
                       labels={"source": "backfill"}),
         AlertingRule("Ignored", "errors > 5")],  # alerting rules skipped
        start_ms=5 * M, end_ms=10 * M, interval_ms=M,
    )
    got = out.collect()
    # 2 jobs x 6 steps
    assert len(got) == 12
    assert all(r["name"] == "job:errors:sum" for r in got)
    assert all(r["labels"]["source"] == "backfill" for r in got)
    by = {(r["labels"]["job"], r["t"]): r["value"] for r in got}
    assert by[("a", 10 * M)] == 10.0 and by[("b", 10 * M)] == 20.0
    # output appends back into a store and is queryable
    dest = str(tmp_path / "dest")
    write_samples(out, dest)
    eng2 = PromQLEngine(spark, read_samples(spark, dest))
    r = eng2.instant_query('job:errors:sum{job="b"}', 10 * M).collect()
    assert len(r) == 1 and r[0]["value"] == 20.0
