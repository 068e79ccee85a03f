from prometheus_spark.storage.compact import (
    apply_retention,
    compact_step,
    exponential_block_ranges,
    plan_compaction,
)
from prometheus_spark.storage.fanout import merge_samples
from prometheus_spark.storage.series_dim import (
    build_series_dim,
    merge_series_dim,
    read_series_dim,
    write_series_dim,
)
from prometheus_spark.storage.samples import (
    read_samples,
    samples_from_events,
    samples_from_rows,
    write_samples,
)
from prometheus_spark.storage.tsdb_block import (
    read_block,
    read_data_dir,
    write_block,
)
from prometheus_spark.storage.wal import read_wal

__all__ = [
    "apply_retention",
    "compact_step",
    "exponential_block_ranges",
    "merge_samples",
    "plan_compaction",
    "build_series_dim",
    "merge_series_dim",
    "read_block",
    "read_data_dir",
    "read_samples",
    "read_wal",
    "read_series_dim",
    "write_block",
    "samples_from_events",
    "samples_from_rows",
    "write_samples",
    "write_series_dim",
]
