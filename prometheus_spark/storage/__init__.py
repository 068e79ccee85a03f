from prometheus_spark.storage.compact import (
    apply_retention,
    compact_step,
    exponential_block_ranges,
    plan_compaction,
)
from prometheus_spark.storage.fanout import merge_samples
from prometheus_spark.storage.samples import (
    read_samples,
    samples_from_events,
    samples_from_rows,
    write_samples,
)

__all__ = [
    "apply_retention",
    "compact_step",
    "exponential_block_ranges",
    "merge_samples",
    "plan_compaction",
    "read_samples",
    "samples_from_events",
    "samples_from_rows",
    "write_samples",
]
