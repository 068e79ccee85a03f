from prometheus_spark.storage.fanout import merge_samples
from prometheus_spark.storage.samples import (
    read_samples,
    samples_from_events,
    samples_from_rows,
    write_samples,
)

__all__ = [
    "merge_samples",
    "read_samples",
    "samples_from_events",
    "samples_from_rows",
    "write_samples",
]
