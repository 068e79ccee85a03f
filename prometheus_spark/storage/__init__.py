from prometheus_spark.storage.samples import (
    samples_from_rows,
    samples_from_events,
    write_samples,
    read_samples,
)

__all__ = [
    "samples_from_rows",
    "samples_from_events",
    "write_samples",
    "read_samples",
]
