from prometheus_spark.model.schema import SAMPLE_SCHEMA, HISTOGRAM_TYPE
from prometheus_spark.model.labels import (
    sig_expr,
    sig_for,
    match_sig_expr,
    group_labels_expr,
)

__all__ = [
    "SAMPLE_SCHEMA",
    "HISTOGRAM_TYPE",
    "sig_expr",
    "sig_for",
    "match_sig_expr",
    "group_labels_expr",
]
