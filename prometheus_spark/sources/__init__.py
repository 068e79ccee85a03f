from prometheus_spark.sources.nhcb import classic_to_nhcb
from prometheus_spark.sources.openmetrics import (
    parse_openmetrics_df,
    parse_openmetrics_text,
)
from prometheus_spark.sources.promtext import parse_exposition_df, parse_exposition_text
from prometheus_spark.sources.relabel import RelabelConfig, apply_relabel

__all__ = [
    "classic_to_nhcb",
    "parse_exposition_df",
    "parse_exposition_text",
    "parse_openmetrics_df",
    "parse_openmetrics_text",
    "RelabelConfig",
    "apply_relabel",
]
