from prometheus_spark.sources.promtext import parse_exposition_df, parse_exposition_text
from prometheus_spark.sources.relabel import RelabelConfig, apply_relabel

__all__ = [
    "parse_exposition_df",
    "parse_exposition_text",
    "RelabelConfig",
    "apply_relabel",
]
