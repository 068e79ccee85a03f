from prometheus_spark.sources.federate import federate
from prometheus_spark.sources.nhcb import classic_to_nhcb
from prometheus_spark.sources.remote_write import (
    RemoteWriteReceiver,
    decode_write_request,
    encode_write_request,
    send_write_request,
    spool_to_samples,
)
from prometheus_spark.sources.openmetrics import (
    parse_openmetrics_df,
    parse_openmetrics_text,
)
from prometheus_spark.sources.promtext import parse_exposition_df, parse_exposition_text
from prometheus_spark.sources.relabel import RelabelConfig, apply_relabel

__all__ = [
    "RemoteWriteReceiver",
    "classic_to_nhcb",
    "decode_write_request",
    "encode_write_request",
    "federate",
    "send_write_request",
    "spool_to_samples",
    "parse_exposition_df",
    "parse_exposition_text",
    "parse_openmetrics_df",
    "parse_openmetrics_text",
    "RelabelConfig",
    "apply_relabel",
]
