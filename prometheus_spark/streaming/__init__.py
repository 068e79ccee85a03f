from prometheus_spark.streaming.ingest import (
    ingest_events_stream,
    samples_stream_from_events,
    with_ooo_window,
)
from prometheus_spark.streaming.rules import (
    AlertingRule,
    RecordingRule,
    RuleGroup,
    RulesEngine,
)

__all__ = [
    "AlertingRule",
    "RecordingRule",
    "RuleGroup",
    "RulesEngine",
    "ingest_events_stream",
    "samples_stream_from_events",
    "with_ooo_window",
]
