from prometheus_spark.streaming.ingest import (
    ingest_events_stream,
    samples_stream_from_events,
    with_ooo_window,
)
from prometheus_spark.streaming.rulefmt import (
    RuleError,
    load_rule_file,
    parse_rule_groups,
)
from prometheus_spark.streaming.rule_deps import (
    ConcurrentRuleEvalController,
    build_dependency_map,
    split_group_into_batches,
)
from prometheus_spark.streaming.rules import (
    AlertingRule,
    RecordingRule,
    RuleGroup,
    RulesEngine,
    RulesManager,
)
from prometheus_spark.streaming.stateful import (
    streaming_counter_increase,
)
from prometheus_spark.streaming.windows import (
    streaming_exact_dedup,
    streaming_windowed_stats,
)

__all__ = [
    "AlertingRule",
    "ConcurrentRuleEvalController",
    "RecordingRule",
    "build_dependency_map",
    "split_group_into_batches",
    "RuleError",
    "RuleGroup",
    "RulesEngine",
    "RulesManager",
    "ingest_events_stream",
    "load_rule_file",
    "parse_rule_groups",
    "samples_stream_from_events",
    "streaming_counter_increase",
    "streaming_exact_dedup",
    "streaming_windowed_stats",
    "with_ooo_window",
]
