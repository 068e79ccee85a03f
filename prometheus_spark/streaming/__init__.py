from prometheus_spark.streaming.rules import (
    AlertingRule,
    RecordingRule,
    RuleGroup,
    RulesEngine,
)

__all__ = ["AlertingRule", "RecordingRule", "RuleGroup", "RulesEngine"]
