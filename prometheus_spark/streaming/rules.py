"""Rules engine — the reference's streaming layer (SURVEY §2.8).

Recording rules are periodically-materialized queries appended back to
storage (reference: rules/recording.go, rules/group.go:504 ``Group.Eval``);
alerting rules add a pending→firing state machine keyed by alert label
hash (rules/alerting.go:387) plus ``ALERTS``/``ALERTS_FOR_STATE`` series.
Series that vanish between consecutive evaluations get staleness markers
(rules/group.go:504 region, seriesInPreviousEval diff).

Spark-first: each trigger tick is one batch evaluation of the instant
query at an interval-aligned timestamp (rules/group.go:422
``EvalTimestamp``).  ``RulesEngine.eval_tick`` is the pure batch core;
``RulesEngine.stream`` wires it to a Structured Streaming trigger via
``foreachBatch`` — the rules clock is the trigger, state lives in the
engine's state DataFrames (checkpointed by the caller's sink).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_spark.model.labels import sig_expr
from prometheus_spark.model.schema import METRIC_NAME_LABEL


@dataclass
class RecordingRule:
    record: str  # output metric name
    expr: str  # PromQL
    labels: dict[str, str] = field(default_factory=dict)


@dataclass
class AlertingRule:
    alert: str  # alert name
    expr: str  # PromQL; firing when the vector is non-empty
    for_ms: int = 0
    keep_firing_for_ms: int = 0
    labels: dict[str, str] = field(default_factory=dict)


@dataclass
class RuleGroup:
    name: str
    interval_ms: int
    rules: list = field(default_factory=list)

    def eval_timestamp(self, ts_ms: int) -> int:
        """Align to the interval grid (rules/group.go:422)."""
        return ts_ms - (ts_ms % self.interval_ms)


class RulesEngine:
    """Evaluates rule groups against a samples table and accumulates
    output samples + alert state.

    State tables (driver-visible, small: one row per active alert /
    previously-seen series) are plain DataFrames collected per tick —
    alert cardinality is bounded by alerting-rule result sizes, which the
    reference also materializes in memory."""

    def __init__(self, spark: SparkSession, samples: DataFrame, lookback_ms: int = 300_000):
        from prometheus_spark.engine import PromQLEngine

        self.spark = spark
        self.engine = PromQLEngine(spark, samples, lookback_ms=lookback_ms)
        # alert state: sig -> (labels, active_since_ms, state)
        self._alert_state: dict[str, dict] = {}
        # previous eval's output sigs per rule (for staleness emission)
        self._prev_series: dict[str, dict[str, dict]] = {}

    # -- batch core ---------------------------------------------------------
    def eval_tick(self, group: RuleGroup, ts_ms: int) -> tuple[list, list]:
        """Evaluate all rules in the group at the aligned timestamp.

        Returns (samples_rows, alert_rows):
        - samples_rows: (labels: dict, t: int, value: float, stale: bool)
          for recording-rule outputs, ALERTS series, and staleness markers
        - alert_rows: (alertname, labels, state, active_since_ms)
        """
        ts = group.eval_timestamp(ts_ms)
        out_rows: list = []
        alert_rows: list = []
        for rule in group.rules:
            if isinstance(rule, RecordingRule):
                out_rows += self._eval_recording(group, rule, ts)
            elif isinstance(rule, AlertingRule):
                s, a = self._eval_alerting(group, rule, ts)
                out_rows += s
                alert_rows += a
        return out_rows, alert_rows

    def _eval_recording(self, group: RuleGroup, rule: RecordingRule, ts: int) -> list:
        result = self.engine.instant_query(rule.expr, ts).collect()
        key = f"{group.name}/{rule.record}"
        rows = []
        seen: dict[str, dict] = {}
        for r in result:
            labels = dict(r["labels"])
            labels[METRIC_NAME_LABEL] = rule.record
            labels.update(rule.labels)
            from prometheus_spark.model.labels import sig_for

            seen[sig_for(labels)] = labels
            rows.append((labels, ts, float(r["value"]), False))
        # staleness for series that vanished since the previous eval
        for sig, labels in self._prev_series.get(key, {}).items():
            if sig not in seen:
                rows.append((labels, ts, None, True))
        self._prev_series[key] = seen
        return rows

    def _eval_alerting(self, group: RuleGroup, rule: AlertingRule, ts: int):
        from prometheus_spark.model.labels import sig_for

        result = self.engine.instant_query(rule.expr, ts).collect()
        firing_now: dict[str, dict] = {}
        for r in result:
            labels = dict(r["labels"])
            labels.pop(METRIC_NAME_LABEL, None)
            labels["alertname"] = rule.alert
            labels.update(rule.labels)
            firing_now[sig_for(labels)] = labels

        samples: list = []
        alerts: list = []
        # advance / create states
        for sig, labels in firing_now.items():
            st = self._alert_state.get(sig)
            if st is None:
                st = {"labels": labels, "active_since": ts, "state": "pending"}
                self._alert_state[sig] = st
            if st["state"] in ("pending", "firing"):
                held = ts - st["active_since"]
                if st["state"] == "pending" and held >= rule.for_ms:
                    st["state"] = "firing"
            st["last_seen"] = ts

        # expire / resolve
        for sig in list(self._alert_state):
            st = self._alert_state[sig]
            if st["labels"].get("alertname") != rule.alert:
                continue
            if sig not in firing_now:
                if (
                    st["state"] == "firing"
                    and rule.keep_firing_for_ms > 0
                    and ts - st.get("last_seen", ts) <= rule.keep_firing_for_ms
                ):
                    pass  # keep firing through flaps
                else:
                    # emit staleness for the ALERTS series and drop state
                    alabels = dict(st["labels"])
                    alabels[METRIC_NAME_LABEL] = "ALERTS"
                    alabels["alertstate"] = st["state"]
                    samples.append((alabels, ts, None, True))
                    del self._alert_state[sig]
                    continue
            alabels = dict(st["labels"])
            alabels[METRIC_NAME_LABEL] = "ALERTS"
            alabels["alertstate"] = st["state"]
            samples.append((alabels, ts, 1.0, False))
            alerts.append((rule.alert, st["labels"], st["state"], st["active_since"]))
        return samples, alerts

    # -- streaming wiring -----------------------------------------------------
    def stream(
        self,
        group: RuleGroup,
        append_fn,
        trigger_seconds: Optional[float] = None,
        now_fn=None,
    ):
        """Run the group on a Structured Streaming trigger.  Each trigger
        tick calls ``eval_tick(now)`` and hands the produced rows to
        ``append_fn(samples_rows, alert_rows)`` — the caller's sink (e.g.
        append to the samples parquet, remote-write, notify).

        The rate source is a 1-row-per-trigger clock; the rules engine
        evaluates against the (continuously updated) samples table like
        the reference's rule manager ticks against TSDB."""
        import time

        now_fn = now_fn or (lambda: int(time.time() * 1000))
        clock = (
            self.spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        )

        def on_tick(batch_df, batch_id):
            samples_rows, alert_rows = self.eval_tick(group, now_fn())
            append_fn(samples_rows, alert_rows)

        writer = clock.writeStream.foreachBatch(on_tick).outputMode("append")
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
