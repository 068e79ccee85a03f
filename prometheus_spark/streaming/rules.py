"""Rules engine — the reference's streaming layer (SURVEY §2.8).

Recording rules are periodically-materialized queries appended back to
storage (reference: rules/recording.go, rules/group.go:504 ``Group.Eval``);
alerting rules add a pending→firing state machine keyed by alert label
hash (rules/alerting.go:387) plus ``ALERTS``/``ALERTS_FOR_STATE`` series.
Series that vanish between consecutive evaluations get staleness markers
(rules/group.go:504 region, seriesInPreviousEval diff).

Spark-first: each trigger tick is one batch evaluation of the instant
query at an interval-aligned timestamp (rules/group.go:422
``EvalTimestamp``).  Recording-rule output NEVER lands on the driver —
``eval_tick`` returns a samples-schema DataFrame the caller appends to
storage, and the vanished-series diff is a distributed anti-join against
the previous tick's (cached) output signature frame.  Only *alert* state
is driver-side, whose cardinality is bounded by firing alerts (the
reference also materializes those in memory).
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


def _with_rule_labels(result: DataFrame, name: str, extra: dict[str, str]) -> DataFrame:
    """Rewrite the result's label map: __name__ := rule output name, then
    overlay the rule's static labels — all columnar."""
    override = {METRIC_NAME_LABEL: name, **extra}
    keep = F.map_filter(
        F.col("labels"), lambda k, _: ~k.isin(*[F.lit(x) for x in override])
    )
    entries: list = []
    for k, v in override.items():
        entries += [F.lit(k), F.lit(v)]
    labels = F.map_concat(keep, F.create_map(*entries))
    return result.withColumn("labels", labels)


def _as_samples(df: DataFrame, ts: int) -> DataFrame:
    """Normalize a query result to the canonical samples layout."""
    cols = [
        sig_expr("labels").alias("sig"),
        F.element_at("labels", METRIC_NAME_LABEL).alias("name"),
        F.col("labels"),
        F.lit(ts).cast("long").alias("t"),
        F.col("value").cast("double").alias("value"),
        F.lit(False).alias("stale"),
    ]
    return df.select(*cols)


class RulesEngine:
    """Evaluates rule groups against a samples table.

    ``eval_tick`` returns ``(samples_df, alert_rows)``: the DataFrame is
    the distributed append payload (recording outputs + staleness markers
    + ALERTS series); ``alert_rows`` is the small driver-side alert-state
    snapshot."""

    def __init__(self, spark: SparkSession, samples: DataFrame, lookback_ms: int = 300_000):
        from prometheus_spark.engine import PromQLEngine

        self.spark = spark
        self.engine = PromQLEngine(spark, samples, lookback_ms=lookback_ms)
        # alert state: sig -> (labels, active_since_ms, state) — bounded
        self._alert_state: dict[str, dict] = {}
        # previous eval's (sig, labels) frame per recording rule, cached —
        # one row per output series, never collected
        self._prev_series: dict[str, DataFrame] = {}

    # -- batch core ---------------------------------------------------------
    def eval_tick(self, group: RuleGroup, ts_ms: int) -> tuple[Optional[DataFrame], list]:
        """Evaluate all rules in the group at the aligned timestamp.

        Returns (samples_df, alert_rows):
        - samples_df: canonical samples frame (sig, name, labels, t,
          value, stale) with recording-rule outputs, ALERTS series, and
          staleness markers — or None when nothing was produced
        - alert_rows: (alertname, labels, state, active_since_ms)
        """
        ts = group.eval_timestamp(ts_ms)
        frames: list[DataFrame] = []
        alert_sample_rows: list = []
        alert_rows: list = []
        for rule in group.rules:
            if isinstance(rule, RecordingRule):
                frames.append(self._eval_recording(group, rule, ts))
            elif isinstance(rule, AlertingRule):
                s, a = self._eval_alerting(group, rule, ts)
                alert_sample_rows += s
                alert_rows += a
        if alert_sample_rows:
            from prometheus_spark.storage import samples_from_rows

            value_rows = [
                (labels, t, v) for labels, t, v, stale in alert_sample_rows if not stale
            ]
            stale_rows = [
                (labels, t) for labels, t, v, stale in alert_sample_rows if stale
            ]
            alerts_df = samples_from_rows(self.spark, value_rows, stale_rows)
            frames.append(alerts_df.drop("hist"))
        if not frames:
            return None, alert_rows
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out, alert_rows

    def _eval_recording(self, group: RuleGroup, rule: RecordingRule, ts: int) -> DataFrame:
        key = f"{group.name}/{rule.record}"
        result = _with_rule_labels(
            self.engine.instant_query(rule.expr, ts).select("labels", "value"),
            rule.record,
            rule.labels,
        )
        current = _as_samples(result, ts)
        # pin this tick's output so the next tick's anti-join (and the
        # caller's append) don't re-run the query
        current = current.persist()
        prev = self._prev_series.get(key)
        out = current
        if prev is not None:
            # staleness markers for series that vanished since last tick:
            # distributed anti-join, no driver materialization
            vanished = prev.join(current.select("sig"), "sig", "left_anti")
            stale = vanished.select(
                "sig",
                "name",
                "labels",
                F.lit(ts).cast("long").alias("t"),
                F.lit(None).cast("double").alias("value"),
                F.lit(True).alias("stale"),
            )
            out = current.unionByName(stale)
            prev.unpersist()
        self._prev_series[key] = current.select("sig", "name", "labels")
        return out

    def _eval_alerting(self, group: RuleGroup, rule: AlertingRule, ts: int):
        from prometheus_spark.model.labels import sig_for

        # alert-rule results are bounded by firing cardinality — the one
        # place a driver collect is the right call (mirrors the reference
        # keeping active alerts in memory, rules/alerting.go:387)
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
        tick calls ``eval_tick(now)`` and hands the produced frame to
        ``append_fn(samples_df, alert_rows)`` — the caller's sink (e.g.
        ``df.write.mode("append")`` into the samples store, remote-write,
        notify).  The frame is appended distributedly; nothing crosses
        the driver except alert state.

        The rate source is a 1-row-per-trigger clock; the rules engine
        evaluates against the (continuously updated) samples table like
        the reference's rule manager ticks against TSDB."""
        import time

        now_fn = now_fn or (lambda: int(time.time() * 1000))
        clock = (
            self.spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        )

        def on_tick(batch_df, batch_id):
            samples_df, alert_rows = self.eval_tick(group, now_fn())
            append_fn(samples_df, alert_rows)

        writer = clock.writeStream.foreachBatch(on_tick).outputMode("append")
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
