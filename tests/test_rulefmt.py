"""Rule-file parsing tests (model/rulefmt parity)."""

import pytest

from prometheus_spark.streaming import (
    AlertingRule,
    RecordingRule,
    RuleError,
    parse_rule_groups,
)

GOOD = """
groups:
  - name: example
    interval: 30s
    rules:
      - record: job:http_requests:rate5m
        expr: sum by (job) (rate(http_requests_total[5m]))
        labels:
          team: sre
      - alert: HighErrorRate
        expr: job:errors:rate5m > 0.5
        for: 10m
        keep_firing_for: 5m
        labels:
          severity: page
        annotations:
          summary: error rate too high
  - name: defaults
    rules:
      - record: up:count
        expr: count(up)
"""


def test_parse_good_file():
    groups = parse_rule_groups(GOOD)
    assert [g.name for g in groups] == ["example", "defaults"]
    g = groups[0]
    assert g.interval_ms == 30_000
    rec, alert = g.rules
    assert isinstance(rec, RecordingRule)
    assert rec.record == "job:http_requests:rate5m"
    assert rec.labels == {"team": "sre"}
    assert isinstance(alert, AlertingRule)
    assert alert.for_ms == 600_000 and alert.keep_firing_for_ms == 300_000
    assert alert.labels == {"severity": "page"}
    # group without interval gets the 1m default
    assert groups[1].interval_ms == 60_000


@pytest.mark.parametrize(
    "body,msg",
    [
        ("groups: {}", "groups"),
        ("groups:\n - rules: []", "name"),
        (
            "groups:\n - name: a\n - name: a",
            "repeated",
        ),
        (
            "groups:\n - name: a\n   rules:\n    - expr: up",
            "record",
        ),
        (
            "groups:\n - name: a\n   rules:\n    - record: x\n      alert: y\n      expr: up",
            "exactly one",
        ),
        (
            "groups:\n - name: a\n   rules:\n    - record: x\n      expr: 'up{'",
            "bad expr",
        ),
        (
            "groups:\n - name: a\n   rules:\n    - record: x\n      expr: up\n      for: 5m",
            "must not have",
        ),
        (
            "groups:\n - name: a\n   rules:\n    - record: 0bad\n      expr: up",
            "invalid recording rule name",
        ),
        (
            "groups:\n - name: a\n   rules:\n    - record: x\n      expr: up\n      labels: {'0l': v}",
            "invalid label name",
        ),
    ],
)
def test_parse_rejects(body, msg):
    with pytest.raises(RuleError, match=msg):
        parse_rule_groups(body)


def test_rules_engine_runs_loaded_group(spark):
    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.streaming import RulesEngine

    groups = parse_rule_groups(
        """
groups:
  - name: g
    interval: 1m
    rules:
      - record: job:m:sum
        expr: sum by (job) (m)
"""
    )
    rows = [({"__name__": "m", "job": "a"}, 60_000, 2.0),
            ({"__name__": "m", "job": "a", "i": "2"}, 60_000, 3.0)]
    eng = RulesEngine(spark, samples_from_rows(spark, rows))
    out, alerts = eng.eval_tick(groups[0], 60_000)
    rs = out.collect()
    assert alerts == [] and len(rs) == 1
    assert rs[0]["value"] == 5.0 and rs[0]["name"] == "job:m:sum"


def test_promlint():
    from prometheus_spark.sources.promlint import lint_exposition

    text = (
        "# TYPE requests counter\n"
        "# HELP requests total requests\n"
        "requests 5\n"
        "# TYPE mem_kilobytes gauge\n"
        "# HELP mem_kilobytes memory\n"
        "mem_kilobytes 12\n"
        "# TYPE latency_seconds gauge\n"
        "# HELP latency_seconds latency\n"
        "latency_seconds{someLabel=\"x\"} 1\n"
        "no_help_metric 1\n"
    )
    probs = {(p.metric, p.text) for p in lint_exposition(text)}
    assert ("requests", 'counter metrics should have "_total" suffix') in probs
    assert ("mem_kilobytes", 'use base unit "bytes" instead of "kilobytes"') in probs
    assert ("no_help_metric", "no help text") in probs
    assert any("someLabel" in t for _, t in probs)
    # clean input -> no problems
    clean = (
        "# TYPE http_requests_total counter\n"
        "# HELP http_requests_total requests\n"
        "http_requests_total 5\n"
    )
    assert lint_exposition(clean) == []
