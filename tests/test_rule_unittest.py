"""Rule unit-test runner (promtool test rules, cmd/promtool/unittest.go)."""

import textwrap

import pytest

from prometheus_spark.testing.rule_unittest import (
    run_rule_test_file,
    run_rule_test_text,
)

ALERT_RULES = """
groups:
- name: example
  rules:
  - alert: InstanceDown
    expr: up == 0
    for: 5m
    labels:
      severity: page
    annotations:
      summary: "Instance {{ $labels.instance }} down"
      description: "{{ $labels.instance }} of job {{ $labels.job }} has been down for more than 5 minutes."
"""

RECORDING_RULES = """
groups:
- name: recording
  interval: 1m
  rules:
  - record: job:m:sum
    expr: sum by (job) (m)
  - record: job:m:sum2x
    expr: job:m:sum * 2
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return p


def test_alert_rule_test_firing_with_annotations(spark, tmp_path):
    """The promtool docs example: up==0 for 5m → firing at 10m with
    templated annotations; still pending (no firing alerts) at 4m."""
    _write(tmp_path, "alerts.yml", ALERT_RULES)
    test_yml = _write(
        tmp_path,
        "test.yml",
        """
        rule_files:
          - alerts.yml
        evaluation_interval: 1m
        tests:
          - interval: 1m
            input_series:
              - series: 'up{job="prometheus", instance="localhost:9090"}'
                values: '0 0 0 0 0 0 0 0 0 0 0'
            alert_rule_test:
              - eval_time: 4m
                alertname: InstanceDown
                exp_alerts: []
              - eval_time: 10m
                alertname: InstanceDown
                exp_alerts:
                  - exp_labels:
                      severity: page
                      instance: localhost:9090
                      job: prometheus
                    exp_annotations:
                      summary: "Instance localhost:9090 down"
                      description: "localhost:9090 of job prometheus has been down for more than 5 minutes."
        """,
    )
    assert run_rule_test_file(spark, str(test_yml)) == []


def test_alert_rule_test_failure_reported(spark, tmp_path):
    _write(tmp_path, "alerts.yml", ALERT_RULES)
    test_yml = _write(
        tmp_path,
        "test.yml",
        """
        rule_files:
          - alerts.yml
        tests:
          - input_series:
              - series: 'up{job="prometheus", instance="x"}'
                values: '1 1 1 1 1 1'
            alert_rule_test:
              - eval_time: 5m
                alertname: InstanceDown
                exp_alerts:
                  - exp_labels: {job: prometheus, instance: x, severity: page}
        """,
    )
    errs = run_rule_test_file(spark, str(test_yml))
    assert len(errs) == 1 and "InstanceDown" in errs[0]


def test_chained_recording_rules_and_expr_test(spark, tmp_path):
    """Two recording rules in ONE group where the second reads the
    first's output — requires sequential append within the group
    (rules/group.go Eval)."""
    _write(tmp_path, "rules.yml", RECORDING_RULES)
    test_yml = _write(
        tmp_path,
        "test.yml",
        """
        rule_files:
          - rules.yml
        evaluation_interval: 1m
        tests:
          - input_series:
              - series: 'm{job="a", i="1"}'
                values: '1+0x10'
              - series: 'm{job="a", i="2"}'
                values: '2+0x10'
            promql_expr_test:
              - expr: job:m:sum
                eval_time: 3m
                exp_samples:
                  - labels: 'job:m:sum{job="a"}'
                    value: 3
              - expr: job:m:sum2x
                eval_time: 3m
                exp_samples:
                  - labels: 'job:m:sum2x{job="a"}'
                    value: 6
        """,
    )
    assert run_rule_test_file(spark, str(test_yml)) == []


def test_alerts_series_queryable(spark, tmp_path):
    """ALERTS / ALERTS_FOR_STATE are appended by alert evaluation and
    queryable from promql_expr_test (alerting.go sample/forStateSample)."""
    _write(tmp_path, "alerts.yml", ALERT_RULES)
    test_yml = _write(
        tmp_path,
        "test.yml",
        """
        rule_files:
          - alerts.yml
        tests:
          - input_series:
              - series: 'up{job="p", instance="i"}'
                values: '0x10'
            promql_expr_test:
              - expr: count(ALERTS{alertstate="firing"})
                eval_time: 7m
                exp_samples:
                  - labels: '{}'
                    value: 1
              - expr: ALERTS_FOR_STATE{alertname="InstanceDown"}
                eval_time: 7m
                exp_samples:
                  - labels: 'ALERTS_FOR_STATE{alertname="InstanceDown", job="p", instance="i", severity="page"}'
                    value: 0
        """,
    )
    assert run_rule_test_file(spark, str(test_yml)) == []


def test_missing_alertname_rejected(spark):
    errs = run_rule_test_text(
        spark,
        textwrap.dedent(
            """
            tests:
              - input_series: []
                alert_rule_test:
                  - eval_time: 1m
            """
        ),
    )
    assert errs and "alertname" in errs[0]


def test_keep_firing_for(spark, tmp_path):
    """keep_firing_for holds a firing alert through flaps, measured
    from the first missing eval (alerting.go:487-498)."""
    _write(
        tmp_path,
        "alerts.yml",
        """
        groups:
        - name: g
          rules:
          - alert: Flappy
            expr: sig > 0
            keep_firing_for: 2m
        """,
    )
    test_yml = _write(
        tmp_path,
        "test.yml",
        """
        rule_files:
          - alerts.yml
        tests:
          - input_series:
              - series: 'sig'
                values: '1 1 0 0 0 0'
            alert_rule_test:
              # at 2m the expr no longer fires but keep_firing_for holds it
              - eval_time: 2m
                alertname: Flappy
                exp_alerts:
                  - exp_labels: {}
              - eval_time: 3m
                alertname: Flappy
                exp_alerts:
                  - exp_labels: {}
              # 2m after the first miss (at 2m) the hold expires
              - eval_time: 4m
                alertname: Flappy
                exp_alerts: []
        """,
    )
    assert run_rule_test_file(spark, str(test_yml)) == []


def test_template_expansion():
    from prometheus_spark.streaming.templating import expand_template

    labels = {"instance": "i1", "job": "api"}
    assert (
        expand_template("{{ $labels.instance }} of {{ $labels.job }}", labels, 1.5)
        == "i1 of api"
    )
    assert expand_template("v={{ $value }}", labels, 42.0) == "v=42"
    assert expand_template("v={{ $value }}", labels, 1.25) == "v=1.25"
    assert expand_template("{{ $value | humanize }}", labels, 1_500_000) == "1.5M"
    assert expand_template("{{ humanize $value }}", labels, 0.0015) == "1.5m"
    assert (
        expand_template("{{ $value | humanizePercentage }}", labels, 0.123) == "12.3%"
    )
    assert (
        expand_template("{{ $value | humanizeDuration }}", labels, 3661) == "1h 1m 1s"
    )
    assert expand_template("{{ $labels.missing }}!", labels, 0) == "!"
    # control structures execute (round 7: full template interpreter);
    # ranging over the alert-data struct is a template error, rendered
    # with the reference's error marker (rules/alerting.go:429)
    assert expand_template(
        "{{ range .Labels }}x{{ end }}", labels, 0
    ) == "x" * len(labels)
    assert expand_template("{{ range .Value }}x{{ end }}", labels, 0).startswith(
        "<error expanding template:"
    )
    assert expand_template("plain", labels, 0) == "plain"


def test_alert_annotation_query_and_re_replace(spark, tmp_path):
    """Round-7 template surface: {{ query ... | first | value }} and
    reReplaceAll inside alert annotations (template/template.go funcmap)
    expand against the rule evaluator's own engine."""
    _write(
        tmp_path,
        "alerts.yml",
        """
        groups:
        - name: example
          rules:
          - alert: InstanceDown
            expr: up == 0
            labels:
              host: '{{ reReplaceAll ":\\\\d+" "" $labels.instance }}'
            annotations:
              others: '{{ query "sum(up)" | first | value }} up total'
              cond: '{{ if eq $labels.job "prometheus" }}core{{ else }}edge{{ end }}'
        """,
    )
    test_yml = _write(
        tmp_path,
        "test.yml",
        """
        rule_files:
          - alerts.yml
        evaluation_interval: 1m
        tests:
          - interval: 1m
            input_series:
              - series: 'up{job="prometheus", instance="localhost:9090"}'
                values: '0 0 0'
              - series: 'up{job="other", instance="x:1"}'
                values: '1 1 1'
            alert_rule_test:
              - eval_time: 2m
                alertname: InstanceDown
                exp_alerts:
                  - exp_labels:
                      instance: localhost:9090
                      job: prometheus
                      host: localhost
                    exp_annotations:
                      others: "1 up total"
                      cond: "core"
        """,
    )
    assert run_rule_test_file(spark, str(test_yml)) == []


def test_exp_samples_histogram_literals(spark, tmp_path):
    """exp_samples entries may carry native-histogram {{...}} literals
    (promtool unittest.yml's histogram cases) — previously they were
    read as value 0 and histogram results compared as None."""
    test_yml = _write(
        tmp_path,
        "test.yml",
        """
        evaluation_interval: 1m
        tests:
          - interval: 1m
            input_series:
              - series: test_histogram
                values: '{{schema:1 sum:-0.3 count:32.1 z_bucket:7.1 z_bucket_w:0.05 buckets:[5.1 10 7] offset:-3 n_buckets:[4.1 5] n_offset:-5}}'
              - series: test_histogram_repeat
                values: '{{sum:3 count:2 buckets:[2]}}x2'
            promql_expr_test:
              - expr: test_histogram
                eval_time: 1m
                exp_samples:
                  - labels: 'test_histogram'
                    histogram: '{{schema:1 sum:-0.3 count:32.1 z_bucket:7.1 z_bucket_w:0.05 buckets:[5.1 10 7] offset:-3 n_buckets:[4.1 5] n_offset:-5}}'
              - expr: test_histogram_repeat
                eval_time: 2m
                exp_samples:
                  - labels: 'test_histogram_repeat'
                    histogram: '{{count:2 sum:3 buckets:[2]}}'
              # a WRONG expectation must fail
              - expr: test_histogram_repeat
                eval_time: 2m
                exp_samples:
                  - labels: 'test_histogram_repeat'
                    histogram: '{{count:9 sum:3 buckets:[9]}}'
        """,
    )
    errs = run_rule_test_file(spark, str(test_yml))
    assert len(errs) == 1  # only the deliberately wrong case fails
