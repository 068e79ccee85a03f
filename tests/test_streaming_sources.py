"""Tests for the rules engine, exposition parser, and relabeling."""

import pytest
from pyspark.sql import functions as F

from prometheus_spark.storage import samples_from_rows

M = 60_000


# --- rules engine ------------------------------------------------------------
@pytest.fixture()
def rules_setup(spark):
    rows = []
    for i in range(21):  # 0..20m, 1m interval
        rows.append(({"__name__": "errors_total", "job": "api"}, i * M, float(i * 10)))
        rows.append(({"__name__": "errors_total", "job": "web"}, i * M, 5.0))
    samples = samples_from_rows(spark, rows).cache()
    return samples


def test_recording_rule_tick(spark, rules_setup):
    from prometheus_spark.streaming import RecordingRule, RuleGroup, RulesEngine

    eng = RulesEngine(spark, rules_setup)
    group = RuleGroup(
        "g", interval_ms=M, rules=[RecordingRule("job:errors:sum", "sum by (job) (errors_total)")]
    )
    out, alerts = eng.eval_tick(group, 10 * M + 30_000)  # aligned → 10m
    assert alerts == []
    by_job = {r[0]["job"]: r[2] for r in out}
    assert by_job == {"api": 100.0, "web": 5.0}
    assert all(r[0]["__name__"] == "job:errors:sum" for r in out)
    assert all(r[1] == 10 * M for r in out)


def test_recording_rule_staleness(spark):
    from prometheus_spark.streaming import RecordingRule, RuleGroup, RulesEngine

    rows = [({"__name__": "m", "k": "a"}, 0, 1.0)]  # only one early sample
    eng = RulesEngine(spark, samples_from_rows(spark, rows), lookback_ms=2 * M)
    group = RuleGroup("g", M, [RecordingRule("rec", "m")])
    out1, _ = eng.eval_tick(group, M)
    assert len(out1) == 1 and not out1[0][3]
    # series gone at t=10m → staleness marker emitted once
    out2, _ = eng.eval_tick(group, 10 * M)
    assert len(out2) == 1 and out2[0][3] is True
    out3, _ = eng.eval_tick(group, 11 * M)
    assert out3 == []


def test_alerting_rule_state_machine(spark, rules_setup):
    from prometheus_spark.streaming import AlertingRule, RuleGroup, RulesEngine

    eng = RulesEngine(spark, rules_setup)
    rule = AlertingRule("HighErrors", "errors_total > 50", for_ms=2 * M)
    group = RuleGroup("g", M, [rule])

    # at 6m: api=60 > 50 → pending
    _, alerts = eng.eval_tick(group, 6 * M)
    assert [(a[0], a[2]) for a in alerts] == [("HighErrors", "pending")]
    # at 7m: still held (1m < for) → pending
    _, alerts = eng.eval_tick(group, 7 * M)
    assert alerts[0][2] == "pending"
    # at 8m: held 2m ≥ for → firing
    _, alerts = eng.eval_tick(group, 8 * M)
    assert alerts[0][2] == "firing"
    labels = alerts[0][1]
    assert labels["alertname"] == "HighErrors" and labels["job"] == "api"


# --- exposition parser ---------------------------------------------------------
EXPO = """
# HELP http_requests_total Total requests.
# TYPE http_requests_total counter
http_requests_total{method="get",code="200"} 1027 1395066363000
http_requests_total{method="post",code="200"} 3
msdos_file_access_time_seconds{path="C:\\\\DIR\\\\FILE.TXT",error="Cannot find file:\\n\\"FILE.TXT\\""} 1.458255915e9
metric_without_labels 12.47
something_weird{problem="division by zero"} +Inf -3982045
no_labels_ts 55 1234
"""


def test_parse_exposition_text():
    from prometheus_spark.sources import parse_exposition_text

    rows = parse_exposition_text(EXPO, default_ts_ms=42)
    by_name = {}
    for labels, t, v in rows:
        by_name.setdefault(labels["__name__"], []).append((labels, t, v))
    assert by_name["http_requests_total"][0][2] == 1027.0
    assert by_name["http_requests_total"][0][1] == 1395066363000
    assert by_name["http_requests_total"][1][1] == 42  # default ts
    weird = by_name["msdos_file_access_time_seconds"][0][0]
    assert weird["path"] == "C:\\DIR\\FILE.TXT"
    assert 'FILE.TXT' in weird["error"] and "\n" in weird["error"]
    assert by_name["something_weird"][0][2] == float("inf")
    assert by_name["something_weird"][0][1] == -3982045
    assert by_name["metric_without_labels"][0][1] == 42


def test_parse_exposition_df(spark):
    from prometheus_spark.sources import parse_exposition_df
    from prometheus_spark.sources.promtext import to_samples

    lines = spark.createDataFrame(
        [(line,) for line in EXPO.strip().split("\n")], "line string"
    )
    parsed = parse_exposition_df(lines)
    samples = to_samples(parsed)
    rows = samples.collect()
    assert len(rows) == 6
    assert {r["name"] for r in rows} >= {"http_requests_total", "metric_without_labels"}
    assert all(r["sig"] for r in rows)


# --- relabeling -----------------------------------------------------------------
@pytest.fixture()
def label_df(spark):
    return spark.createDataFrame(
        [
            ({"__name__": "m", "job": "api-server", "instance": "host1:9090"},),
            ({"__name__": "m", "job": "db", "instance": "host2:9090"},),
        ],
        "labels map<string,string>",
    )


def _sets(df):
    return [dict(r["labels"]) for r in df.collect()]


def test_relabel_keep_drop(spark, label_df):
    from prometheus_spark.sources import RelabelConfig, apply_relabel

    kept = apply_relabel(
        label_df, [RelabelConfig(action="keep", source_labels=["job"], regex="api.*")]
    )
    assert len(_sets(kept)) == 1
    dropped = apply_relabel(
        label_df, [RelabelConfig(action="drop", source_labels=["job"], regex="api.*")]
    )
    assert [s["job"] for s in _sets(dropped)] == ["db"]


def test_relabel_replace(spark, label_df):
    from prometheus_spark.sources import RelabelConfig, apply_relabel

    out = apply_relabel(
        label_df,
        [
            RelabelConfig(
                action="replace",
                source_labels=["instance"],
                regex="([^:]+):.*",
                target_label="host",
                replacement="$1",
            )
        ],
    )
    hosts = sorted(s["host"] for s in _sets(out))
    assert hosts == ["host1", "host2"]


def test_relabel_labelmap_and_case(spark, label_df):
    from prometheus_spark.sources import RelabelConfig, apply_relabel

    out = apply_relabel(
        label_df,
        [
            RelabelConfig(action="labelmap", regex="job", replacement="role"),
            RelabelConfig(action="uppercase", source_labels=["job"], target_label="JOB"),
        ],
    )
    s = _sets(out)[0]
    assert s["role"] == s["job"] and s["JOB"] == s["job"].upper()


def test_relabel_hashmod_buckets(spark, label_df):
    from prometheus_spark.sources import RelabelConfig, apply_relabel

    out = apply_relabel(
        label_df,
        [
            RelabelConfig(
                action="hashmod", source_labels=["job"], target_label="shard", modulus=4
            )
        ],
    )
    shards = [int(s["shard"]) for s in _sets(out)]
    assert all(0 <= x < 4 for x in shards)


def test_relabel_labeldrop(spark, label_df):
    from prometheus_spark.sources import RelabelConfig, apply_relabel

    out = apply_relabel(label_df, [RelabelConfig(action="labeldrop", regex="inst.*")])
    assert all("instance" not in s for s in _sets(out))
