"""Engine self-instrumentation: /metrics exposition + dogfood round-trip.

The reference scrapes itself (the classic ``job: prometheus``): engine
metrics (promql/engine.go:392-470), rule-group metrics
(rules/group.go NewGroupMetrics), HTTP metrics (web/web.go).  The
dogfood test ingests our own /metrics body through our own text parser
and queries it back through our own engine."""

import pytest

from prometheus_spark.engine import PromQLEngine
from prometheus_spark.storage import samples_from_rows
from prometheus_spark.web.api import PromAPI
from prometheus_spark.web.selfmetrics import REGISTRY, SelfMetrics

M = 60_000


@pytest.fixture(autouse=True)
def _fresh_registry():
    REGISTRY.reset()
    yield
    REGISTRY.reset()


def test_registry_render_shapes():
    r = SelfMetrics()
    r.counter_add("c_total", 2, help_="a counter", handler="/x")
    r.counter_add("c_total", 1, handler="/x")
    r.gauge_set("g", 1.5, help_="a gauge")
    r.observe("d_seconds", 0.25, help_="a summary", slice="a")
    r.observe("d_seconds", 0.75, slice="a")
    text = r.render()
    assert '# TYPE c_total counter' in text
    assert 'c_total{handler="/x"} 3' in text
    assert '# TYPE g gauge' in text and "\ng 1.5" in text
    assert '# TYPE d_seconds summary' in text
    assert 'd_seconds_sum{slice="a"} 1' in text
    assert 'd_seconds_count{slice="a"} 2' in text


def test_http_and_engine_metrics(spark):
    rows = [({"__name__": "m"}, i * M, float(i)) for i in range(11)]
    eng = PromQLEngine(spark, samples_from_rows(spark, rows))
    api = PromAPI(eng, per_step_stats=True)
    code, _ = api.handle("/api/v1/query",
                         {"query": ["m"], "time": ["600"], "stats": ["all"]})
    assert code == 200
    code, _ = api.handle("/api/v1/query", {"query": ["(((bad"], "time": ["600"]})
    assert code == 400
    assert REGISTRY.value("prometheus_http_requests_total",
                          handler="/api/v1/query", code="200") == 1
    assert REGISTRY.value("prometheus_http_requests_total",
                          handler="/api/v1/query", code="400") == 1
    assert REGISTRY.value("prometheus_engine_queries_total") == 1
    # samplesRead flows into the engine counter (engine.go:691)
    assert REGISTRY.value("prometheus_engine_query_samples_total") == 1
    assert REGISTRY.value("prometheus_engine_query_duration_seconds_count",
                          slice="inner_eval") == 1


def test_rules_manager_metrics(spark):
    from prometheus_spark.streaming import (
        AlertingRule, RecordingRule, RuleGroup, RulesEngine, RulesManager,
    )

    rows = [({"__name__": "m"}, i * M, 50.0) for i in range(12)]
    eng = RulesEngine(spark, samples_from_rows(spark, rows))
    g = RuleGroup("g1", M, [RecordingRule("r", "sum(m)"),
                            AlertingRule("A", "m > 0")])
    mgr = RulesManager(eng, lambda df, a: None)
    mgr.update([g])
    mgr.tick(now_ms=10 * M)
    due = mgr._next_due["g1"]
    mgr.tick(now_ms=due)
    assert REGISTRY.value("prometheus_rule_group_iterations_total",
                          rule_group="g1") == 1
    assert REGISTRY.value("prometheus_rule_group_rules", rule_group="g1") == 2
    assert REGISTRY.value(
        "prometheus_rule_group_last_evaluation_timestamp_seconds",
        rule_group="g1") == due / 1000.0
    text = mgr and REGISTRY.render()
    assert 'prometheus_rule_group_last_duration_seconds{rule_group="g1"}' in text


def test_dogfood_roundtrip(spark):
    """/metrics body → our own exposition parser → samples frame →
    PromQL query over the engine's own telemetry."""
    rows = [({"__name__": "m"}, i * M, float(i)) for i in range(11)]
    eng = PromQLEngine(spark, samples_from_rows(spark, rows))
    api = PromAPI(eng)
    for _ in range(3):
        api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    text = api.metrics_text()

    from prometheus_spark.sources.promtext import parse_exposition_text

    parsed = parse_exposition_text(text, default_ts_ms=600_000)
    ingest_rows = [(labels, t, v) for labels, t, v in parsed]
    meta_eng = PromQLEngine(spark, samples_from_rows(spark, ingest_rows))
    got = meta_eng.instant_query(
        'prometheus_http_requests_total{handler="/api/v1/query"}', 600_000
    ).collect()
    assert len(got) == 1 and got[0]["value"] == 3.0
    # summary sum/count pair ingests and divides like any series
    avg = meta_eng.instant_query(
        "prometheus_engine_query_duration_seconds_sum"
        ' / prometheus_engine_query_duration_seconds_count', 600_000
    ).collect()
    assert len(avg) == 2  # two slices
    assert all(r["value"] >= 0 for r in avg)
