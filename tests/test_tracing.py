"""Self-tracing (prometheus_spark/tracing.py) — Manager lifecycle,
parent-based sampling, span sites, OTLP JSON encoding.

Reference semantics mirrored: tracing/tracing.go:71 ApplyConfig
(install / replace-on-change / shutdown-on-empty / no-op-on-same),
ParentBased(TraceIDRatioBased) sampling (tracing.go:160), span names
from promql/engine.go:2065, util/stats/query_stats.go:61,
rules/group.go:515, scrape/scrape.go:746.
"""

import pytest

from prometheus_spark import tracing
from prometheus_spark.tracing import (
    InMemoryExporter,
    Manager,
    OTLPHttpJsonExporter,
    Span,
)


@pytest.fixture
def mem_manager():
    exp = InMemoryExporter()
    mgr = Manager(exporter_factory=lambda cfg: exp)
    yield mgr, exp
    mgr.stop()


def _cfg(**kw):
    base = {
        "client_type": "http",
        "endpoint": "localhost:4318",
        "sampling_fraction": 1.0,
        "insecure": True,
        "headers": {},
        "compression": "",
        "timeout_ms": 10_000,
        "tls_config": {},
    }
    base.update(kw)
    return base


def test_noop_without_provider():
    with tracing.span("anything") as s:
        assert s is None


def test_span_parenting_and_flush(mem_manager):
    mgr, exp = mem_manager
    mgr.apply_config(_cfg())
    with tracing.span("outer") as so:
        with tracing.span("inner") as si:
            assert si.trace_id == so.trace_id
            assert si.parent_id == so.span_id
    mgr.force_flush()
    names = [s.name for s in exp.spans]
    assert names == ["inner", "outer"]  # children finish first
    assert exp.spans[0].end_ns >= exp.spans[0].start_ns


def test_sampling_fraction_zero_drops_all(mem_manager):
    mgr, exp = mem_manager
    mgr.apply_config(_cfg(sampling_fraction=0.0))
    for _ in range(20):
        with tracing.span("root"):
            with tracing.span("child"):
                pass
    mgr.force_flush()
    assert exp.spans == []


def test_child_inherits_parent_decision(mem_manager):
    """ParentBased: the root decision flows down, never re-sampled."""
    mgr, exp = mem_manager
    mgr.apply_config(_cfg(sampling_fraction=0.0))
    with tracing.span("root") as root:
        with tracing.span("child") as child:
            assert child.sampled == root.sampled is False


def test_apply_config_lifecycle(mem_manager):
    mgr, exp = mem_manager
    cfg = _cfg()
    mgr.apply_config(cfg)
    p1 = mgr._provider
    mgr.apply_config(dict(cfg))  # unchanged -> no-op (tracing.go:89)
    assert mgr._provider is p1
    mgr.apply_config(_cfg(endpoint="other:4318"))  # changed -> reinstall
    assert mgr._provider is not p1
    mgr.apply_config(None)  # removed -> shutdown + deinstall
    assert mgr._provider is None and exp.shut_down
    with tracing.span("after") as s:
        assert s is None


def test_engine_query_spans(spark, mem_manager):
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import samples_from_rows

    mgr, exp = mem_manager
    mgr.apply_config(_cfg())
    samples = samples_from_rows(
        spark, [({"__name__": "m"}, t * 1000, float(t)) for t in range(10)]
    )
    PromQLEngine(spark, samples).range_query("sum(rate(m[5s]))", 5_000, 9_000, 1_000)
    mgr.force_flush()
    names = [s.name for s in exp.spans]
    assert "promqlExec" in names and "promqlPrepare" in names
    assert "promqlEval" in names and "promqlSort" in names
    # per-expression spans, innermost first (engine.go:2065 naming)
    inner = [n for n in names if n.startswith("promqlInnerEval eval ")]
    assert "promqlInnerEval eval AggregateExpr" in inner
    assert "promqlInnerEval eval Call" in inner
    # all spans share the promqlExec root's trace
    root = next(s for s in exp.spans if s.name == "promqlExec")
    assert all(s.trace_id == root.trace_id for s in exp.spans)
    assert root.attributes["query"] == "sum(rate(m[5s]))"


def test_rule_eval_span(spark, mem_manager):
    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.streaming.rules import (
        RecordingRule,
        RuleGroup,
        RulesEngine,
    )

    mgr, exp = mem_manager
    mgr.apply_config(_cfg())
    samples = samples_from_rows(
        spark, [({"__name__": "m"}, t * 1000, float(t)) for t in range(10)]
    )
    eng = RulesEngine(spark, samples)
    group = RuleGroup(
        name="g", interval_ms=1000,
        rules=[RecordingRule(record="m:rec", expr="sum(m)")],
    )
    eng.eval_tick(group, 9_000)
    mgr.force_flush()
    rule_spans = [s for s in exp.spans if s.name == "rule"]
    assert rule_spans and rule_spans[0].attributes["name"] == "m:rec"


def test_otlp_json_encoding():
    s = Span(
        name="promqlExec", trace_id=0xABC, span_id=0x12, parent_id=None,
        sampled=True, start_ns=1, end_ns=2, attributes={"query": "up", "n": 3},
    )
    child = Span(
        name="rule", trace_id=0xABC, span_id=0x34, parent_id=0x12,
        sampled=True, start_ns=1, end_ns=2,
    )
    payload = OTLPHttpJsonExporter.encode([s, child])
    rs = payload["resourceSpans"][0]
    attrs = {a["key"]: a["value"] for a in rs["resource"]["attributes"]}
    assert attrs["service.name"] == {"stringValue": "prometheus"}
    spans = rs["scopeSpans"][0]["spans"]
    assert spans[0]["traceId"] == f"{0xABC:032x}"
    assert "parentSpanId" not in spans[0]
    assert spans[1]["parentSpanId"] == f"{0x12:016x}"
    sa = {a["key"]: a["value"] for a in spans[0]["attributes"]}
    assert sa["query"] == {"stringValue": "up"}
    assert sa["n"] == {"intValue": "3"}


def test_exporter_url_and_headers():
    exp = OTLPHttpJsonExporter(
        _cfg(endpoint="collector:4318", headers={"x-scope": "a"},
             compression="gzip", insecure=True)
    )
    assert exp.url == "http://collector:4318/v1/traces"
    assert exp.headers == {"x-scope": "a"} and exp.gzip


def test_grpc_needs_optional_dependency():
    mgr = Manager()
    with pytest.raises(RuntimeError, match="client_type: http"):
        mgr.apply_config(_cfg(client_type="grpc"))


def test_build_server_survives_grpc_config(spark, tmp_path):
    """A reference-default grpc tracing section must not fail startup
    (optional dependency absent -> warn and run untraced)."""
    cfg_file = tmp_path / "prom.yml"
    cfg_file.write_text(
        "global:\n  scrape_interval: 15s\n"
        "tracing:\n  endpoint: localhost:4317\n"
    )
    from prometheus_spark.config import build_server, load_config

    server = build_server(spark, load_config(str(cfg_file)))
    assert server["tracing"]._provider is None
