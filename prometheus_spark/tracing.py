"""Self-tracing: span emission for the engine's own operations.

Mirror of the reference's tracing subsystem (`tracing/tracing.go`):

- ``Manager`` owns the installed tracer provider; ``apply_config``
  re-installs it when the ``tracing:`` config section changes, shuts it
  down when the section is removed, and is a no-op when unchanged
  (tracing.go:71 ApplyConfig).
- Sampling is parent-based with a trace-id ratio root decision
  (tracing.go:160 ``ParentBased(TraceIDRatioBased(fraction))``): a child
  span inherits its parent's sampled flag; a root samples iff
  ``trace_id < fraction · 2^64``.
- The exporter speaks OTLP/HTTP JSON (``/v1/traces``) with the
  configured headers/compression/timeout (tracing.go:179 getClient).
  ``client_type: grpc`` (the reference's default) needs the OTLP gRPC
  stack, which is an optional dependency here — the manager raises a
  clear error unless the ``opentelemetry`` SDK is importable; tests and
  local use inject an in-memory exporter instead.

Span sites match the reference:

- per-expression evaluation spans, ``promqlInnerEval eval <NodeType>``
  (promql/engine.go:2065) — here they time logical-plan construction,
  the Spark-side analogue of the reference's eval recursion;
- query-lifecycle spans named by the stats timer operations
  (util/stats/query_stats.go:61 SpanOperation): promqlExec, promqlPrepare,
  promqlEval, promqlSort;
- ``rule`` spans around each rule evaluation (rules/group.go:515);
- ``Scrape`` spans around each target scrape (scrape/scrape.go:746).

All sites run through :func:`span`, which is a zero-allocation no-op
while no provider is installed — the module-level ``_ACTIVE`` flag keeps
the disabled path to one attribute read.
"""

from __future__ import annotations

import contextlib
import contextvars
import gzip as _gzip
import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional

SERVICE_NAME = "prometheus"  # tracing.go:37 serviceName

_ACTIVE = False  # fast-path guard; set only by install/shutdown
_PROVIDER: Optional["TracerProvider"] = None
_current_span: contextvars.ContextVar[Optional["Span"]] = contextvars.ContextVar(
    "prometheus_spark_current_span", default=None
)


@dataclass
class Span:
    name: str
    trace_id: int
    span_id: int
    parent_id: Optional[int]
    sampled: bool
    start_ns: int = 0
    end_ns: int = 0
    attributes: dict = field(default_factory=dict)

    def set_attribute(self, key: str, value) -> None:
        self.attributes[key] = value


class InMemoryExporter:
    """Test/debug exporter: collects finished spans in a list."""

    def __init__(self) -> None:
        self.spans: list[Span] = []
        self.shut_down = False

    def export(self, spans: list[Span]) -> None:
        self.spans.extend(spans)

    def shutdown(self) -> None:
        self.shut_down = True


class OTLPHttpJsonExporter:
    """OTLP/HTTP JSON over urllib (tracing.go:179 getClient, http branch).

    Export failures are swallowed after logging — the reference installs
    an otel error HANDLER rather than failing operations (tracing.go:125).
    """

    def __init__(self, cfg: dict) -> None:
        endpoint = cfg["endpoint"]
        scheme = "http" if cfg.get("insecure") else "https"
        if not endpoint.startswith(("http://", "https://")):
            endpoint = f"{scheme}://{endpoint}"
        self.url = endpoint.rstrip("/") + "/v1/traces"
        self.headers = dict(cfg.get("headers") or {})
        self.gzip = cfg.get("compression") == "gzip"
        self.timeout_s = cfg.get("timeout_ms", 10_000) / 1000.0

    @staticmethod
    def encode(spans: list[Span]) -> dict:
        """OTLP JSON ResourceSpans payload (service.name resource attr,
        tracing.go:146 resource.New)."""

        def attr(k, v):
            if isinstance(v, bool):
                val = {"boolValue": v}
            elif isinstance(v, int):
                val = {"intValue": str(v)}
            elif isinstance(v, float):
                val = {"doubleValue": v}
            else:
                val = {"stringValue": str(v)}
            return {"key": k, "value": val}

        return {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [attr("service.name", SERVICE_NAME)]
                    },
                    "scopeSpans": [
                        {
                            "scope": {"name": "prometheus_spark"},
                            "spans": [
                                {
                                    "traceId": f"{s.trace_id:032x}",
                                    "spanId": f"{s.span_id:016x}",
                                    **(
                                        {"parentSpanId": f"{s.parent_id:016x}"}
                                        if s.parent_id
                                        else {}
                                    ),
                                    "name": s.name,
                                    "startTimeUnixNano": str(s.start_ns),
                                    "endTimeUnixNano": str(s.end_ns),
                                    "attributes": [
                                        attr(k, v)
                                        for k, v in s.attributes.items()
                                    ],
                                }
                                for s in spans
                            ],
                        }
                    ],
                }
            ]
        }

    def export(self, spans: list[Span]) -> None:
        import urllib.request

        body = json.dumps(self.encode(spans)).encode()
        headers = {"Content-Type": "application/json", **self.headers}
        if self.gzip:
            body = _gzip.compress(body)
            headers["Content-Encoding"] = "gzip"
        req = urllib.request.Request(self.url, data=body, headers=headers)
        try:
            urllib.request.urlopen(req, timeout=self.timeout_s).read()
        except Exception as exc:  # error handler, not a failure path
            import logging

            logging.getLogger(__name__).warning("tracing export failed: %s", exc)

    def shutdown(self) -> None:
        pass


class TracerProvider:
    """Batching provider: spans buffer and flush on size/shutdown
    (tracing.go:158 WithBatcher)."""

    def __init__(self, exporter, sampling_fraction: float, batch_size: int = 512):
        self.exporter = exporter
        self.fraction = max(0.0, min(1.0, float(sampling_fraction)))
        self._batch: list[Span] = []
        self._batch_size = batch_size
        self._lock = threading.Lock()

    def _sample_root(self, trace_id: int) -> bool:
        # TraceIDRatioBased: compare the id's low 63 bits to the ratio
        if self.fraction >= 1.0:
            return True
        if self.fraction <= 0.0:
            return False
        return (trace_id & ((1 << 63) - 1)) < int(self.fraction * (1 << 63))

    def start(self, name: str) -> Span:
        parent = _current_span.get()
        now = time.time_ns()
        if parent is not None:
            trace_id, parent_id, sampled = parent.trace_id, parent.span_id, parent.sampled
        else:
            trace_id = int.from_bytes(os.urandom(16), "big")
            parent_id = None
            sampled = self._sample_root(trace_id)
        return Span(
            name=name,
            trace_id=trace_id,
            span_id=int.from_bytes(os.urandom(8), "big") or 1,
            parent_id=parent_id,
            sampled=sampled,
            start_ns=now,
        )

    def finish(self, s: Span) -> None:
        s.end_ns = time.time_ns()
        if not s.sampled:
            return
        with self._lock:
            self._batch.append(s)
            if len(self._batch) >= self._batch_size:
                flush, self._batch = self._batch, []
            else:
                return
        self.exporter.export(flush)

    def force_flush(self) -> None:
        with self._lock:
            flush, self._batch = self._batch, []
        if flush:
            self.exporter.export(flush)

    def shutdown(self) -> None:
        self.force_flush()
        self.exporter.shutdown()


@contextlib.contextmanager
def span(_span_name: str, **attributes) -> Iterator[Optional[Span]]:
    """Start a child of the context's current span.  No-op (yields None)
    while no provider is installed — safe on every hot path.  (The
    positional parameter is underscored so attribute keys like ``name``
    — used by the reference's rule spans — stay valid kwargs.)"""
    if not _ACTIVE or _PROVIDER is None:
        yield None
        return
    # Bind the provider to a local: a concurrent Manager.stop() /
    # apply_config (reload disabling tracing) may null the global
    # between span start and finish — the race must degrade to a
    # harmlessly dropped span, not an AttributeError from the finally.
    prov = _PROVIDER
    s = prov.start(_span_name)
    if attributes:
        s.attributes.update(attributes)
    token = _current_span.set(s)
    try:
        yield s
    finally:
        _current_span.reset(token)
        prov.finish(s)


def _default_exporter_factory(cfg: dict):
    if cfg.get("client_type", "grpc") == "http":
        return OTLPHttpJsonExporter(cfg)
    try:  # pragma: no cover - optional dependency
        import opentelemetry  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "tracing client_type 'grpc' needs the opentelemetry OTLP gRPC "
            "exporter (optional dependency); use client_type: http or "
            "install opentelemetry-exporter-otlp"
        )
    raise RuntimeError("grpc exporter wiring requires opentelemetry SDK")


class Manager:
    """tracing.go:44 Manager: owns the installed provider; ApplyConfig
    installs/replaces/shuts it down based on the config's tracing section."""

    def __init__(self, exporter_factory: Callable[[dict], object] = None):
        self._factory = exporter_factory or _default_exporter_factory
        self._config: Optional[dict] = None
        self._provider: Optional[TracerProvider] = None

    def apply_config(self, tracing_cfg: Optional[dict]) -> None:
        global _ACTIVE, _PROVIDER
        if not tracing_cfg or not tracing_cfg.get("endpoint"):
            # tracing.go:75-87: empty config → shut down and deinstall
            self.stop()
            self._config = None
            return
        if self._config == tracing_cfg and _PROVIDER is not None:
            return  # tracing.go:89-91: unchanged → no-op
        # The installed provider is a process-wide global; a reload may
        # run through a FRESH Manager (build_server creates one per
        # build), so shut down whatever is live — ours or a previous
        # build's — before installing the replacement (tracing.go keeps
        # one global otel provider for the same reason).
        for prov in {p for p in (_PROVIDER, self._provider) if p is not None}:
            prov.shutdown()
        exporter = self._factory(tracing_cfg)
        self._provider = TracerProvider(
            exporter, tracing_cfg.get("sampling_fraction", 0.0)
        )
        self._config = dict(tracing_cfg)
        _PROVIDER = self._provider
        _ACTIVE = True

    def stop(self) -> None:
        global _ACTIVE, _PROVIDER
        # Deinstall the live global even when it was installed by a
        # different Manager instance (reload-removes-tracing through a
        # fresh build must flush and deactivate the old provider).
        for prov in {p for p in (_PROVIDER, self._provider) if p is not None}:
            prov.shutdown()
        _ACTIVE = False
        _PROVIDER = None
        self._provider = None

    def force_flush(self) -> None:
        if self._provider is not None:
            self._provider.force_flush()
