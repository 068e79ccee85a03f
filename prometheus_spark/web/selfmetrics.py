"""Engine self-instrumentation — the server's own ``/metrics``.

The reference registers its telemetry with a client_golang registry and
scrapes itself (the classic ``job: prometheus`` scrape config): engine
metrics in promql/engine.go:392-470 (query counts, duration slices,
``prometheus_engine_query_samples_total`` fed from each query's
SamplesRead at :691), rule metrics in rules/group.go ``NewGroupMetrics``
(iterations, missed, failures, last duration/timestamp, group size),
HTTP metrics in web/web.go.

This module is the minimal thread-safe equivalent: a process-global
registry of counters / gauges / summaries plus a text-exposition
renderer, so the engine's own scraper can ingest the engine
(tests/test_selfmetrics.py dogfoods exactly that round-trip).
"""

from __future__ import annotations

import threading


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _escape(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


class SelfMetrics:
    """Tiny registry: counter / gauge / summary(sum+count), rendered as
    text exposition format 0.0.4."""

    def __init__(self):
        self._lock = threading.Lock()
        # name → (type, help);  (name, labels-items) → float
        self._meta: dict[str, tuple[str, str]] = {}
        self._vals: dict[tuple, float] = {}

    def _key(self, name: str, labels: dict) -> tuple:
        return (name, tuple(sorted(labels.items())))

    def counter_add(self, name: str, amount: float = 1.0, help_: str = "",
                    **labels) -> None:
        with self._lock:
            self._meta.setdefault(name, ("counter", help_))
            k = self._key(name, labels)
            self._vals[k] = self._vals.get(k, 0.0) + amount

    def gauge_set(self, name: str, value: float, help_: str = "",
                  **labels) -> None:
        with self._lock:
            self._meta.setdefault(name, ("gauge", help_))
            self._vals[self._key(name, labels)] = float(value)

    def observe(self, name: str, value: float, help_: str = "",
                **labels) -> None:
        """Summary observation → ``name_sum`` / ``name_count`` series."""
        with self._lock:
            self._meta.setdefault(name, ("summary", help_))
            for suffix, amt in (("_sum", value), ("_count", 1.0)):
                k = self._key(name + suffix, labels)
                self._vals[k] = self._vals.get(k, 0.0) + amt

    def value(self, name: str, **labels) -> float:
        with self._lock:
            return self._vals.get(self._key(name, labels), 0.0)

    def reset(self) -> None:
        with self._lock:
            self._meta.clear()
            self._vals.clear()

    def render(self) -> str:
        """Text exposition format 0.0.4, families sorted by name."""
        with self._lock:
            meta = dict(self._meta)
            vals = dict(self._vals)
        out: list[str] = []
        for fam in sorted(meta):
            mtype, help_ = meta[fam]
            if help_:
                out.append(f"# HELP {fam} {help_}")
            out.append(f"# TYPE {fam} {mtype}")
            names = (
                (fam + "_sum", fam + "_count") if mtype == "summary"
                else (fam,)
            )
            for name in names:
                for (n, litems), v in sorted(vals.items()):
                    if n != name:
                        continue
                    if litems:
                        lbl = ",".join(
                            f'{k}="{_escape(val)}"' for k, val in litems
                        )
                        out.append(f"{name}{{{lbl}}} {_fmt(v)}")
                    else:
                        out.append(f"{name} {_fmt(v)}")
        return "\n".join(out) + "\n"


# the process-global default registry (client_golang's DefaultRegisterer
# analogue) — every component writes here; tests call reset()
REGISTRY = SelfMetrics()
