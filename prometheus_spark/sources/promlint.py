"""Exposition linting — ``promtool check metrics`` (cmd/promtool
main.go:1056 CheckMetrics; the rule set mirrors the public promlint
checks from prometheus/client_golang, re-implemented from their
documented behavior):

- metrics should have HELP text
- counters should have a ``_total`` suffix; non-counters should not
- ``_count`` / ``_sum`` / ``_bucket`` suffixes are reserved for
  histograms and summaries
- units should be base units (seconds not milliseconds, bytes not
  kilobytes, ratio not percent)
- metric names should not contain the metric type
- metric and label names should use snake_case, not camelCase
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# non-base-unit suffix → suggested base unit (promlint lintMetricUnits)
NON_BASE_UNITS = {
    "milliseconds": "seconds", "microseconds": "seconds",
    "nanoseconds": "seconds", "minutes": "seconds", "hours": "seconds",
    "days": "seconds",
    "kilobytes": "bytes", "megabytes": "bytes", "gigabytes": "bytes",
    "terabytes": "bytes", "bits": "bytes",
    "percent": "ratio", "percentage": "ratio",
    "kelvins": "celsius", "fahrenheit": "celsius",
    "inches": "meters", "feet": "meters", "miles": "meters",
}

_CAMEL = re.compile(r"[a-z0-9][A-Z]")


@dataclass
class Problem:
    metric: str
    text: str


def lint_exposition(text: str) -> list[Problem]:
    """Lint one exposition body; returns problems sorted by metric."""
    from prometheus_spark.sources.promtext import (
        parse_exposition_metadata,
        parse_exposition_text,
    )

    meta = parse_exposition_metadata(text)
    samples = parse_exposition_text(text, 0)
    names = sorted({labels["__name__"] for labels, _, _ in samples})
    label_names: dict[str, set] = {}
    for labels, _, _ in samples:
        label_names.setdefault(labels["__name__"], set()).update(
            k for k in labels if k != "__name__"
        )

    problems: list[Problem] = []
    for name in names:
        base = re.sub(r"_(total|count|sum|bucket|created)$", "", name)
        m = meta.get(name) or meta.get(base) or {}
        mtype = m.get("type", "unknown")
        if not m.get("help"):
            problems.append(Problem(name, "no help text"))
        if mtype == "counter" and not name.endswith("_total"):
            problems.append(
                Problem(name, 'counter metrics should have "_total" suffix')
            )
        if mtype not in ("counter", "unknown") and name.endswith("_total"):
            problems.append(
                Problem(name, 'non-counter metrics should not have "_total" suffix')
            )
        if mtype not in ("histogram", "summary", "unknown"):
            for suffix in ("_count", "_sum", "_bucket"):
                if name.endswith(suffix):
                    problems.append(Problem(
                        name,
                        f'non-histogram and non-summary metrics should not '
                        f'have "{suffix}" suffix',
                    ))
        for unit, base_unit in NON_BASE_UNITS.items():
            if re.search(rf"_{unit}(_total)?$", name):
                problems.append(Problem(
                    name, f'use base unit "{base_unit}" instead of "{unit}"'
                ))
        for t in ("counter", "gauge", "histogram", "summary", "timer"):
            if re.search(rf"(_|^){t}(_|$)", name):
                problems.append(
                    Problem(name, f'metric name should not include type "{t}"')
                )
        if _CAMEL.search(name):
            problems.append(
                Problem(name, "metric names should be written in snake_case "
                              "not camelCase")
            )
        for ln in sorted(label_names.get(name, ())):
            if _CAMEL.search(ln):
                problems.append(
                    Problem(name, f'label name "{ln}" should be written in '
                                  "snake_case not camelCase")
                )
    return problems
