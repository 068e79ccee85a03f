"""Rule-file parsing (YAML) → RuleGroup objects.

Reference: model/rulefmt/rulefmt.go (``Parse``/``ParseFile`` over
``groups: [{name, interval, rules: [{record|alert, expr, for,
keep_firing_for, labels, annotations}]}]``) — the on-disk format every
reference deployment uses, so rule files carry over unchanged.

Validation mirrors rulefmt.Rule.Validate: exactly one of record/alert,
no ``for``/``keep_firing_for``/annotations on recording rules, metric
and label name legality, and expressions must parse.
"""

from __future__ import annotations

import re

import yaml

from prometheus_spark.parser import parse_expr
from prometheus_spark.parser.lexer import parse_duration_ms
from prometheus_spark.streaming.rules import AlertingRule, RecordingRule, RuleGroup

_METRIC_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*$")
_LABEL_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*$")

DEFAULT_INTERVAL_MS = 60_000  # config.DefaultGlobalConfig.EvaluationInterval


class RuleError(ValueError):
    pass


def _duration_ms(v, what: str) -> int:
    if v in (None, ""):
        return 0
    if isinstance(v, (int, float)):
        return int(v * 1000)
    try:
        return parse_duration_ms(str(v))
    except Exception as e:  # noqa: BLE001 — normalize to RuleError
        raise RuleError(f"invalid {what}: {v!r}: {e}") from None


def _validate_labels(labels: dict, what: str) -> dict[str, str]:
    out = {}
    for k, v in (labels or {}).items():
        if not _LABEL_RE.match(str(k)):
            raise RuleError(f"invalid label name {k!r} in {what}")
        out[str(k)] = str(v)
    return out


def parse_rule_groups(text: str, file: str = "") -> list[RuleGroup]:
    """YAML rule-file body → [RuleGroup] (rulefmt.Parse); ``file`` tags
    each group with its source path (group.go File())."""
    doc = yaml.safe_load(text) or {}
    groups_raw = doc.get("groups")
    if not isinstance(groups_raw, list):
        raise RuleError("rule file must have a top-level 'groups' list")
    seen = set()
    groups = []
    for g in groups_raw:
        name = g.get("name")
        if not name:
            raise RuleError("group without a name")
        if name in seen:
            raise RuleError(f"repeated group name {name!r}")
        seen.add(name)
        interval_ms = _duration_ms(g.get("interval"), "interval") or DEFAULT_INTERVAL_MS
        rules = []
        for r in g.get("rules") or []:
            record, alert = r.get("record"), r.get("alert")
            if bool(record) == bool(alert):
                raise RuleError(
                    f"group {name!r}: exactly one of 'record'/'alert' required"
                )
            expr = r.get("expr")
            if not expr:
                raise RuleError(f"group {name!r}: rule without 'expr'")
            try:
                parse_expr(str(expr))
            except Exception as e:  # noqa: BLE001 — surface parse position
                raise RuleError(
                    f"group {name!r}: bad expr {expr!r}: {e}"
                ) from None
            labels = _validate_labels(r.get("labels"), f"group {name!r}")
            annotations = _validate_labels(
                r.get("annotations"), f"group {name!r}"
            )
            if record:
                for forbidden in ("for", "keep_firing_for", "annotations"):
                    if r.get(forbidden):
                        raise RuleError(
                            f"recording rule {record!r} must not have "
                            f"{forbidden!r}"
                        )
                if not _METRIC_RE.match(str(record)):
                    raise RuleError(f"invalid recording rule name {record!r}")
                rules.append(
                    RecordingRule(record=str(record), expr=str(expr), labels=labels)
                )
            else:
                rules.append(
                    AlertingRule(
                        alert=str(alert),
                        expr=str(expr),
                        for_ms=_duration_ms(r.get("for"), "for"),
                        keep_firing_for_ms=_duration_ms(
                            r.get("keep_firing_for"), "keep_firing_for"
                        ),
                        labels=labels,
                        annotations=annotations,
                    )
                )
        qoff = g.get("query_offset")
        groups.append(
            RuleGroup(
                name=name,
                interval_ms=interval_ms,
                rules=rules,
                query_offset_ms=(
                    None
                    if qoff in (None, "")
                    else _duration_ms(qoff, "query_offset")
                ),
                limit=int(g.get("limit") or 0),
                file=file,
            )
        )
    return groups


def load_rule_file(path: str) -> list[RuleGroup]:
    """rulefmt.ParseFile: read + parse a rule file."""
    with open(path) as f:
        return parse_rule_groups(f.read(), file=path)
