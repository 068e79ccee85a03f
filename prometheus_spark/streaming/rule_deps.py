"""Rule dependency analysis + concurrency control.

Mirrors the reference's concurrent-rule-eval machinery
(rules/group.go:1115-1216 ``buildDependencyMap``,
rules/manager.go:499-612 ``RuleDependencyController`` /
``RuleConcurrencyController``): rules inside one group that do not feed
each other may evaluate concurrently, bounded by a global semaphore
(``--rules.max-concurrent-evals``); rules with both dependencies and
dependents stay strictly ordered.

A rule B *depends on* rule A when B's expression contains a vector
selector whose ``__name__`` matcher matches A's output metric name — or,
for alerting rules, when B queries the ``ALERTS`` / ``ALERTS_FOR_STATE``
meta-series with an ``alertname`` matcher matching A's alert name (or no
alertname matcher at all).  A selector with no name matcher at all
(``{cluster="prod"}``) is *indeterminate*: relationships cannot be
inferred, so the whole group falls back to sequential evaluation
(group.go:1158-1163).

Only earlier-defined rules count as strict dependencies: rule order in a
group is the reference's execution contract, so a selector matching a
*later* rule's output reads last tick's value by design
(group.go:1180-1186).

Everything here is driver-side metadata over parsed ASTs — no Spark.
"""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass
from typing import Optional

from prometheus_spark.parser import parse_expr
from prometheus_spark.parser.ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    MatchType,
    Matcher,
    MatrixSelector,
    ParenExpr,
    SubqueryExpr,
    UnaryExpr,
    VectorSelector,
)

ALERT_METRIC_NAME = "ALERTS"
ALERT_FOR_STATE_METRIC_NAME = "ALERTS_FOR_STATE"
METRIC_NAME_LABEL = "__name__"
ALERT_NAME_LABEL = "alertname"


def matcher_matches(m: Matcher, value: str) -> bool:
    """Driver-side mirror of labels.Matcher.Matches — regexes are
    full-string anchored like the reference (model/labels/regexp.go)."""
    if m.type == MatchType.EQ:
        return m.value == value
    if m.type == MatchType.NEQ:
        return m.value != value
    anchored = re.compile(f"^(?:{m.value})$")
    hit = anchored.search(value) is not None
    return hit if m.type == MatchType.RE else not hit


def iter_vector_selectors(node):
    """Yield every VectorSelector in the expression tree (the analysis
    analogue of parser.Inspect at group.go:1140)."""
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, VectorSelector):
            yield n
        elif isinstance(n, MatrixSelector):
            stack.append(n.selector)
        elif isinstance(n, SubqueryExpr):
            stack.append(n.expr)
        elif isinstance(n, Call):
            stack.extend(n.args)
        elif isinstance(n, BinaryExpr):
            stack.append(n.lhs)
            stack.append(n.rhs)
        elif isinstance(n, (UnaryExpr, ParenExpr)):
            stack.append(n.expr)
        elif isinstance(n, AggregateExpr):
            stack.append(n.expr)
            if n.param is not None:
                stack.append(n.param)


def _rule_name(rule) -> str:
    """A rule's output series name: record for recording rules, alert
    name for alerting rules (whose ALERTS series carry it in
    ``alertname``)."""
    rec = getattr(rule, "record", None)
    return rec if rec is not None else rule.alert


def _rule_expr_ast(rule):
    return parse_expr(rule.expr)


def build_dependency_map(rules: list) -> Optional[dict[int, list[int]]]:
    """group.go:1125 ``buildDependencyMap``, keyed by rule index.

    Returns ``{dependency_idx: [dependent_idx, ...]}``;  ``{}`` for
    groups of ≤1 rule or with no relationships; ``None`` when any
    selector is name-less (indeterminate — evaluate sequentially).
    """
    deps: dict[int, list[int]] = {}
    if len(rules) <= 1:
        return deps

    for i, rule in enumerate(rules):
        for sel in iter_vector_selectors(_rule_expr_ast(rule)):
            name_matcher: Optional[Matcher] = None
            if sel.name:
                name_matcher = Matcher(METRIC_NAME_LABEL, MatchType.EQ, sel.name)
            else:
                for m in sel.matchers:
                    if m.name == METRIC_NAME_LABEL:
                        name_matcher = m
                        break
            if name_matcher is None:
                # wildcard selector → cannot infer anything for the group
                return None

            matches_alerts = matcher_matches(
                name_matcher, ALERT_METRIC_NAME
            ) or matcher_matches(name_matcher, ALERT_FOR_STATE_METRIC_NAME)
            alertname_matcher: Optional[Matcher] = None
            if matches_alerts:
                for m in sel.matchers:
                    if m.name == ALERT_NAME_LABEL:
                        alertname_matcher = m
                        break

            for j in range(i):  # only earlier rules are strict dependencies
                other = rules[j]
                other_name = _rule_name(other)
                if matcher_matches(name_matcher, other_name):
                    if i not in deps.setdefault(j, []):
                        deps.setdefault(j, []).append(i)
                    continue
                other_is_alerting = getattr(other, "alert", None) is not None
                if matches_alerts and other_is_alerting:
                    if alertname_matcher is None or matcher_matches(
                        alertname_matcher, other_name
                    ):
                        if i not in deps.setdefault(j, []):
                            deps.setdefault(j, []).append(i)
    return deps


def dependents(dep_map: Optional[dict[int, list[int]]], idx: int) -> list[int]:
    if not dep_map:
        return []
    return list(dep_map.get(idx, []))


def dependencies(dep_map: Optional[dict[int, list[int]]], idx: int) -> list[int]:
    if not dep_map:
        return []
    return [j for j, dts in dep_map.items() if idx in dts]


def is_independent(dep_map: Optional[dict[int, list[int]]], idx: int) -> bool:
    """group.go:1105 ``isIndependent`` — False on an indeterminate map."""
    if dep_map is None:
        return False
    return not dependents(dep_map, idx) and not dependencies(dep_map, idx)


def split_group_into_batches(
    rules: list, dep_map: Optional[dict[int, list[int]]]
) -> Optional[list[list[int]]]:
    """manager.go:556 ``SplitGroupIntoBatches``: an ordered list of
    batches of rule indices; rules within a batch may run concurrently.

    1. all rules with no dependencies (concurrent batch),
    2. rules with both dependencies and dependents (singleton batches,
       in definition order),
    3. all rules with no dependents (concurrent batch).

    ``None`` means no safe concurrency — evaluate strictly sequentially
    (the reference returns nil for the sequential controller and for
    indeterminate groups).
    """
    if dep_map is None:
        return None

    no_deps: list[int] = []
    both: list[int] = []
    no_dependents: list[int] = []
    for i in range(len(rules)):
        has_dependency = bool(dependencies(dep_map, i))
        has_dependent = bool(dependents(dep_map, i))
        if not has_dependency:
            no_deps.append(i)
        elif has_dependent:
            both.append(i)
        else:
            no_dependents.append(i)

    order: list[list[int]] = []
    if no_deps:
        order.append(no_deps)
    for i in both:
        order.append([i])
    if no_dependents:
        order.append(no_dependents)
    return order


@dataclass
class _Sequential:
    """manager.go:600 ``sequentialRuleEvalController`` — never allows a
    concurrent slot and produces no batching."""

    def split_group_into_batches(self, rules: list) -> Optional[list[list[int]]]:
        return None

    def allow(self) -> bool:
        return False

    def done(self) -> None:  # pragma: no cover - never reached
        pass


class ConcurrentRuleEvalController:
    """manager.go:543 ``concurrentRuleEvalController`` — a weighted
    semaphore bounding concurrent rule evals *globally* (across groups),
    with try-acquire semantics: when no slot is free the rule simply
    evaluates synchronously in the caller's thread."""

    def __init__(self, max_concurrent: int):
        self._sema = threading.Semaphore(max_concurrent)

    def split_group_into_batches(self, rules: list) -> Optional[list[list[int]]]:
        return split_group_into_batches(rules, build_dependency_map(rules))

    def allow(self) -> bool:
        return self._sema.acquire(blocking=False)

    def done(self) -> None:
        self._sema.release()


def sequential_rule_eval_controller() -> _Sequential:
    return _Sequential()
