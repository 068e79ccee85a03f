import math

import pytest

from prometheus_spark.parser import parse_expr, ParseError
from prometheus_spark.parser.ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    MatchCardinality,
    MatchType,
    MatrixSelector,
    NumberLiteral,
    SubqueryExpr,
    UnaryExpr,
    VectorSelector,
)


def test_precedence():
    e = parse_expr("1 + 2 * 3 ^ 2")
    assert e.op == "+" and e.rhs.op == "*" and e.rhs.rhs.op == "^"
    e = parse_expr("2 ^ 3 ^ 2")  # right-assoc
    assert e.rhs.op == "^" and isinstance(e.lhs, NumberLiteral)
    e = parse_expr("1 - 2 - 3")  # left-assoc
    assert e.lhs.op == "-" and e.rhs.value == 3.0
    e = parse_expr("a or b and c")
    assert e.op == "or" and e.rhs.op == "and"


def test_selector_modifiers():
    e = parse_expr('m{a="b", c=~"d.*", e!~"f"} offset 5m @ 1609746000')
    assert isinstance(e, VectorSelector)
    assert e.offset_ms == 300_000 and e.at == 1_609_746_000_000
    types = {m.name: m.type for m in e.matchers}
    assert types["c"] == MatchType.RE and types["e"] == MatchType.NRE


def test_matrix_and_subquery():
    ms = parse_expr("rate(x[5m] offset -1h)").args[0]
    assert isinstance(ms, MatrixSelector)
    assert ms.range_ms == 300_000 and ms.selector.offset_ms == -3_600_000
    sq = parse_expr("max_over_time(rate(r[5m])[30m:15s])").args[0]
    assert isinstance(sq, SubqueryExpr)
    assert sq.range_ms == 1_800_000 and sq.step_ms == 15_000
    assert parse_expr("foo[10m:]").step_ms is None


def test_aggregations():
    e = parse_expr("topk(5, sum by (job) (x))")
    assert e.op == "topk" and e.param.value == 5.0 and e.expr.grouping == ["job"]
    e = parse_expr("sum(x) without (l)")
    assert e.without and e.grouping == ["l"]
    e = parse_expr("SUM BY (group) (x)")  # keywords are case-insensitive
    assert e.op == "sum" and e.grouping == ["group"]
    e = parse_expr("sum(x)")
    assert not e.has_grouping


def test_vector_matching():
    e = parse_expr("a + on(instance) group_left(version) b")
    vm = e.matching
    assert vm.on and vm.labels == ["instance"] and vm.include == ["version"]
    assert vm.card == MatchCardinality.MANY_TO_ONE
    e = parse_expr("a unless ignoring(l) b")
    assert e.matching.card == MatchCardinality.MANY_TO_MANY and not e.matching.on


def test_literals():
    assert parse_expr("0x1f").value == 31.0
    assert parse_expr("Inf").value == float("inf")
    assert math.isnan(parse_expr("NaN").value)
    assert parse_expr("5m").value == 300.0  # durations as scalars (seconds)


@pytest.mark.parametrize(
    "bad",
    [
        "sum(",
        "x{job=}",
        "rate(x[5m)",
        "x offset",
        "1 +",
        "topk(x)",
        "x > bool",
        "{}",
        "foo{} bar",
        "avg() by (l)",
        '"unterminated',
        "x @ y",
    ],
)
def test_parse_errors(bad):
    with pytest.raises(ParseError):
        parse_expr(bad)


def test_utf8_quoted_label_names():
    # bare quoted string in braces = metric-name shorthand
    # (generated_parser.y:814, parse.go:990)
    v = parse_expr('{"metric.name"}')
    assert v.name is None
    assert v.matchers == [
        type(v.matchers[0])("__name__", MatchType.EQ, "metric.name")
    ]
    v = parse_expr('{"http.requests", "service name"="api", job="x"}')
    assert [(m.name, m.type, m.value) for m in v.matchers] == [
        ("__name__", MatchType.EQ, "http.requests"),
        ("service name", MatchType.EQ, "api"),
        ("job", MatchType.EQ, "x"),
    ]
    # quoted-name matrix selector
    ms = parse_expr('{"foo"}[5m]')
    assert isinstance(ms, MatrixSelector)
    # metric name set twice (parse.go:902)
    with pytest.raises(ParseError):
        parse_expr('foo{"bar"}')
    with pytest.raises(ParseError):
        parse_expr('foo{__name__=~"bar"}')
