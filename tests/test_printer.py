"""Printer/prettifier tests (promql/parser/printer.go + prettier.go)."""

import pytest

from prometheus_spark.parser import parse_expr
from prometheus_spark.parser.printer import (
    format_duration_ms,
    format_query,
    prettify,
    to_promql,
)

CANONICAL = [
    # input → canonical String() form
    ("foo", "foo"),
    ('foo{bar="baz"}', 'foo{bar="baz"}'),
    ("foo{a='1',b!='2',c=~'3',d!~'4'}", 'foo{a="1",b!="2",c=~"3",d!~"4"}'),
    # name matcher is only elided when a bare name was written
    ('{__name__="foo"}', '{__name__="foo"}'),
    ("foo offset 5m", "foo offset 5m"),
    ("foo offset -90s", "foo offset -1m30s"),
    ("foo @ 10", "foo @ 10.000"),
    ("foo @ start()", "foo @ start()"),
    ("foo[5m]", "foo[5m]"),
    ("foo[5m] offset 1h", "foo[5m] offset 1h"),
    ("foo[90000ms]", "foo[1m30s]"),
    ("rate(foo[5m])", "rate(foo[5m])"),
    ("sum by (job) (rate(foo[5m]))", "sum by (job) (rate(foo[5m]))"),
    ("sum without (job) (foo)", "sum without (job) (foo)"),
    ("sum(foo)", "sum(foo)"),
    ("topk(5, foo)", "topk(5, foo)"),
    ("a + b", "a + b"),
    ("a == bool b", "a == bool b"),
    ("a + on (x, y) group_left (z) b", "a + on (x, y) group_left (z) b"),
    ("a / ignoring (x) b", "a / ignoring (x) b"),
    ("a and b", "a and b"),
    ("-foo", "-foo"),
    ("(a + b) * c", "(a + b) * c"),
    ("1.5 + 2", "1.5 + 2"),
    ('"hi"', '"hi"'),
    ("foo[5m:1m]", "foo[5m:1m]"),
    ("max_over_time(foo[1h:])", "max_over_time(foo[1h:])"),
    ("foo[5m] anchored", "foo[5m] anchored"),
    ("foo[5m] smoothed offset 5m", "foo[5m] smoothed offset 5m"),
]


@pytest.mark.parametrize("query,want", CANONICAL, ids=[c[0] for c in CANONICAL])
def test_canonical_string(query, want):
    assert to_promql(parse_expr(query)) == want


@pytest.mark.parametrize("query,want", CANONICAL, ids=[c[0] for c in CANONICAL])
def test_roundtrip_fixed_point(query, want):
    # parsing the canonical form and re-printing is a fixed point
    assert to_promql(parse_expr(want)) == want


def test_format_duration():
    assert format_duration_ms(0) == "0s"
    assert format_duration_ms(1000) == "1s"
    assert format_duration_ms(90_000) == "1m30s"
    assert format_duration_ms(3_600_000) == "1h"
    assert format_duration_ms(86_400_000 * 8) == "1w1d"
    assert format_duration_ms(500) == "500ms"


def test_prettify_short_unchanged():
    assert format_query("sum(foo)") == "sum(foo)"


def test_prettify_long_aggregation_splits():
    q = (
        "sum by (instance, job, region, zone) "
        "(rate(some_fairly_long_metric_name_total"
        '{environment="production",service="checkout"}[5m]))'
    )
    out = format_query(q)
    lines = out.split("\n")
    assert lines[0] == "sum by (instance, job, region, zone) ("
    assert lines[-1] == ")"
    assert lines[1].startswith("  ")


def test_prettify_long_binary_splits():
    q = (
        "some_quite_long_metric_name_number_one_total"
        " + on (instance, job, zone) "
        "some_quite_long_metric_name_number_two_total"
        '{environment="production",team="platform"}'
    )
    out = format_query(q)
    lines = out.split("\n")
    assert lines[1] == "+ on (instance, job, zone)"
    assert lines[0].startswith("  ") and lines[2].startswith("  ")


def test_format_query_endpoint(spark):
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.web import PromAPI

    api = PromAPI(PromQLEngine(spark, samples_from_rows(spark, [])))
    code, resp = api.handle("/api/v1/format_query", {"query": ["sum(  foo )"]})
    assert code == 200 and resp["data"] == "sum(foo)"
    code, resp = api.handle("/api/v1/format_query", {"query": ["foo{"]})
    assert code == 400


def test_utf8_label_name_quoting():
    # non-legacy label names render quoted (matcher.go:86 shouldQuoteName)
    assert to_promql(parse_expr('{"my.label"="x", job="a"}')) == (
        '{"my.label"="x",job="a"}'
    )
    # quoted metric-name shorthand round-trips through the __name__ matcher
    assert to_promql(parse_expr('{"metric.name"}')) == '{__name__="metric.name"}'


def test_printer_roundtrip_over_reference_corpus():
    """For every eval expression in the reference's promqltest corpus,
    parse → to_promql → parse must reproduce the identical AST (modulo
    source positions, which astjson does not serialize).  Exercises the
    printer against thousands of real queries, including ones expected
    to fail at EVALUATION time (they still parse)."""
    import glob
    import re

    from prometheus_spark.parser import parse_expr
    from prometheus_spark.parser.astjson import ast_to_dict

    instant = re.compile(
        r"^eval(?:_(?:fail|warn|info|ordered))?\s+instant\s+at\s+\S+\s+(.*)$"
    )
    rng = re.compile(
        r"^eval(?:_(?:fail|warn|info|ordered))?\s+range\s+from\s+\S+"
        r"\s+to\s+\S+\s+step\s+\S+\s+(.*)$"
    )
    exprs = []
    for path in sorted(
        glob.glob("/root/reference/promql/promqltest/testdata/*.test")
    ):
        for line in open(path, encoding="utf-8"):
            s = line.strip()
            m = instant.match(s) or rng.match(s)
            if m:
                exprs.append(m.group(1))
    assert len(exprs) > 1500, f"corpus extraction looks broken: {len(exprs)}"

    def _norm(v):
        # NaN != NaN would flag literal-NaN queries as divergent
        if isinstance(v, float):
            return "NaN" if v != v else v
        if isinstance(v, dict):
            return {k: _norm(x) for k, x in v.items()}
        if isinstance(v, list):
            out = [_norm(x) for x in v]
            # matcher lists are an unordered conjunction; the printer
            # canonicalizes by sorting (like the reference's
            # printer.go:400), so compare order-insensitively
            if out and all(
                isinstance(x, dict) and set(x) == {"name", "type", "value"}
                for x in out
            ):
                out = sorted(
                    out, key=lambda m: (m["name"], m["type"], m["value"])
                )
            return out
        return v

    checked = parse_failures = 0
    for q in exprs:
        try:
            ast1 = parse_expr(q)
        except Exception:
            # eval_fail lines may be parse-time failures; skip those
            parse_failures += 1
            continue
        printed = to_promql(ast1)
        ast2 = parse_expr(printed)
        assert _norm(ast_to_dict(ast2)) == _norm(ast_to_dict(ast1)), (
            f"round-trip diverged:\n  in:  {q}\n  out: {printed}"
        )
        # the multiline prettifier must also reparse to the same AST
        pretty = prettify(ast1)
        ast3 = parse_expr(pretty)
        assert _norm(ast_to_dict(ast3)) == _norm(ast_to_dict(ast1)), (
            f"prettify round-trip diverged:\n  in:  {q}\n  out: {pretty}"
        )
        checked += 1
    # the corpus is overwhelmingly parseable — guard against silently
    # skipping everything
    assert checked > 1500 and parse_failures < 200, (checked, parse_failures)


def test_printer_roundtrip_random_asts():
    """Property test: random well-formed PromQL expressions round-trip
    through the printer (hypothesis-generated, beyond what the corpus
    covers — deep nesting, modifier combinations, odd label values)."""
    from hypothesis import given, settings, strategies as st

    from prometheus_spark.parser import parse_expr

    names = st.sampled_from(["up", "http_requests_total", "node_load1"])
    lnames = st.sampled_from(["job", "instance", "env", "code"])
    lvals = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters='"\\\n'
        ),
        max_size=8,
    )
    ops = st.sampled_from(["=", "!=", "=~", "!~"])
    durs = st.sampled_from(["30s", "5m", "1h", "90s"])
    aggs = st.sampled_from(["sum", "min", "max", "avg", "count", "group"])
    binops = st.sampled_from(["+", "-", "*", "/", "and", "or", "unless"])
    fns1 = st.sampled_from(["abs", "ceil", "rate", "increase", "changes"])

    @st.composite
    def selector(draw):
        name = draw(names)
        matchers = draw(
            st.lists(st.tuples(lnames, ops, lvals), max_size=2, unique_by=lambda m: m[0])
        )
        ms = ",".join(
            f'{ln}{op}{json.dumps(lv)}' for ln, op, lv in matchers
        )
        sel = name + ("{" + ms + "}" if ms else "")
        if draw(st.booleans()):
            sel += f" offset {draw(durs)}"
        return sel

    import json

    @st.composite
    def expr(draw, depth=0):
        if depth >= 3:
            return draw(selector())
        kind = draw(st.integers(0, 3))
        if kind == 0:
            return draw(selector())
        if kind == 1:
            inner = draw(expr(depth=depth + 1))
            return f"{draw(aggs)} by (job) ({inner})"
        if kind == 2:
            fn = draw(fns1)
            if fn in ("rate", "increase", "changes"):
                return f"{fn}({draw(selector())}[{draw(durs)}])"
            return f"{fn}({draw(expr(depth=depth + 1))})"
        return (
            f"({draw(expr(depth=depth + 1))}) {draw(binops)} "
            f"({draw(expr(depth=depth + 1))})"
        )

    @settings(max_examples=200, deadline=None)
    @given(expr())
    def check(q):
        ast1 = parse_expr(q)
        printed = to_promql(ast1)
        ast2 = parse_expr(printed)
        assert to_promql(ast2) == printed  # printing is a fixpoint

    check()
