"""Canonical PromQL formatting: String() and Prettify().

Reference: promql/parser/printer.go (String forms: matcher quoting,
name-matcher elision, ``@``/``offset``/``anchored``/``smoothed``
ordering, duration rendering via common/model.Duration) and
promql/parser/prettier.go (indent two spaces per level; a node splits
across lines when its String() exceeds 100 characters).

Duration expressions (``step()``/``range()``-based offsets) lose their
source form in our AST (they compile to closures), so formatting one
raises ``FormatError`` — format_query rejects those like any bad input.
"""

from __future__ import annotations

import json

from prometheus_spark.parser.ast import (
    AggregateExpr,
    AT_END,
    AT_START,
    BinaryExpr,
    Call,
    DurationValue,
    Expr,
    MatchCardinality,
    MatrixSelector,
    NumberLiteral,
    PARAM_AGGREGATORS,
    ParenExpr,
    StringLiteral,
    SubqueryExpr,
    UnaryExpr,
    VectorSelector,
)

MAX_CHARACTERS_PER_LINE = 100  # prettier.go:45


class FormatError(ValueError):
    pass


_UNITS = [
    ("y", 365 * 24 * 3600 * 1000),
    ("w", 7 * 24 * 3600 * 1000),
    ("d", 24 * 3600 * 1000),
    ("h", 3600 * 1000),
    ("m", 60 * 1000),
    ("s", 1000),
    ("ms", 1),
]


def format_duration_ms(ms: int) -> str:
    """common/model.Duration.String(): greedy unit decomposition."""
    if ms == 0:
        return "0s"
    sign = "-" if ms < 0 else ""
    ms = abs(int(ms))
    out = []
    for unit, factor in _UNITS:
        if ms >= factor:
            out.append(f"{ms // factor}{unit}")
            ms %= factor
    return sign + "".join(out)


def _fmt_number(v: float) -> str:
    """strconv.FormatFloat(v, 'f', -1, 64) — never exponent form."""
    import math

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    s = repr(v)
    if "e" in s or "E" in s:
        from decimal import Decimal

        s = format(Decimal(s), "f")
    if s.endswith(".0"):
        s = s[:-2]
    return s


def _quote(s: str) -> str:
    return json.dumps(s)


def _legacy_name(name: str) -> bool:
    """True when the label name needs no quoting (matcher.go:97
    shouldQuoteName inverted): legacy [a-zA-Z_][a-zA-Z0-9_]* names."""
    if not name:
        return False
    for i, c in enumerate(name):
        if c == "_" or c.isascii() and (c.isalpha() or (i > 0 and c.isdigit())):
            continue
        return False
    return True


def _fmt_matcher(m) -> str:
    lhs = m.name if _legacy_name(m.name) else _quote(m.name)
    return f"{lhs}{m.type.value}{_quote(m.value)}"


def _dur(v, what: str = "duration") -> str:
    if isinstance(v, DurationValue):
        if v.src:
            return v.src
        raise FormatError(f"cannot format a computed {what} expression")
    return format_duration_ms(int(v))


def _at_offset_suffix(at, offset_ms) -> str:
    out = ""
    if at is not None:
        if at == AT_START:
            out += " @ start()"
        elif at == AT_END:
            out += " @ end()"
        else:
            out += f" @ {at / 1000.0:.3f}"
    if isinstance(offset_ms, DurationValue):
        out += f" offset {_dur(offset_ms, 'offset')}"
    elif offset_ms:
        if offset_ms > 0:
            out += f" offset {format_duration_ms(offset_ms)}"
        else:
            out += f" offset -{format_duration_ms(-offset_ms)}"
    return out


def _vector_selector_str(
    node: VectorSelector, with_modifiers: bool = True
) -> str:
    label_strings = []
    for m in node.matchers:
        # elide the implicit name matcher (printer.go:390-393)
        if m.name == "__name__" and m.type.value == "=" and m.value == (
            node.name or ""
        ) and m.value != "":
            continue
        label_strings.append(_fmt_matcher(m))
    out = node.name or ""
    if label_strings:
        # the reference canonicalizes by sorting the matcher strings
        # (printer.go:400 sort.Strings) — matchers are an unordered
        # conjunction, so this is lossless up to ordering
        out += "{" + ",".join(sorted(label_strings)) + "}"
    if not with_modifiers:
        return out
    if node.at is not None:
        if node.at == AT_START:
            out += " @ start()"
        elif node.at == AT_END:
            out += " @ end()"
        else:
            out += f" @ {node.at / 1000.0:.3f}"
    if node.anchored:
        out += " anchored"
    elif node.smoothed:
        out += " smoothed"
    if isinstance(node.offset_ms, DurationValue):
        out += f" offset {_dur(node.offset_ms, 'offset')}"
    elif node.offset_ms > 0:
        out += f" offset {format_duration_ms(node.offset_ms)}"
    elif node.offset_ms < 0:
        out += f" offset -{format_duration_ms(-node.offset_ms)}"
    return out


def _agg_op_str(node: AggregateExpr) -> str:
    out = node.op
    if node.has_grouping and node.without:
        out += " without (" + ", ".join(node.grouping) + ") "
    elif node.has_grouping:
        # an explicit empty `by ()` is preserved (our AST distinguishes
        # it from no grouping; the reference's cannot, so its String()
        # collapses both — semantically identical either way)
        out += " by (" + ", ".join(node.grouping) + ") "
    return out


def _matching_str(node: BinaryExpr) -> str:
    out = ""
    vm = node.matching
    if vm is not None:
        many = vm.card in (
            MatchCardinality.MANY_TO_ONE,
            MatchCardinality.ONE_TO_MANY,
        )
        if vm.labels or vm.on or many:
            tag = "on" if vm.on else "ignoring"
            out += f" {tag} (" + ", ".join(vm.labels) + ")"
        elif vm.card == MatchCardinality.ONE_TO_ONE:
            # an explicit empty `ignoring ()` on an arithmetic/comparison
            # op (set ops default to a non-None many-to-many matching, so
            # eliding there is lossless; here vm would otherwise be None)
            out += " ignoring ()"
        if many:
            card = (
                "left" if vm.card == MatchCardinality.MANY_TO_ONE else "right"
            )
            out += f" group_{card} (" + ", ".join(vm.include) + ")"
    if node.fill_lhs is not None or node.fill_rhs is not None:
        if (
            node.fill_lhs is not None
            and node.fill_rhs is not None
            and node.fill_lhs == node.fill_rhs
        ):
            out += f" fill ({_fmt_number(node.fill_lhs)})"
        else:
            if node.fill_lhs is not None:
                out += f" fill_left ({_fmt_number(node.fill_lhs)})"
            if node.fill_rhs is not None:
                out += f" fill_right ({_fmt_number(node.fill_rhs)})"
    return out


def to_promql(node: Expr) -> str:
    """parser printer String(): canonical single-line form."""
    if isinstance(node, NumberLiteral):
        return _fmt_number(node.value)
    if isinstance(node, StringLiteral):
        return _quote(node.value)
    if isinstance(node, VectorSelector):
        return _vector_selector_str(node)
    if isinstance(node, MatrixSelector):
        sel = node.selector
        base = _vector_selector_str(sel, with_modifiers=False)
        ext = ""
        if node.anchored or sel.anchored:
            ext = " anchored"
        elif node.smoothed or sel.smoothed:
            ext = " smoothed"
        return (
            f"{base}[{_dur(node.range_ms, 'range')}]{ext}"
            + _at_offset_suffix(sel.at, sel.offset_ms)
        )
    if isinstance(node, SubqueryExpr):
        step = "" if node.step_ms is None else _dur(node.step_ms, "step")
        return (
            f"{to_promql(node.expr)}[{_dur(node.range_ms, 'range')}:{step}]"
            + _at_offset_suffix(node.at, node.offset_ms)
        )
    if isinstance(node, Call):
        return node.func + "(" + ", ".join(to_promql(a) for a in node.args) + ")"
    if isinstance(node, BinaryExpr):
        return (
            to_promql(node.lhs)
            + " "
            + node.op
            + (" bool" if node.return_bool else "")
            + _matching_str(node)
            + " "
            + to_promql(node.rhs)
        )
    if isinstance(node, UnaryExpr):
        # avoid `-+Inf`/`++Inf`: _fmt_number signs infinities itself
        if isinstance(node.expr, NumberLiteral) and node.expr.value == float(
            "inf"
        ):
            return node.op + "Inf"
        return node.op + to_promql(node.expr)
    if isinstance(node, ParenExpr):
        return "(" + to_promql(node.expr) + ")"
    if isinstance(node, AggregateExpr):
        out = _agg_op_str(node) + "("
        if node.op in PARAM_AGGREGATORS and node.param is not None:
            out += to_promql(node.param) + ", "
        return out + to_promql(node.expr) + ")"
    raise FormatError(f"cannot format {type(node).__name__}")


# ---------------------------------------------------------------------------
# Prettify (prettier.go): split nodes whose String() exceeds 100 chars


def _indent(level: int) -> str:
    return "  " * level


def _needs_split(node: Expr) -> bool:
    return len(to_promql(node)) > MAX_CHARACTERS_PER_LINE


def prettify(node: Expr, level: int = 0) -> str:
    if isinstance(node, AggregateExpr):
        if not _needs_split(node):
            return _indent(level) + to_promql(node)
        out = _indent(level) + _agg_op_str(node) + "(\n"
        if node.op in PARAM_AGGREGATORS and node.param is not None:
            out += prettify(node.param, level + 1) + ",\n"
        return out + prettify(node.expr, level + 1) + "\n" + _indent(level) + ")"
    if isinstance(node, BinaryExpr):
        if not _needs_split(node):
            return _indent(level) + to_promql(node)
        return (
            prettify(node.lhs, level + 1)
            + "\n"
            + _indent(level)
            + node.op
            + (" bool" if node.return_bool else "")
            + _matching_str(node)
            + "\n"
            + prettify(node.rhs, level + 1)
        )
    if isinstance(node, Call):
        if not _needs_split(node):
            return _indent(level) + to_promql(node)
        args = ",\n".join(prettify(a, level + 1) for a in node.args)
        return (
            _indent(level) + node.func + "(\n" + args + "\n" + _indent(level) + ")"
        )
    if isinstance(node, ParenExpr):
        if not _needs_split(node):
            return _indent(level) + to_promql(node)
        return (
            _indent(level)
            + "(\n"
            + prettify(node.expr, level + 1)
            + "\n"
            + _indent(level)
            + ")"
        )
    if isinstance(node, SubqueryExpr):
        if not _needs_split(node):
            return to_promql(node)
        step = "" if node.step_ms is None else _dur(node.step_ms, "step")
        return (
            prettify(node.expr, level)
            + f"[{_dur(node.range_ms, 'range')}:{step}]"
            + _at_offset_suffix(node.at, node.offset_ms)
        )
    if isinstance(node, UnaryExpr):
        child = prettify(node.expr, level).strip()
        return _indent(level) + node.op + child
    # selectors and literals never split (prettier.go getCommonPrefixIndent)
    return _indent(level) + to_promql(node)


def format_query(query: str) -> str:
    """api.go format_query endpoint body: parse + Prettify."""
    from prometheus_spark.parser import parse_expr

    return prettify(parse_expr(query), 0)
