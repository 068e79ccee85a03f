"""PromQL recursive-descent / precedence-climbing parser.

Grammar follows the reference LALR grammar
(promql/parser/generated_parser.y) re-derived by hand; precedence (low→high)
or, and/unless, comparisons, +/-, */%, atan2, ^(right-assoc), unary.
"""

from __future__ import annotations

from typing import Optional

from prometheus_spark.parser import ast
from prometheus_spark.parser.ast import (
    AGGREGATORS,
    AT_END,
    AT_START,
    PARAM_AGGREGATORS,
    AggregateExpr,
    BinaryExpr,
    Call,
    Expr,
    MatchCardinality,
    Matcher,
    MatchType,
    MatrixSelector,
    NumberLiteral,
    ParenExpr,
    StringLiteral,
    SubqueryExpr,
    UnaryExpr,
    ValueType,
    VectorMatching,
    VectorSelector,
)
from prometheus_spark.parser.functions import FUNCTIONS
from prometheus_spark.parser.lexer import ParseError, Token, parse_duration_ms, tokenize, unquote

# precedence table: higher binds tighter
_PRECEDENCE = {
    "or": 1,
    "and": 2, "unless": 2,
    "==": 3, "!=": 3, "<": 3, ">": 3, "<=": 3, ">=": 3, "</": 3, ">/": 3,
    "+": 4, "-": 4,
    "*": 5, "/": 5, "%": 5,
    "atan2": 6,
    "^": 7,
}
_RIGHT_ASSOC = {"^"}
_COMPARISONS = {"==", "!=", "<", ">", "<=", ">="}
_SET_OPS = {"and", "or", "unless"}


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    # --- token helpers -------------------------------------------------
    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def accept(self, kind: str, text: Optional[str] = None) -> Optional[Token]:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: Optional[str] = None) -> Token:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise ParseError(f"expected {text or kind}, got {got.text!r} at {got.pos}")
        return t

    def accept_ident(self, *words: str) -> Optional[Token]:
        # PromQL keywords are case-insensitive (reference: parser/lex.go)
        t = self.peek()
        if t.kind == "IDENT" and t.text.lower() in words:
            return self.next()
        return None

    # --- entry ----------------------------------------------------------
    def parse(self) -> Expr:
        e = self.parse_expr(0)
        t = self.peek()
        if t.kind != "EOF":
            raise ParseError(f"unexpected trailing input {t.text!r} at {t.pos}")
        return e

    def parse_expr(self, min_prec: int) -> Expr:
        lhs = self.parse_unary()
        while True:
            t = self.peek()
            op = t.text if t.kind == "OP" else (t.text.lower() if t.kind == "IDENT" else None)
            if op not in _PRECEDENCE:
                return lhs
            prec = _PRECEDENCE[op]
            if prec < min_prec:
                return lhs
            self.next()
            return_bool = bool(self.accept_ident("bool"))
            matching = self.parse_matching(op)
            fill_lhs, fill_rhs = self.parse_fill_modifiers()
            next_min = prec if op in _RIGHT_ASSOC else prec + 1
            rhs = self.parse_expr(next_min)
            if return_bool and op not in _COMPARISONS:
                raise ParseError("bool modifier only allowed on comparison operators")
            lhs = BinaryExpr(
                op, lhs, rhs, matching=matching, return_bool=return_bool,
                fill_lhs=fill_lhs, fill_rhs=fill_rhs,
            )
        return lhs

    def parse_fill_modifiers(self):
        """``fill(v)`` / ``fill_left(v)`` / ``fill_right(v)`` — outer-join
        substitution values (reference: lex.go:140-142, ast.go:329)."""
        fill_lhs = fill_rhs = None
        while True:
            # only a modifier when followed by '(' — `fill` alone is a
            # perfectly good metric name
            nxt = self.peek(1)
            if not (nxt.kind == "OP" and nxt.text == "("):
                return fill_lhs, fill_rhs
            t = self.accept_ident("fill", "fill_left", "fill_right")
            if t is None:
                return fill_lhs, fill_rhs
            self.expect("OP", "(")
            neg = bool(self.accept("OP", "-"))
            if not neg:
                self.accept("OP", "+")  # the printer signs infinities
            tok = self.next()
            if tok.kind != "NUMBER":
                raise ParseError(f"fill: expected number at {tok.pos}")
            from prometheus_spark.parser.parser import _number

            v = _number(tok.text)
            if neg:
                v = -v
            self.expect("OP", ")")
            kind = t.text.lower()
            if kind in ("fill", "fill_left"):
                fill_lhs = v
            if kind in ("fill", "fill_right"):
                fill_rhs = v

    def parse_matching(self, op: str) -> Optional[VectorMatching]:
        t = self.peek()
        if t.kind != "IDENT" or t.text.lower() not in ("on", "ignoring"):
            if op in _SET_OPS:
                return VectorMatching(card=MatchCardinality.MANY_TO_MANY)
            return None
        on = self.next().text.lower() == "on"
        labels = self.parse_label_list()
        vm = VectorMatching(labels=labels, on=on)
        if op in _SET_OPS:
            vm.card = MatchCardinality.MANY_TO_MANY
            return vm
        g = self.accept_ident("group_left", "group_right")
        if g:
            vm.card = (
                MatchCardinality.MANY_TO_ONE
                if g.text.lower() == "group_left"
                else MatchCardinality.ONE_TO_MANY
            )
            if self.peek().kind == "OP" and self.peek().text == "(":
                vm.include = self.parse_label_list()
        return vm

    def parse_label_list(self) -> list[str]:
        self.expect("OP", "(")
        labels: list[str] = []
        if not self.accept("OP", ")"):
            while True:
                tok = self.peek()
                if tok.kind in ("IDENT", "DURATION"):
                    labels.append(self.next().text)
                elif tok.kind == "STRING":
                    labels.append(unquote(self.next().text))
                else:
                    raise ParseError(f"expected label name at {tok.pos}")
                if not self.accept("OP", ","):
                    break
            self.expect("OP", ")")
        return labels

    # --- unary / postfix -------------------------------------------------
    def parse_unary(self) -> Expr:
        if self.accept("OP", "-"):
            inner = self.parse_unary()
            # fold sign into number literals like the reference parser
            # (generated_parser.y unary_expr: NumberLiteral negated in
            # place) so `-Inf`/`-1` round-trip as literals
            if isinstance(inner, NumberLiteral):
                return NumberLiteral(-inner.value)
            return UnaryExpr("-", inner)
        if self.accept("OP", "+"):
            inner = self.parse_unary()
            if isinstance(inner, NumberLiteral):
                return inner
            return UnaryExpr("+", inner)
        return self.parse_postfix(self.parse_atom())

    def parse_postfix(self, e: Expr) -> Expr:
        while True:
            if self.peek().kind == "OP" and self.peek().text == "[":
                e = self.parse_range_suffix(e)
                continue
            if self.peek().kind == "IDENT" and self.peek().text in ("anchored", "smoothed"):
                kw = self.next().text
                target = e
                while isinstance(target, ParenExpr):
                    target = target.expr
                if not isinstance(target, (MatrixSelector, VectorSelector)):
                    raise ParseError(f"{kw} modifier must follow a selector")
                if kw == "anchored":
                    target.anchored = True
                else:
                    target.smoothed = True
                if target.anchored and target.smoothed:
                    raise ParseError("cannot use anchored and smoothed together")
                continue
            if self.accept_ident("offset"):
                # offset binds a single signed duration primary — trailing
                # operators belong to the surrounding expression
                # (`m offset 100 + 2` ≡ (m offset 100) + 2)
                off = self.parse_offset_duration()
                e = self._apply_modifier(e, offset_ms=off)
                continue
            if self.accept("OP", "@"):
                e = self._apply_modifier(e, at=self.parse_at_value())
                continue
            return e

    def parse_at_value(self):
        t = self.peek()
        if t.kind == "IDENT" and t.text.lower() in ("start", "end"):
            self.next()
            self.expect("OP", "(")
            self.expect("OP", ")")
            return AT_START if t.text.lower() == "start" else AT_END
        neg = bool(self.accept("OP", "-"))
        tok = self.next()
        if tok.kind == "NUMBER":
            ts = int(float(tok.text) * 1000)
        elif tok.kind == "DURATION":  # `@ 1m40s` — duration-style timestamp
            ts = parse_duration_ms(tok.text)
        else:
            raise ParseError(f"expected timestamp after @ at {tok.pos}")
        return -ts if neg else ts

    def _apply_modifier(self, e: Expr, offset_ms: Optional[int] = None, at=None) -> Expr:
        target = e
        while isinstance(target, ParenExpr):
            target = target.expr
        if isinstance(target, MatrixSelector):
            target = target.selector
        if not isinstance(target, (VectorSelector, SubqueryExpr)):
            raise ParseError("offset/@ modifier must follow a selector or subquery")
        if offset_ms is not None:
            from prometheus_spark.parser.ast import DurationValue

            if target.offset_ms == 0 and not isinstance(
                target.offset_ms, DurationValue
            ):
                # first offset modifier — no need to compose with the
                # implicit 0 (keeps DurationValue src reparseable)
                target.offset_ms = offset_ms
            elif isinstance(target.offset_ms, DurationValue) or isinstance(
                offset_ms, DurationValue
            ):
                prev, new = target.offset_ms, offset_ms
                pf = (
                    prev.fn
                    if isinstance(prev, DurationValue)
                    else (lambda qc, v=prev: v / 1000.0)
                )
                nf = (
                    new.fn
                    if isinstance(new, DurationValue)
                    else (lambda qc, v=new: v / 1000.0)
                )
                from prometheus_spark.parser.printer import format_duration_ms

                def _osrc(v):
                    return (
                        v.src
                        if isinstance(v, DurationValue)
                        else format_duration_ms(int(v))
                    )

                target.offset_ms = DurationValue(
                    lambda qc: pf(qc) + nf(qc),
                    f"({_osrc(prev)} + {_osrc(new)})",
                )
            else:
                target.offset_ms += offset_ms
        if at is not None:
            target.at = at
        return e

    def parse_duration_token(self) -> int:
        if self.peek().kind == "OP" and self.peek().text == "(":
            return self.parse_duration_expr()
        t = self.next()
        if t.kind in ("DURATION", "NUMBER"):
            return parse_duration_ms(t.text)
        raise ParseError(f"expected duration, got {t.text!r} at {t.pos}")

    # --- duration expressions (experimental; reference promql/durations.go)
    # ``[26m+4m]``, ``[1h/2]``, ``[step()*2]``, ``[min_of(step()+1, 1h)]`` —
    # constant-folded at parse time unless query-context functions appear,
    # in which case a DurationValue closure defers resolution to eval time.
    # Operands are seconds; duration literals convert to seconds.
    _DUR_PRECEDENCE = {"+": 1, "-": 1, "*": 2, "/": 2, "%": 2, "^": 3}
    _DUR_CTX_FUNCS = ("step", "range", "min_of", "max_of")

    def parse_duration_expr(self, min_prec: int = 0, as_ms: bool = True):
        left = self._dur_primary()
        while True:
            t = self.peek()
            op = t.text if t.kind == "OP" else None
            if op not in self._DUR_PRECEDENCE or self._DUR_PRECEDENCE[op] < min_prec:
                break
            # only continue when the operand is duration-shaped — keeps
            # `offset 5m > 3` and `offset 5m + some_metric` unambiguous
            if not self._dur_operand_follows(1):
                break
            self.next()
            nxt = (
                self._DUR_PRECEDENCE[op] if op == "^" else self._DUR_PRECEDENCE[op] + 1
            )
            right = self.parse_duration_expr(nxt, as_ms=False)
            left = _dur_combine(op, left, right)
        if not as_ms:
            return left
        return self._dur_to_ms(left)

    def _dur_to_ms(self, v):
        from prometheus_spark.parser.ast import DurationValue

        if isinstance(v, DurationValue):
            return v
        return int(round(v * 1000))

    def _dur_operand_follows(self, ahead: int) -> bool:
        t = self.peek(ahead)
        if t.kind in ("NUMBER", "DURATION"):
            return True
        if t.kind == "OP" and t.text in ("(", "-", "+"):
            return True
        return t.kind == "IDENT" and t.text.lower() in self._DUR_CTX_FUNCS

    def parse_offset_duration(self):
        sign = 1.0
        if self.accept("OP", "-"):
            sign = -1.0
        else:
            self.accept("OP", "+")
        prim = self._dur_primary_nosign()
        if sign == 1.0:
            return self._dur_to_ms(prim)
        return self._dur_to_ms(_dur_combine("*", sign, prim))

    def _dur_primary_nosign(self):
        from prometheus_spark.parser.ast import DurationValue

        if self.peek().kind == "OP" and self.peek().text == "(":
            self.next()
            v = self.parse_duration_expr(as_ms=False)
            self.expect("OP", ")")
            return v
        t = self.peek()
        if t.kind == "IDENT" and t.text.lower() in self._DUR_CTX_FUNCS:
            return self._dur_primary()
        t = self.next()
        if t.kind in ("DURATION", "NUMBER"):
            return parse_duration_ms(t.text) / 1000.0
        raise ParseError(f"expected duration, got {t.text!r} at {t.pos}")

    def _dur_primary(self):
        from prometheus_spark.parser.ast import DurationValue

        if self.accept("OP", "("):
            v = self.parse_duration_expr(as_ms=False)
            self.expect("OP", ")")
            return v
        if self.accept("OP", "-"):
            # unary minus binds looser than ^ : -2^2 == -(2^2)
            return _dur_combine("*", -1.0, self.parse_duration_expr(
                self._DUR_PRECEDENCE["^"], as_ms=False
            ))
        if self.accept("OP", "+"):
            return self.parse_duration_expr(self._DUR_PRECEDENCE["^"], as_ms=False)
        t = self.peek()
        if t.kind == "IDENT" and t.text.lower() in ("step", "range"):
            self.next()
            self.expect("OP", "(")
            self.expect("OP", ")")
            key = t.text.lower()
            return DurationValue(lambda qc, k=key: qc[k], f"{key}()")
        if t.kind == "IDENT" and t.text.lower() in ("min_of", "max_of"):
            self.next()
            self.expect("OP", "(")
            a = self.parse_duration_expr(as_ms=False)
            self.expect("OP", ",")
            b = self.parse_duration_expr(as_ms=False)
            self.expect("OP", ")")
            pick = min if t.text.lower() == "min_of" else max
            return _dur_combine("minmax", a, b, pick)
        t = self.next()
        if t.kind in ("DURATION", "NUMBER"):
            return parse_duration_ms(t.text) / 1000.0
        raise ParseError(f"expected duration operand, got {t.text!r} at {t.pos}")

    def parse_range_suffix(self, e: Expr) -> Expr:
        from prometheus_spark.parser.ast import DurationValue

        self.expect("OP", "[")
        rng = self.parse_duration_expr()
        if not isinstance(rng, DurationValue) and rng <= 0:
            raise ParseError("duration must be greater than 0")
        if self.accept("OP", ":"):
            # subquery  expr[range:step]
            step = None
            if not (self.peek().kind == "OP" and self.peek().text == "]"):
                step = self.parse_duration_expr()
            self.expect("OP", "]")
            if e.value_type() not in (ValueType.VECTOR, ValueType.SCALAR):
                raise ParseError("subquery is only allowed on instant vector")
            return SubqueryExpr(e, rng, step)
        self.expect("OP", "]")
        inner = e
        while isinstance(inner, ParenExpr):
            inner = inner.expr
        if not isinstance(inner, VectorSelector):
            raise ParseError("range specification only allowed on vector selectors")
        return MatrixSelector(inner, rng)

    # --- atoms ------------------------------------------------------------
    def parse_atom(self) -> Expr:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return NumberLiteral(_number(t.text))
        if t.kind == "DURATION":
            self.next()
            return NumberLiteral(parse_duration_ms(t.text) / 1000.0)
        if t.kind == "STRING":
            self.next()
            return StringLiteral(unquote(t.text))
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.parse_expr(0)
            self.expect("OP", ")")
            return ParenExpr(e)
        if t.kind == "OP" and t.text == "{":
            return self.parse_vector_selector(None)
        if t.kind == "IDENT":
            if t.text.lower() in AGGREGATORS:
                return self.parse_aggregate()
            nxt = self.peek(1)
            if t.text in FUNCTIONS and nxt.kind == "OP" and nxt.text == "(":
                return self.parse_call()
            return self.parse_vector_selector(self.next().text)
        raise ParseError(f"unexpected token {t.text!r} at {t.pos}")

    def parse_call(self) -> Expr:
        name = self.next().text
        sig = FUNCTIONS[name]
        self.expect("OP", "(")
        args: list[Expr] = []
        if not self.accept("OP", ")"):
            while True:
                args.append(self.parse_expr(0))
                if not self.accept("OP", ","):
                    break
            self.expect("OP", ")")
        n_req = len(sig.arg_types) - (sig.variadic if sig.variadic > 0 else 0)
        if sig.variadic == -1:
            if len(args) < len(sig.arg_types) - 1:
                raise ParseError(f"{name}: expected at least {len(sig.arg_types) - 1} args")
        elif not (n_req <= len(args) <= len(sig.arg_types)):
            raise ParseError(
                f"{name}: expected {n_req}..{len(sig.arg_types)} args, got {len(args)}"
            )
        return Call(name, args)

    def parse_aggregate(self) -> Expr:
        op = self.next().text.lower()
        grouping: list[str] = []
        without = False
        has_grouping = False
        if self.accept_ident("by"):
            grouping, has_grouping = self.parse_label_list(), True
        elif self.accept_ident("without"):
            grouping, without, has_grouping = self.parse_label_list(), True, True
        self.expect("OP", "(")
        param = None
        first = self.parse_expr(0)
        if self.accept("OP", ","):
            param = first
            first = self.parse_expr(0)
        self.expect("OP", ")")
        if not has_grouping:
            if self.accept_ident("by"):
                grouping, has_grouping = self.parse_label_list(), True
            elif self.accept_ident("without"):
                grouping, without, has_grouping = self.parse_label_list(), True, True
        if op in PARAM_AGGREGATORS and param is None:
            raise ParseError(f"{op} expects a parameter")
        if op not in PARAM_AGGREGATORS and param is not None:
            raise ParseError(f"{op} does not take a parameter")
        return AggregateExpr(
            op, first, param=param, grouping=grouping, without=without, has_grouping=has_grouping
        )

    def parse_vector_selector(self, name: Optional[str]) -> Expr:
        matchers: list[Matcher] = []
        if self.peek().kind == "OP" and self.peek().text == "{":
            self.next()
            if not self.accept("OP", "}"):
                while True:
                    matchers.append(self.parse_matcher())
                    if not self.accept("OP", ","):
                        break
                self.expect("OP", "}")
        if name is not None:
            # explicit outer metric name + a quoted name matcher inside the
            # braces is an error (parse.go:902 "metric name must not be set
            # twice"); other __name__ matchers (e.g. regex) are allowed
            for m in matchers:
                if m.name == "__name__":
                    raise ParseError(
                        f"metric name must not be set twice: {name!r} or {m.value!r}"
                    )
            matchers.append(Matcher("__name__", MatchType.EQ, name))
        if not any(
            (m.name == "__name__" and m.type == MatchType.EQ)
            or (m.type in (MatchType.EQ, MatchType.RE) and m.value != "")
            for m in matchers
        ) and not matchers:
            raise ParseError("vector selector must contain at least one matcher")
        return VectorSelector(name, matchers)

    def parse_matcher(self) -> Matcher:
        t = self.next()
        if t.kind == "STRING":
            lname = unquote(t.text)
            # a bare quoted string inside braces is the UTF-8 metric-name
            # shorthand: {"http.requests"} ≡ {__name__="http.requests"}
            # (generated_parser.y:814 string_identifier →
            # newMetricNameMatcher, parse.go:990)
            nxt = self.peek()
            if not (nxt.kind == "OP" and nxt.text in ("=", "!=", "=~", "!~")):
                return Matcher("__name__", MatchType.EQ, lname)
        elif t.kind in ("IDENT", "DURATION"):
            lname = t.text
        else:
            raise ParseError(f"expected label name at {t.pos}")
        op_tok = self.next()
        if op_tok.kind != "OP" or op_tok.text not in ("=", "!=", "=~", "!~"):
            raise ParseError(f"expected matcher operator at {op_tok.pos}")
        val_tok = self.expect("STRING")
        return Matcher(lname, MatchType(op_tok.text), unquote(val_tok.text))


def _dur_combine(op, left, right, pick=None):
    """Combine duration operands; closes over DurationValue lazily."""
    import math as _m

    from prometheus_spark.parser.ast import DurationValue

    def apply(a: float, b: float) -> float:
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            if b == 0:
                raise ParseError("division by zero in duration expression")
            return a / b
        if op == "%":
            return _m.fmod(a, b) if b != 0 else float("nan")
        if op == "^":
            return a**b
        if op == "minmax":
            return pick(a, b)
        raise ParseError(f"bad duration operator {op}")

    if isinstance(left, DurationValue) or isinstance(right, DurationValue):
        lf = left.fn if isinstance(left, DurationValue) else (lambda qc, v=left: v)
        rf = right.fn if isinstance(right, DurationValue) else (lambda qc, v=right: v)
        if op == "minmax":
            src = (
                f"{'min_of' if pick is min else 'max_of'}"
                f"({_dur_src(left)}, {_dur_src(right)})"
            )
        elif op == "*" and left == -1.0:
            # produced only by unary minus (parse_duration_expr)
            src = f"-{_dur_src(right)}"
        else:
            src = f"({_dur_src(left)} {op} {_dur_src(right)})"
        return DurationValue(lambda qc: apply(lf(qc), rf(qc)), src)
    return apply(left, right)


def _dur_src(v) -> str:
    """Reparseable rendering of a duration operand: a DurationValue's
    recorded source, or a folded constant in seconds re-encoded as a
    duration literal (ms precision)."""
    from prometheus_spark.parser.ast import DurationValue
    from prometheus_spark.parser.printer import format_duration_ms

    if isinstance(v, DurationValue):
        return v.src
    return format_duration_ms(int(round(float(v) * 1000.0)))


def _number(text: str) -> float:
    lower = text.lower()
    if lower.startswith("0x"):
        return float(int(text, 16))
    if lower == "inf":
        return float("inf")
    if lower == "nan":
        return float("nan")
    return float(text)


def parse_expr(src: str) -> Expr:
    """Parse a PromQL expression into an AST."""
    return Parser(src).parse()
