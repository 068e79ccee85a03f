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
    "==": 3, "!=": 3, "<": 3, ">": 3, "<=": 3, ">=": 3,
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
            next_min = prec if op in _RIGHT_ASSOC else prec + 1
            rhs = self.parse_expr(next_min)
            if return_bool and op not in _COMPARISONS:
                raise ParseError("bool modifier only allowed on comparison operators")
            lhs = BinaryExpr(op, lhs, rhs, matching=matching, return_bool=return_bool)
        return lhs

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
            return UnaryExpr("-", self.parse_unary())
        if self.accept("OP", "+"):
            return UnaryExpr("+", self.parse_unary())
        return self.parse_postfix(self.parse_atom())

    def parse_postfix(self, e: Expr) -> Expr:
        while True:
            if self.peek().kind == "OP" and self.peek().text == "[":
                e = self.parse_range_suffix(e)
                continue
            if self.accept_ident("offset"):
                neg = bool(self.accept("OP", "-"))
                dur = self.parse_duration_token()
                off = -dur if neg else dur
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
            target.offset_ms += offset_ms
        if at is not None:
            target.at = at
        return e

    def parse_duration_token(self) -> int:
        t = self.next()
        if t.kind in ("DURATION", "NUMBER"):
            return parse_duration_ms(t.text)
        raise ParseError(f"expected duration, got {t.text!r} at {t.pos}")

    def parse_range_suffix(self, e: Expr) -> Expr:
        self.expect("OP", "[")
        rng = self.parse_duration_token()
        if self.accept("OP", ":"):
            # subquery  expr[range:step]
            step = None
            if not (self.peek().kind == "OP" and self.peek().text == "]"):
                step = self.parse_duration_token()
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
        elif t.kind in ("IDENT", "DURATION"):
            lname = t.text
        else:
            raise ParseError(f"expected label name at {t.pos}")
        op_tok = self.next()
        if op_tok.kind != "OP" or op_tok.text not in ("=", "!=", "=~", "!~"):
            raise ParseError(f"expected matcher operator at {op_tok.pos}")
        val_tok = self.expect("STRING")
        return Matcher(lname, MatchType(op_tok.text), unquote(val_tok.text))


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
