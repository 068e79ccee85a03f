"""PromQL abstract syntax tree.

Node inventory mirrors the reference AST (promql/parser/ast.go:38-235) —
the only IR in the reference system.  The static type system has exactly
four value types (promql/parser/value.go): scalar, string, instant vector,
range vector ("matrix").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Union


class ValueType(str, Enum):
    SCALAR = "scalar"
    STRING = "string"
    VECTOR = "vector"
    MATRIX = "matrix"


class MatchType(str, Enum):
    EQ = "="
    NEQ = "!="
    RE = "=~"
    NRE = "!~"


@dataclass(frozen=True)
class Matcher:
    """Label matcher — the only predicate primitive
    (reference: model/labels/matcher.go:22-36)."""

    name: str
    type: MatchType
    value: str


class Expr:
    def value_type(self) -> ValueType:  # pragma: no cover - overridden
        raise NotImplementedError


@dataclass
class NumberLiteral(Expr):
    value: float

    def value_type(self) -> ValueType:
        return ValueType.SCALAR


@dataclass
class StringLiteral(Expr):
    value: str

    def value_type(self) -> ValueType:
        return ValueType.STRING


# at modifier sentinels (reference: ast.go:216-218)
AT_START = "start"
AT_END = "end"


@dataclass
class DurationValue:
    """A duration expression using query-context functions
    (``step()``/``range()``/``min_of``/``max_of`` — reference:
    promql/durations.go) — resolved against the evaluation context.

    ``fn`` maps {"step", "range", "start", "end"} (seconds) → seconds.
    ``src`` is a reparseable PromQL rendering of the expression (set by
    the parser) so the printer can round-trip computed durations.
    """

    fn: object  # Callable[[dict], float]
    src: str = ""

    def resolve_ms(self, qc: dict) -> int:
        return int(round(self.fn(qc) * 1000))


def resolve_duration_ms(v, qc: dict) -> int:
    return v.resolve_ms(qc) if isinstance(v, DurationValue) else int(v)


@dataclass
class VectorSelector(Expr):
    name: Optional[str]
    matchers: list[Matcher] = field(default_factory=list)
    offset_ms: int = 0
    at: Optional[Union[int, str]] = None  # epoch-ms, AT_START, or AT_END
    # instant smoothed selector (engine.go smoothSeries): interpolate the
    # value at the eval timestamp between the surrounding samples
    smoothed: bool = False
    anchored: bool = False

    def value_type(self) -> ValueType:
        return ValueType.VECTOR


@dataclass
class MatrixSelector(Expr):
    selector: VectorSelector
    range_ms: int
    # experimental extended range selectors (reference: ast.go:229-232,
    # lex.go:132-133): anchored includes the last pre-window sample;
    # smoothed additionally interpolates values at the exact window edges
    anchored: bool = False
    smoothed: bool = False

    def value_type(self) -> ValueType:
        return ValueType.MATRIX


@dataclass
class SubqueryExpr(Expr):
    """``expr[30m:5s]`` — inner expr evaluated as its own range query
    (reference: ast.go:142, engine.go:1932)."""

    expr: Expr
    range_ms: int
    step_ms: Optional[int]  # None → default eval interval
    offset_ms: int = 0
    at: Optional[Union[int, str]] = None

    def value_type(self) -> ValueType:
        return ValueType.MATRIX


@dataclass
class Call(Expr):
    func: str
    args: list[Expr]

    def value_type(self) -> ValueType:
        from prometheus_spark.parser.functions import FUNCTIONS

        return FUNCTIONS[self.func].return_type


class MatchCardinality(str, Enum):
    ONE_TO_ONE = "one-to-one"
    MANY_TO_ONE = "many-to-one"
    ONE_TO_MANY = "one-to-many"
    MANY_TO_MANY = "many-to-many"


@dataclass
class VectorMatching:
    """Vector-matching spec (reference: ast.go:309-327)."""

    card: MatchCardinality = MatchCardinality.ONE_TO_ONE
    labels: list[str] = field(default_factory=list)  # on(...) or ignoring(...)
    on: bool = False
    include: list[str] = field(default_factory=list)  # group_left/right(...)


@dataclass
class BinaryExpr(Expr):
    op: str
    lhs: Expr
    rhs: Expr
    matching: Optional[VectorMatching] = None
    return_bool: bool = False
    # fill / fill_left / fill_right modifiers (reference: ast.go:329-337)
    fill_lhs: Optional[float] = None
    fill_rhs: Optional[float] = None

    def value_type(self) -> ValueType:
        if (
            self.lhs.value_type() == ValueType.SCALAR
            and self.rhs.value_type() == ValueType.SCALAR
        ):
            return ValueType.SCALAR
        return ValueType.VECTOR


@dataclass
class UnaryExpr(Expr):
    op: str  # '-' or '+'
    expr: Expr

    def value_type(self) -> ValueType:
        return self.expr.value_type()


@dataclass
class ParenExpr(Expr):
    expr: Expr

    def value_type(self) -> ValueType:
        return self.expr.value_type()


@dataclass
class AggregateExpr(Expr):
    op: str
    expr: Expr
    param: Optional[Expr] = None
    grouping: list[str] = field(default_factory=list)
    without: bool = False
    # True when "by (...)" or "without (...)" was written at all; a bare
    # aggregation groups everything into one empty-labeled series.
    has_grouping: bool = False

    def value_type(self) -> ValueType:
        return ValueType.VECTOR


ARITHMETIC_OPS = {"+", "-", "*", "/", "%", "^", "atan2"}
COMPARISON_OPS = {"==", "!=", ">", "<", ">=", "<="}
SET_OPS = {"and", "or", "unless"}

AGGREGATORS = {
    "sum",
    "avg",
    "count",
    "min",
    "max",
    "group",
    "stddev",
    "stdvar",
    "topk",
    "bottomk",
    "count_values",
    "quantile",
    "limitk",
    "limit_ratio",
}
# aggregators that take a leading parameter (reference: parser/lex.go:66-68)
PARAM_AGGREGATORS = {"topk", "bottomk", "count_values", "quantile", "limitk", "limit_ratio"}
