from prometheus_spark.parser.ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    Matcher,
    MatrixSelector,
    NumberLiteral,
    ParenExpr,
    StringLiteral,
    SubqueryExpr,
    UnaryExpr,
    VectorMatching,
    VectorSelector,
)
from prometheus_spark.parser.parser import parse_expr, ParseError

__all__ = [
    "parse_expr",
    "ParseError",
    "AggregateExpr",
    "BinaryExpr",
    "Call",
    "Matcher",
    "MatrixSelector",
    "NumberLiteral",
    "ParenExpr",
    "StringLiteral",
    "SubqueryExpr",
    "UnaryExpr",
    "VectorMatching",
    "VectorSelector",
]
