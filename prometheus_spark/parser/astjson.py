"""AST → JSON-friendly dict, for the experimental /api/v1/parse_query
endpoint (reference: web/api/v1/translate_ast.go — serializes the parsed
expression tree with node type, children, and position-free fields)."""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Any

from prometheus_spark.parser import ast as A


def _duration_ms(v) -> Any:
    if v is None:
        return None
    if isinstance(v, A.DurationValue):
        # context-dependent durations (step()/range()) serialize symbolically
        return {"type": "DurationExpr", "src": v.src}
    return v


def ast_to_dict(node) -> Any:
    """Generic dataclass walk keyed by node-class name."""
    if node is None:
        return None
    if isinstance(node, A.Matcher):
        return {
            "name": node.name,
            "type": node.type.value if isinstance(node.type, Enum) else str(node.type),
            "value": node.value,
        }
    if isinstance(node, Enum):
        return node.value
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        out: dict[str, Any] = {"type": type(node).__name__}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, A.DurationValue):
                out[f.name] = _duration_ms(v)
            elif isinstance(v, (list, tuple)):
                out[f.name] = [ast_to_dict(x) for x in v]
            elif dataclasses.is_dataclass(v) or isinstance(v, Enum):
                out[f.name] = ast_to_dict(v)
            else:
                out[f.name] = v
        return out
    return node


def parse_query_to_dict(query: str) -> dict:
    from prometheus_spark.parser import parse_expr

    return ast_to_dict(parse_expr(query))
