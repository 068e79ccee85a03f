"""Runtime value representations flowing between operators.

PromQL's four static types (reference: promql/parser/value.go) map to:

- scalar   → :class:`ConstScalar` (plan-time constant, step-invariant) or
             :class:`ScalarFrame` (one row per step: ``(t, value)``)
- string   → :class:`StringValue`
- vector   → :class:`VectorFrame` — ``(sig, labels, t, sample_t, value)``,
             one row per (series, step); absent rows = absent series
- matrix   → handled structurally: range selectors/subqueries feed the
             range-function framework as windowed sample frames
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VECTOR_COLS = ["sig", "labels", "t", "sample_t", "value"]


@dataclass
class ConstScalar:
    value: float


@dataclass
class StringValue:
    value: str


@dataclass
class ScalarFrame:
    df: DataFrame  # (t LONG, value DOUBLE) — exactly one row per step


@dataclass
class VectorFrame:
    df: DataFrame  # VECTOR_COLS


def scalar_frame_from_const(ctx, value: float) -> ScalarFrame:
    return ScalarFrame(ctx.grid.select(F.col("t"), F.lit(float(value)).alias("value")))
