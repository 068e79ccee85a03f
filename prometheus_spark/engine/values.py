"""Runtime value representations flowing between operators.

PromQL's four static types (reference: promql/parser/value.go) map to:

- scalar   → :class:`ConstScalar` (plan-time constant, step-invariant) or
             :class:`ScalarFrame` (one row per step: ``(t, value)``)
- string   → :class:`StringValue`
- vector   → :class:`VectorFrame` — ``(sig, labels, t, sample_t, value,
             drop_name)``, one row per (series, step); absent rows =
             absent series.  ``drop_name`` implements the reference's
             *delayed name removal*: meaning-changing ops flag the row
             instead of physically removing ``__name__``/``__type__``/
             ``__unit__``; the metadata labels stay visible to grouping,
             matching and label functions, and are stripped once at
             result finalization (engine.py) — where the duplicate-
             labelset check also runs.
- matrix   → handled structurally: range selectors/subqueries feed the
             range-function framework as windowed sample frames
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VECTOR_COLS = ["sig", "labels", "t", "sample_t", "value", "drop_name"]


def ensure_drop_name(df: DataFrame) -> DataFrame:
    """Attach drop_name=false to frames predating the flag (raw samples)."""
    if "drop_name" not in df.columns:
        df = df.withColumn("drop_name", F.lit(False))
    return df


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
