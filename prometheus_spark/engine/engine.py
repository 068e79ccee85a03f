"""Public engine facade.

Mirrors the reference query lifecycle (SURVEY §3): parse → plan-time
rewrites (folded by the parser/evaluator) → evaluate over the step grid →
result shaping (sorted by label set, engine.go:907).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.evaluator import Evaluator
from prometheus_spark.engine.values import (
    ConstScalar,
    ScalarFrame,
    StringValue,
    VectorFrame,
    scalar_frame_from_const,
)
from prometheus_spark.model.schema import DEFAULT_LOOKBACK_MS
from prometheus_spark.parser import parse_expr


class PromQLEngine:
    """Evaluate PromQL over a canonical samples DataFrame.

    ``samples`` must follow ``model.schema.SAMPLE_SCHEMA`` (plus the hot
    ``name`` column).  Use ``prometheus_spark.storage`` helpers to build it.
    """

    def __init__(
        self,
        spark: SparkSession,
        samples: DataFrame,
        lookback_ms: int = DEFAULT_LOOKBACK_MS,
        strict: bool = True,
        kahan: bool = False,
        ordered: bool = True,
    ):
        self.spark = spark
        self.samples = samples
        self.lookback_ms = lookback_ms
        self.strict = strict
        self.kahan = kahan
        # ordered=False skips the final global sort (reference output
        # ordering, engine.go:907) — for order-insensitive consumers
        # like the corpus runner it is a pure extra exchange per query
        self.ordered = ordered

    def _ctx(self, start_ms: int, end_ms: int, step_ms: int) -> EvalContext:
        return EvalContext(
            spark=self.spark,
            samples=self.samples,
            start_ms=start_ms,
            end_ms=end_ms,
            step_ms=step_ms,
            lookback_ms=self.lookback_ms,
            strict=self.strict,
            kahan=self.kahan,
        )

    def instant_query(self, query: str, time_ms: int) -> DataFrame:
        """→ DataFrame (sig, labels, t, value) at the single timestamp.

        A top-level range-vector expression (matrix selector or
        subquery) is legal in an instant query and yields a matrix of
        raw samples at their own timestamps (reference engine.go:714
        rangeEval on Matrix-typed expressions; the HTTP API renders
        resultType "matrix").  Range queries reject it, as the reference
        does.
        """
        from prometheus_spark.parser.ast import (
            MatrixSelector,
            ParenExpr,
            SubqueryExpr,
        )

        node = parse_expr(query)
        inner = node
        while isinstance(inner, ParenExpr):
            inner = inner.expr
        if isinstance(inner, (MatrixSelector, SubqueryExpr)):
            ctx = self._ctx(time_ms, time_ms, 1)
            w, _rng, _mode = Evaluator(ctx)._matrix_arg(inner)
            hist_cols = ["hist"] if "hist" in w.columns else []
            out = w.select(
                "sig", "labels", F.col("sample_t").alias("t"), "value",
                "drop_name", *hist_cols,
            )
            return self._finalize(out)
        return self.range_query(query, time_ms, time_ms, 1)

    def range_query(self, query: str, start_ms: int, end_ms: int, step_ms: int) -> DataFrame:
        """→ DataFrame (sig, labels, t, value), sorted by (sig, t)."""
        node = parse_expr(query)
        ctx = self._ctx(start_ms, end_ms, step_ms)
        result = Evaluator(ctx).eval(node)
        if isinstance(result, ConstScalar):
            result = scalar_frame_from_const(ctx, result.value)
        if isinstance(result, ScalarFrame):
            empty = F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            )
            return result.df.select(
                F.lit("").alias("sig"), empty.alias("labels"), "t", "value"
            ).orderBy("t")
        if isinstance(result, StringValue):
            raise ValueError("string results are API-only; not a DataFrame")
        if isinstance(result, VectorFrame):
            return self._finalize(result.df)
        raise TypeError(f"unexpected result {type(result).__name__}")

    def _finalize(self, df: DataFrame) -> DataFrame:
        """Delayed name removal (reference: delayed __name__ dropping +
        engine.go:4283 duplicate check): strip the schema metadata labels
        from flagged rows, THEN run the duplicate-labelset check — the
        single place duplicates can legitimately appear (two series
        collapsing onto the same labelset once names are gone)."""
        from prometheus_spark.model.labels import drop_metadata_sql, sig_sql

        if "drop_name" in df.columns:
            labels = (
                f"CASE WHEN drop_name THEN {drop_metadata_sql('labels')} "
                "ELSE labels END"
            )
        else:
            labels = "labels"
        cols = [
            sig_sql(labels) + " AS sig",
            labels + " AS labels",
            "t",
            "value",
        ]
        if "hist" in df.columns:
            cols.append("hist")
        out = df.selectExpr(*cols)
        if self.strict:
            from prometheus_spark.engine.guards import check_unique_labelsets

            out = check_unique_labelsets(out)
        return out.orderBy("sig", "t") if self.ordered else out
