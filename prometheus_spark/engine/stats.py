"""Per-step query sample statistics — the ``stats=all`` /
``promql-per-step-stats`` surface.

Reference: util/stats/query_stats.go (``QuerySamples``:
totalQueryableSamples, peakSamples, totalQueryableSamplesPerStep) and
the engine's per-selector accounting (promql/engine.go
``samplesStats``): a vector selector contributes one sample per series
per step where a point is selected (lookback semantics included); a
matrix selector contributes every sample falling inside each step's
window; a subquery accounts its inner expression over the subquery's
own grid.

Spark-first: the counts are aggregations over the SAME windowed frames
the evaluator scans (``selectors.windowed_samples`` /
``eval_vector_selector``), grouped by step — no evaluator
instrumentation, no driver loops.  Cost is one extra counting job per
selector, paid only when a caller asks for stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prometheus_spark.parser import parse_expr
from prometheus_spark.parser.ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    MatrixSelector,
    ParenExpr,
    SubqueryExpr,
    UnaryExpr,
    VectorSelector,
    resolve_duration_ms,
)


def _qctx(ctx) -> dict:
    """Duration-expression query context (mirror of Evaluator._qctx)."""
    start = ctx.at_start_ms if ctx.at_start_ms is not None else ctx.start_ms
    end = ctx.at_end_ms if ctx.at_end_ms is not None else ctx.end_ms
    return {
        "step": 0.0 if ctx.is_instant else ctx.step_ms / 1000.0,
        "range": (end - start) / 1000.0,
        "start": start / 1000.0,
        "end": end / 1000.0,
    }


def _sample_weight(df: DataFrame):
    """Per-row queryable-sample weight: floats count 1; a native
    histogram counts its equivalent float-sample size — Size()/16
    (promql/value.go:282; FloatHistogram.Size at
    float_histogram.go:649: 168 fixed bytes + 8 per span/bucket/custom
    bound)."""
    if "hist" not in df.columns:
        return F.lit(1)
    h = F.col("hist")

    def sz(field):
        return F.coalesce(F.size(h[field]), F.lit(0))

    size_bytes = (
        F.lit(168)
        + 8 * (sz("pos_spans") + sz("neg_spans"))
        + 8 * (sz("pos_buckets") + sz("neg_buckets") + sz("custom_values"))
    )
    return F.when(
        h.isNotNull(), F.floor(size_bytes / 16).cast("long")
    ).otherwise(F.lit(1))


def _counted(df: DataFrame) -> DataFrame:
    return df.groupBy("t").agg(F.sum(_sample_weight(df)).alias("count"))


def _selector_counts(ctx, node) -> list[DataFrame]:
    """Per-step (t, n) count frames for every selector under ``node``."""
    from prometheus_spark.engine.selectors import (
        eval_vector_selector,
        windowed_samples,
    )

    out: list[DataFrame] = []
    if isinstance(node, VectorSelector):
        vf = eval_vector_selector(ctx, node)
        df = vf.df
        present = (
            F.col("value").isNotNull() | F.col("hist").isNotNull()
            if "hist" in df.columns
            else F.col("value").isNotNull()
        )
        out.append(_counted(df.filter(present)))
    elif isinstance(node, MatrixSelector):
        qc = _qctx(ctx)
        range_ms = resolve_duration_ms(node.range_ms, qc)
        w = windowed_samples(
            ctx, node.selector, range_ms,
            offset_ms=resolve_duration_ms(node.selector.offset_ms, qc),
            at=node.selector.at,
        )
        out.append(_counted(w))
    elif isinstance(node, SubqueryExpr):
        # the inner expression evaluates over the subquery's own grid —
        # the EXACT window/alignment the evaluator uses (_subquery:
        # offset/@ handling, epoch-aligned inner start with the
        # left-open bump, at_* carried through with_grid)
        qc = _qctx(ctx)
        step = resolve_duration_ms(node.step_ms, qc) if node.step_ms else 60_000
        offset = resolve_duration_ms(node.offset_ms, qc)
        if node.at is not None:
            ref = ctx.resolve_at(node.at) - offset
            inner_end, outer_start = ref, ref
        else:
            inner_end = ctx.end_ms - offset
            outer_start = ctx.start_ms - offset
        rng = resolve_duration_ms(node.range_ms, qc)
        inner_start = (outer_start - rng) // step * step
        if inner_start <= outer_start - rng:
            inner_start += step
        if inner_start <= inner_end:
            sub_ctx = ctx.with_grid(inner_start, inner_end, step)
            out += _selector_counts(sub_ctx, node.expr)
    elif isinstance(node, Call):
        for a in node.args:
            out += _selector_counts(ctx, a)
    elif isinstance(node, BinaryExpr):
        out += _selector_counts(ctx, node.lhs)
        out += _selector_counts(ctx, node.rhs)
    elif isinstance(node, (UnaryExpr, ParenExpr)):
        out += _selector_counts(ctx, node.expr)
    elif isinstance(node, AggregateExpr):
        out += _selector_counts(ctx, node.expr)
        if node.param is not None:
            out += _selector_counts(ctx, node.param)
    return out


def query_samples_stats(
    engine, query: str, start_ms: int, end_ms: int, step_ms: int
) -> dict:
    """→ the ``samples`` stats object of a query response."""
    node = parse_expr(query)
    ctx = engine._ctx(start_ms, end_ms, step_ms)
    frames = _selector_counts(ctx, node)
    if not frames:
        return {
            "totalQueryableSamples": 0,
            "peakSamples": 0,
            "totalQueryableSamplesPerStep": [],
        }
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    rows = (
        union.groupBy("t").agg(F.sum("count").alias("n")).orderBy("t").collect()
    )
    per_step = [[r["t"] / 1000.0, int(r["n"])] for r in rows]
    total = sum(n for _, n in per_step)
    peak = max((n for _, n in per_step), default=0)
    return {
        "totalQueryableSamples": total,
        "peakSamples": peak,
        "totalQueryableSamplesPerStep": per_step,
    }
