"""Vector/matrix selector evaluation — the engine's only table scans.

Instant-vector semantics (reference: promql/engine.go:2730-2765,
``vectorSelectorSingle``): at each step ``ts`` return, per matching series,
the most recent sample with ``t ∈ (ts - lookback, ts]``, skipping series
whose most recent point is a staleness marker.

Spark-first design: instead of a per-step loop, each sample computes the
half-open interval of steps it serves — ``[t, min(t+lookback, next_t))``
where ``next_t`` is the series' next sample (lead window) — and explodes
to those step indexes.  Output rows ≡ result rows, one shuffle by series,
no grid×series cross join, fully JVM-side (whole-stage codegen).

Matrix-selector semantics (engine.go:2916 ``matrixIterSlice``): all samples
in the left-open window ``(ts - range, ts]`` per series; staleness markers
are dropped.  Each sample serves steps in ``[t, t + range)`` — same explode
pattern without the ``next_t`` cutoff.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.values import VECTOR_COLS, VectorFrame
from prometheus_spark.parser.ast import Matcher, MatchType, VectorSelector


def matcher_predicate(matchers: list[Matcher]) -> Column:
    """Label matchers → a Catalyst predicate.

    PromQL regexes are fully anchored (reference: model/labels/regexp.go);
    a missing label matches as the empty string.  ``__name__`` equality
    hits the extracted hot ``name`` column so Parquet row-group pruning
    can kick in at scale.
    """
    pred = F.lit(True)
    for m in matchers:
        if m.name == "__name__" and m.type == MatchType.EQ:
            val = F.coalesce(F.col("name"), F.lit(""))
        else:
            val = F.coalesce(F.element_at(F.col("labels"), F.lit(m.name)), F.lit(""))
        if m.type == MatchType.EQ:
            cond = val == F.lit(m.value)
        elif m.type == MatchType.NEQ:
            cond = val != F.lit(m.value)
        else:
            anchored = f"^(?:{m.value})$"
            try:
                re.compile(anchored)  # surface bad regexes at plan time
            except re.error:
                # Python rejects some constructs Java/RE2 accept (e.g.
                # mid-pattern (?i) flags) — defer those to rlike at runtime
                if "(?" not in m.value:
                    raise
            cond = val.rlike(anchored)
            if m.type == MatchType.NRE:
                cond = ~cond
        pred = pred & cond
    return pred


def _ceil_div(x: Column, step: int) -> Column:
    # floor/ceil via double division: |x| < 2^53 for epoch-ms, exact
    return -F.floor((-x) / F.lit(float(step)))


def _floor_div(x: Column, step: int) -> Column:
    return F.floor(x / F.lit(float(step)))


def _explode_steps(df: DataFrame, ctx: EvalContext, lo_ms: Column, hi_ms: Column) -> DataFrame:
    """Attach step column ``t`` for every grid step in [lo_ms, hi_ms] (ms,
    inclusive).  ``k = (t - start)/step`` clamped to the grid."""
    k_lo = F.greatest(_ceil_div(lo_ms - F.lit(ctx.start_ms), ctx.step_ms), F.lit(0))
    k_hi = F.least(
        _floor_div(hi_ms - F.lit(ctx.start_ms), ctx.step_ms), F.lit(ctx.num_steps - 1)
    )
    return (
        df.withColumn("__k", F.when(k_lo <= k_hi, F.sequence(k_lo, k_hi)))
        .filter(F.col("__k").isNotNull())
        .withColumn("k", F.explode("__k"))
        .drop("__k")
        .withColumn("step_t", (F.lit(ctx.start_ms) + F.col("k") * F.lit(ctx.step_ms)).cast("long"))
        .drop("k")
    )


def eval_vector_selector(ctx: EvalContext, node: VectorSelector) -> VectorFrame:
    from prometheus_spark.parser.ast import resolve_duration_ms

    base = ctx.samples.filter(matcher_predicate(node.matchers))
    qc = {
        "step": 0.0 if ctx.is_instant else ctx.step_ms / 1000.0,
        "range": (ctx.end_ms - ctx.start_ms) / 1000.0,
        "start": ctx.start_ms / 1000.0,
        "end": ctx.end_ms / 1000.0,
    }
    offset = resolve_duration_ms(node.offset_ms, qc)

    has_hist = "hist" in base.columns
    hist_cols = ["hist"] if has_hist else []

    if node.at is not None:
        # Pinned evaluation time: value identical at every step —
        # step-invariant broadcast (reference: engine.go:4646, 2564).
        ref = ctx.resolve_at(node.at) - offset
        picked = (
            base.filter((F.col("t") > ref - ctx.lookback_ms) & (F.col("t") <= ref))
            .groupBy("sig")
            .agg(
                F.max_by(
                    F.struct("labels", "t", "value", "stale", *hist_cols), "t"
                ).alias("s"),
            )
            .select("sig", "s.*")
            .filter(~F.col("stale"))
            .select("sig", "labels", F.col("t").alias("sample_t"), "value", *hist_cols)
        )
        out = picked.crossJoin(F.broadcast(ctx.grid)).select(
            "sig", "labels", "t", "sample_t", "value", *hist_cols
        )
        return VectorFrame(out)

    # Sliding path: sample serves steps where (step_t - offset) ∈
    # [t, min(t + lookback, next_t)).  Stale markers terminate the serve
    # interval of the previous sample and emit nothing themselves.
    lo, hi = ctx.start_ms - offset - ctx.lookback_ms, ctx.end_ms - offset
    base = base.filter((F.col("t") > lo) & (F.col("t") <= hi))
    w = Window.partitionBy("sig").orderBy("t")
    served = (
        base.withColumn("next_t", F.lead("t").over(w))
        .filter(~F.col("stale"))
        .withColumn(
            "valid_to",
            F.least(
                F.col("t") + F.lit(ctx.lookback_ms), F.coalesce(F.col("next_t"), F.lit(2**62))
            ),
        )
    )
    exploded = _explode_steps(
        served,
        ctx,
        F.col("t") + F.lit(offset),
        F.col("valid_to") - 1 + F.lit(offset),
    )
    out = exploded.select(
        "sig",
        "labels",
        F.col("step_t").alias("t"),
        F.col("t").alias("sample_t"),
        "value",
        *hist_cols,
    )
    return VectorFrame(out)


def windowed_samples(
    ctx: EvalContext,
    node_or_df,
    range_ms: int,
    offset_ms: int = 0,
    at=None,
) -> DataFrame:
    """Matrix-selector expansion: (sig, labels, t=step_t, sample_t, value)
    with one row per sample per window it falls in.

    Accepts a VectorSelector (scans storage) or a prepared sample-like
    DataFrame (subquery results) with columns (sig, labels, t, value).
    """
    if isinstance(node_or_df, VectorSelector):
        base = ctx.samples.filter(matcher_predicate(node_or_df.matchers)).filter(~F.col("stale"))
    else:
        base = node_or_df
    hist_cols = ["hist"] if "hist" in base.columns else []
    base = base.select("sig", "labels", "t", "value", *hist_cols)

    # ``wend`` = the window's (offset-adjusted) right edge — rate
    # extrapolation measures sample distance to it (functions.go:472,
    # rangeEnd = ts - offset).
    if at is not None:
        ref = ctx.resolve_at(at) - offset_ms
        window = base.filter((F.col("t") > ref - range_ms) & (F.col("t") <= ref))
        return window.crossJoin(F.broadcast(ctx.grid.select(F.col("t").alias("step_t")))).select(
            "sig", "labels", F.col("step_t").alias("out_t"), F.col("t").alias("sample_t"),
            "value", *hist_cols, F.lit(ref).alias("wend"),
        ).withColumnsRenamed({"out_t": "t"})

    lo, hi = ctx.start_ms - offset_ms - range_ms, ctx.end_ms - offset_ms
    base = base.filter((F.col("t") > lo) & (F.col("t") <= hi))
    exploded = _explode_steps(
        base,
        ctx,
        F.col("t") + F.lit(offset_ms),
        F.col("t") + F.lit(range_ms - 1 + offset_ms),
    )
    return exploded.select(
        "sig", "labels", F.col("step_t").alias("out_t"), F.col("t").alias("sample_t"),
        "value", *hist_cols, (F.col("step_t") - F.lit(offset_ms)).alias("wend"),
    ).withColumnsRenamed({"out_t": "t"})
