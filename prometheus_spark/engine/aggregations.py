"""PromQL aggregation operators over instant vectors.

Semantics reference: promql/engine.go:3616 (``aggregation``) and
engine.go:3986 (``aggregationK`` — heap-based k-selectors).  Grouping key =
kept/dropped label subset (engine.go:4399-4412); here the regrouped label
map is computed JVM-side and aggregation is a plain ``groupBy(sig, t)`` —
Spark supplies partial (map-side) aggregation and spill for free.

NaN handling: PromQL min/max skip NaN unless all values are NaN; Spark
treats NaN as the largest double and NaN==NaN in comparisons, so NaN is
masked to NULL first.  sum/avg propagate NaN in both systems.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.values import ConstScalar, ScalarFrame, VectorFrame
from prometheus_spark.model.labels import group_labels_expr, sig_expr
from prometheus_spark.parser.ast import AggregateExpr


class PromQLEvalError(Exception):
    pass


def _NAN():  # lazily built: F.lit needs an active SparkContext
    return F.lit(float("nan"))


def _not_nan(c: Column) -> Column:
    return ~F.isnan(c)


def _regroup(vf: VectorFrame, node: AggregateExpr) -> DataFrame:
    by = node.grouping if (node.has_grouping and not node.without) else None
    without = node.grouping if (node.has_grouping and node.without) else None
    glabels = group_labels_expr("labels", by, without)
    return vf.df.select(
        sig_expr(glabels).alias("sig"),
        glabels.alias("labels"),
        "t",
        "value",
    )


def eval_aggregation(ctx: EvalContext, node: AggregateExpr, vf: VectorFrame, param) -> VectorFrame:
    op = node.op
    if op in ("topk", "bottomk", "limitk", "limit_ratio"):
        return _eval_k_selector(ctx, node, vf, param)

    df = _regroup(vf, node)
    v = F.col("value")
    masked = F.when(_not_nan(v), v)  # NULL for NaN → min/max/quantile skip

    if op == "sum":
        agg = F.sum(v)
    elif op == "avg":
        agg = F.avg(v)
    elif op == "count":
        agg = F.count(v).cast("double")
    elif op == "min":
        # NaN only if all values in the group are NaN (engine.go:3681-3690)
        agg = F.coalesce(F.min(masked), _NAN())
    elif op == "max":
        agg = F.coalesce(F.max(masked), _NAN())
    elif op == "group":
        agg = F.lit(1.0)
    elif op == "stddev":
        # population stddev (Welford in the reference); NaN in group → NaN
        agg = F.when(F.max(F.isnan(v).cast("int")) == 1, _NAN()).otherwise(
            F.coalesce(F.stddev_pop(v), _NAN())
        )
    elif op == "stdvar":
        agg = F.when(F.max(F.isnan(v).cast("int")) == 1, _NAN()).otherwise(
            F.coalesce(F.var_pop(v), _NAN())
        )
    elif op == "quantile":
        agg = _quantile_agg(param, masked)
    elif op == "count_values":
        return _eval_count_values(ctx, node, df, param)
    else:
        raise PromQLEvalError(f"unsupported aggregator {op}")

    out = df.groupBy("sig", "t").agg(
        F.first("labels").alias("labels"), agg.cast("double").alias("value")
    )
    return VectorFrame(
        out.select("sig", "labels", "t", F.col("t").alias("sample_t"), "value")
    )


def _quantile_agg(param, masked: Column) -> Column:
    """Exact linear-interpolation quantile (promql/quantile.go:717).

    φ outside [0,1] → ±Inf, NaN → NaN (with warning in the reference).
    ``percentile`` uses the same order-statistic interpolation.
    """
    if not isinstance(param, ConstScalar):
        raise PromQLEvalError("quantile: per-step scalar parameter not yet supported")
    phi = param.value
    if math.isnan(phi):
        return _NAN()
    if phi < 0:
        return F.lit(float("-inf"))
    if phi > 1:
        return F.lit(float("inf"))
    return F.coalesce(F.percentile(masked, F.lit(phi)), _NAN())


def _eval_count_values(
    ctx: EvalContext, node: AggregateExpr, df: DataFrame, param
) -> VectorFrame:
    """count_values("label", v) — reference: engine.go:4208."""
    from prometheus_spark.engine.values import StringValue

    if not isinstance(param, StringValue):
        raise PromQLEvalError("count_values: parameter must be a string literal")
    lbl = param.value
    if not _valid_label_name(lbl):
        raise PromQLEvalError(f"count_values: invalid label name {lbl!r}")
    # Go renders sample values with minimal float formatting (%g-like via
    # strconv); format_number-style trailing ".0" must be stripped.
    vstr = _format_float_expr(F.col("value"))
    new_labels = F.map_concat(
        F.map_filter("labels", lambda k, _: k != F.lit(lbl)),
        F.create_map(F.lit(lbl), vstr),
    )
    regrouped = df.select(
        sig_expr(new_labels).alias("sig"), new_labels.alias("labels"), "t", "value"
    )
    out = regrouped.groupBy("sig", "t").agg(
        F.first("labels").alias("labels"), F.count("*").cast("double").alias("value")
    )
    return VectorFrame(out.select("sig", "labels", "t", F.col("t").alias("sample_t"), "value"))


def _format_float_expr(v: Column) -> Column:
    """Render a double the way Go strconv.FormatFloat(v,'g',-1,64) does for
    the common cases: integers lose the trailing .0."""
    as_long = v.cast("long")
    return (
        F.when(F.isnan(v), F.lit("NaN"))
        .when(v == F.lit(float("inf")), F.lit("+Inf"))
        .when(v == F.lit(float("-inf")), F.lit("-Inf"))
        .when((v == as_long.cast("double")), as_long.cast("string"))
        .otherwise(v.cast("string"))
    )


def _valid_label_name(name: str) -> bool:
    import re

    return bool(re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", name))


def _eval_k_selector(
    ctx: EvalContext, node: AggregateExpr, vf: VectorFrame, param
) -> VectorFrame:
    """topk/bottomk/limitk/limit_ratio — keep whole input series rows
    (labels unchanged, __name__ kept; reference: engine.go:3986)."""
    op = node.op
    by = node.grouping if (node.has_grouping and not node.without) else None
    without = node.grouping if (node.has_grouping and node.without) else None
    glabels = group_labels_expr("labels", by, without)
    df = vf.df.withColumn("gsig", sig_expr(glabels))

    if op == "limit_ratio":
        if not isinstance(param, ConstScalar):
            raise PromQLEvalError("limit_ratio: scalar parameter required")
        r = max(-1.0, min(1.0, param.value))
        # Deterministic hash sample with the complement property:
        # limit_ratio(r) ∪ limit_ratio(r-1) = input (engine.go:3986 region).
        u = (F.xxhash64("sig").cast("double") / F.lit(float(2**64))) + F.lit(0.5)
        keep = (u < F.lit(r)) if r >= 0 else (u >= F.lit(1.0 + r))
        out = df.filter(keep).drop("gsig")
        return VectorFrame(out.select("sig", "labels", "t", "sample_t", "value"))

    if not isinstance(param, ConstScalar):
        raise PromQLEvalError(f"{op}: per-step scalar parameter not yet supported")
    k = int(param.value)
    if k < 1:
        return VectorFrame(
            ctx.spark.createDataFrame([], vf.df.schema).select(
                "sig", "labels", "t", "sample_t", "value"
            )
        )

    v = F.col("value")
    if op == "topk":
        # NaN never enters the heap unless the group is all-NaN; order by
        # value desc with NaN masked to NULL sorted last.
        order = [F.when(_not_nan(v), v).desc_nulls_last(), F.col("sig").asc()]
    elif op == "bottomk":
        order = [F.when(_not_nan(v), v).asc_nulls_last(), F.col("sig").asc()]
    else:  # limitk — arbitrary but deterministic order
        order = [F.col("sig").asc()]
    w = Window.partitionBy("gsig", "t").orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return VectorFrame(out.select("sig", "labels", "t", "sample_t", "value"))
