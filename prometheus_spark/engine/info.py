"""info() — enrichment join with info metrics (reference: promql/info.go).

Joins data series with info-metric series (default ``target_info``) on the
hardcoded identifying labels ``(instance, job)`` at each step and copies
the info series' data labels in.  Spark-first: a left join on
``(instance, job, t)`` against the info metrics' instant vector — at scale
the info side is tiny and broadcasts.

Semantics re-derived from promql/info.go:
- name matchers from the selector argument pick the info metrics; only
  negative matchers → a synthetic ``.+_info`` regex is prepended; none →
  ``target_info`` (info.go:92 ``effectiveInfoNameMatchers``)
- base series whose own name matches the effective matchers are "info
  series" themselves and pass through unenriched (info.go:58-73)
- label matchers restrict which data labels are copied AND gate rows: a
  matcher not accepting "" requires a matching info label
- base labels win on overlap; identifying labels and __name__ never copy
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.values import VectorFrame
from prometheus_spark.model.labels import sig_expr
from prometheus_spark.model.schema import METRIC_NAME_LABEL
from prometheus_spark.parser.ast import Matcher, MatchType, VectorSelector

IDENTIFYING_LABELS = ("instance", "job")
DEFAULT_INFO_METRIC = "target_info"


def _matches_empty(m: Matcher) -> bool:
    if m.type == MatchType.EQ:
        return m.value == ""
    if m.type == MatchType.NEQ:
        return m.value != ""
    try:
        ok = bool(re.fullmatch(m.value, ""))
    except re.error:
        ok = False
    return ok if m.type == MatchType.RE else not ok


def _matcher_on_value(m: Matcher, val: Column) -> Column:
    v = F.coalesce(val, F.lit(""))
    if m.type == MatchType.EQ:
        return v == F.lit(m.value)
    if m.type == MatchType.NEQ:
        return v != F.lit(m.value)
    cond = v.rlike(f"^(?:{m.value})$")
    return cond if m.type == MatchType.RE else ~cond


def _effective_name_matchers(name_matchers: list[Matcher]) -> list[Matcher]:
    if any(m.type in (MatchType.EQ, MatchType.RE) for m in name_matchers):
        return name_matchers
    if name_matchers:
        return [Matcher(METRIC_NAME_LABEL, MatchType.RE, ".+_info")] + name_matchers
    return [Matcher(METRIC_NAME_LABEL, MatchType.EQ, DEFAULT_INFO_METRIC)]


def eval_info(
    ctx: EvalContext, base: VectorFrame, data_matchers: Optional[list[Matcher]]
) -> VectorFrame:
    from prometheus_spark.engine.selectors import eval_vector_selector

    name_matchers = [m for m in (data_matchers or []) if m.name == METRIC_NAME_LABEL]
    label_matchers = [m for m in (data_matchers or []) if m.name != METRIC_NAME_LABEL]
    effective = _effective_name_matchers(name_matchers)

    info_vf = eval_vector_selector(ctx, VectorSelector(None, effective))

    # base series that are themselves info metrics pass through unenriched
    # — carried as a flag on ONE pass over the base frame (a filter+union
    # pair would execute the upstream plan twice; r12)
    base_name = F.coalesce(
        F.element_at("labels", F.lit(METRIC_NAME_LABEL)), F.lit("")
    )
    is_info = F.lit(True)
    for m in effective:
        is_info = is_info & _matcher_on_value(m, base_name)
    flagged = base.df.withColumn("__isinfo", is_info)

    ident = F.array(*[F.lit(k) for k in IDENTIFYING_LABELS])
    data_labels = F.map_filter(
        F.col("labels"),
        lambda k, _: (~F.array_contains(ident, k)) & (k != F.lit(METRIC_NAME_LABEL)),
    )
    if label_matchers:
        names = F.array(*[F.lit(m.name) for m in label_matchers])
        data_labels = F.map_filter(data_labels, lambda k, _: F.array_contains(names, k))

    # info metrics must be float samples — a histogram-typed info series is
    # an error (info.test:191).  The guard is folded into the data-label
    # column so Catalyst can't prune it away.
    info_src = info_vf.df
    if "hist" in info_src.columns:
        bad_hist = F.col("hist").isNotNull() | F.col("value").isNull()
        data_labels = F.when(
            bad_hist,
            F.raise_error(
                F.lit("info: data label selector matched non-float (histogram) series")
            ).cast("map<string,string>"),
        ).otherwise(data_labels)

    # merge matching info metrics per (instance, job, t), per data-label
    # KEY: the info series with the most recent sample wins (info-metric
    # churn, info.test:225 — a newer state supersedes a lookback-carried
    # older one); two DIFFERENT values at the same freshest timestamp are
    # an error (info.test:304 conflicting label)
    from pyspark.sql.window import Window as W

    entries = info_src.select(
        F.coalesce(F.element_at("labels", F.lit("instance")), F.lit("")).alias("__inst"),
        F.coalesce(F.element_at("labels", F.lit("job")), F.lit("")).alias("__job"),
        F.col("t").alias("__it"),
        F.col("sample_t").alias("__st"),
        F.explode(F.map_entries(data_labels)).alias("__e"),
    ).select("__inst", "__job", "__it", "__st", F.col("__e.key").alias("__k"), F.col("__e.value").alias("__v"))
    wk = W.partitionBy("__inst", "__job", "__it", "__k")
    fresh = entries.withColumn("__maxst", F.max("__st").over(wk)).filter(
        F.col("__st") == F.col("__maxst")
    )
    per_key = fresh.groupBy("__inst", "__job", "__it", "__k").agg(
        F.first("__v").alias("__v"),
        (F.size(F.collect_set("__v")) > 1).alias("__bad"),
    )
    info = per_key.groupBy("__inst", "__job", "__it").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("__k").alias("key"),
                    F.when(
                        F.col("__bad"),
                        F.raise_error(
                            F.lit("info: conflicting label values from matched info series")
                        ).cast("string"),
                    )
                    .otherwise(F.col("__v"))
                    .alias("value"),
                )
            )
        ).alias("__data")
    )

    b = flagged.withColumn(
        "__binst", F.coalesce(F.element_at("labels", F.lit("instance")), F.lit(""))
    ).withColumn("__bjob", F.coalesce(F.element_at("labels", F.lit("job")), F.lit("")))
    # info-series rows are excluded from the match (they pass through
    # unenriched): the ~__isinfo term makes them left-join misses, so
    # their data map coalesces to empty below
    joined = b.join(
        F.broadcast(info),
        (b["__binst"] == info["__inst"])
        & (b["__bjob"] == info["__job"])
        & (b["t"] == info["__it"])
        & ~b["__isinfo"],
        "left",
    )

    # matcher gating: non-empty-required matchers need a matching info label
    keep = F.lit(True)
    empty_map = F.create_map().cast("map<string,string>")
    data = F.coalesce(F.col("__data"), empty_map)
    for m in label_matchers:
        if m.name in IDENTIFYING_LABELS:
            # identifying labels are never data labels — match against the
            # series' own identifying label value (info.test:56)
            val = F.element_at(F.col("labels"), F.lit(m.name))
        else:
            val = F.element_at(data, F.lit(m.name))
        cond = _matcher_on_value(m, val)
        keep = keep & cond  # matchers accepting "" pass on absent labels
    joined = joined.filter(F.col("__isinfo") | keep)

    base_keys = F.map_keys(F.col("labels"))
    addable = F.map_filter(data, lambda k, _: ~F.array_contains(base_keys, k))
    new_labels = F.map_concat(F.col("labels"), addable)

    out = joined.select(
        F.when(F.col("__isinfo"), F.col("sig"))
        .otherwise(sig_expr(new_labels))
        .alias("sig"),
        F.when(F.col("__isinfo"), F.col("labels"))
        .otherwise(new_labels)
        .alias("labels"),
        "t",
        "sample_t",
        "value",
        "drop_name",
    )
    return VectorFrame(out)
