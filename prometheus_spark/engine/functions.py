"""Instant-vector functions — pure column projections where possible.

Reference dispatch map: promql/functions.go:2658-2752.  Every function that
changes the sample's meaning drops ``__name__`` from the output labels
(engine.go:4254 ``cleanupMetricLabels``).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prometheus_spark.engine.aggregations import PromQLEvalError
from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.values import (
    ConstScalar,
    ScalarFrame,
    StringValue,
    VectorFrame,
)
from prometheus_spark.model.labels import drop_name_expr, sig_expr

def _NAN():  # lazily built: F.lit needs an active SparkContext
    return F.lit(float("nan"))

_SIMPLE_MATH = {
    "abs": F.abs,
    "ceil": F.ceil,
    "floor": F.floor,
    "exp": F.exp,
    "sqrt": F.sqrt,
    "ln": F.log,
    "log2": F.log2,
    "log10": F.log10,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "asinh": F.asinh,
    "acosh": F.acosh,
    "atanh": F.atanh,
    "deg": F.degrees,
    "rad": F.radians,
    "sgn": F.signum,
}


def _project(vf: VectorFrame, value: Column, keep_name: bool = False) -> VectorFrame:
    # delayed name removal: labels stay intact; meaning-changing functions
    # flag the row and finalization strips the metadata labels
    flag = F.col("drop_name") if keep_name else F.lit(True)
    # computed samples live at the eval timestamp: nested timestamp() sees
    # the step time, not the source sample's time (at_modifier.test:173).
    # Histogram samples (value NULL) are ignored by point-wise float math.
    return VectorFrame(
        vf.df.filter(F.col("value").isNotNull()).select(
            "sig",
            "labels",
            "t",
            F.col("t").alias("sample_t"),
            value.cast("double").alias("value"),
            flag.alias("drop_name"),
        )
    )


def eval_simple_math(func: str, vf: VectorFrame) -> VectorFrame:
    fn = _SIMPLE_MATH[func]
    v = F.col("value")
    out = fn(v)
    if func in ("ceil", "floor"):
        # Spark ceil/floor return LONG — ±Inf/NaN must pass through
        out = F.when(F.isnan(v) | (F.abs(v) == F.lit(float("inf"))), v).otherwise(
            out.cast("double")
        )
    if func in ("ln",):
        # Go math.Log: ln(0) = -Inf, ln(<0) = NaN; Spark log(x≤0) = NULL
        out = (
            F.when(v > 0, F.log(v))
            .when(v == 0, F.lit(float("-inf")))
            .otherwise(_NAN())
        )
    if func == "log2":
        out = F.when(v > 0, F.log2(v)).when(v == 0, F.lit(float("-inf"))).otherwise(_NAN())
    if func == "log10":
        out = F.when(v > 0, F.log10(v)).when(v == 0, F.lit(float("-inf"))).otherwise(_NAN())
    if func in ("asin", "acos"):
        # Spark returns NaN outside domain already (Java Math) — fine
        pass
    if func == "acosh":
        out = F.when(v >= 1, F.acosh(v)).otherwise(_NAN())
    if func == "atanh":
        out = F.when((v > -1) & (v < 1), F.atanh(v)).otherwise(
            F.when(v == 1, F.lit(float("inf"))).when(v == -1, F.lit(float("-inf"))).otherwise(_NAN())
        )
    if func == "sqrt":
        out = F.when(v >= 0, F.sqrt(v)).otherwise(_NAN())
    return _project(vf, out)


def eval_round(vf: VectorFrame, to: float) -> VectorFrame:
    """round(v, to): nearest multiple of ``to``, halves round up
    (functions.go:1159)."""
    if to == 0:
        raise PromQLEvalError("round: nearest must not be 0")
    v = F.col("value")
    # multiply by the reciprocal, exactly like the reference — the float
    # rounding of v/to vs v*(1/to) differs at representation boundaries
    inv = 1.0 / to
    out = F.floor(v * F.lit(inv) + F.lit(0.5)) / F.lit(inv)
    out = F.when(F.isnan(v) | (v == F.lit(float("inf"))) | (v == F.lit(float("-inf"))), v).otherwise(out)
    return _project(vf, out)


def eval_clamp(vf: VectorFrame, lo, hi) -> VectorFrame:
    """clamp (functions.go:1137): min > max ⇒ drop all elements; NaN
    propagates."""
    l, h = F.lit(lo), F.lit(hi)
    df = vf.df
    if isinstance(lo, float) and isinstance(hi, float) and lo > hi:
        return VectorFrame(df.filter(F.lit(False)))
    v = F.col("value")
    # Go math.Max/Min propagate NaN — a NaN bound makes every output NaN
    out = F.when(F.isnan(v) | F.isnan(l) | F.isnan(h), _NAN()).otherwise(
        F.least(F.greatest(v, l), h)
    )
    return _project(vf, out)


def eval_clamp_one(vf: VectorFrame, bound: float, is_max: bool) -> VectorFrame:
    v = F.col("value")
    out = F.when(F.isnan(v) | F.isnan(F.lit(bound)), _NAN()).otherwise(
        F.least(v, F.lit(bound)) if is_max else F.greatest(v, F.lit(bound))
    )
    return _project(vf, out)


_DATE_FUNCS = {
    "minute": lambda ts: F.minute(ts),
    "hour": lambda ts: F.hour(ts),
    "day_of_week": lambda ts: F.dayofweek(ts) - 1,  # PromQL: 0=Sunday
    "day_of_month": lambda ts: F.dayofmonth(ts),
    "day_of_year": lambda ts: F.dayofyear(ts),
    "days_in_month": lambda ts: F.dayofmonth(F.last_day(ts)),
    "month": lambda ts: F.month(ts),
    "year": lambda ts: F.year(ts),
}


def eval_date_func(func: str, vf: VectorFrame) -> VectorFrame:
    """Date fields of the sample value interpreted as epoch seconds, UTC
    (functions.go:2602-2651).  Session timezone must be UTC."""
    ts = F.timestamp_seconds(F.col("value"))
    return _project(vf, _DATE_FUNCS[func](ts))


def eval_timestamp(vf: VectorFrame) -> VectorFrame:
    # timestamp() applies to histogram samples as well — no float filter
    return VectorFrame(
        vf.df.select(
            "sig",
            "labels",
            "t",
            F.col("t").alias("sample_t"),
            (F.col("sample_t") / 1000.0).cast("double").alias("value"),
            F.lit(True).alias("drop_name"),
        )
    )


def eval_start_timestamp(vf: VectorFrame) -> VectorFrame:
    """start_timestamp(v) (functions.go:1920 funcStartTimestamp,
    experimental): the sample's start (created) timestamp in seconds.
    Only series whose samples actually carry start-timestamp data produce
    output (unset positions within such a series emit 0, mirroring the
    reference's zero-filled ST slices); expression inputs lose the ST
    column entirely → empty result."""
    from pyspark.sql.window import Window

    if "st" not in vf.df.columns:
        return VectorFrame(
            vf.df.filter(F.lit(False)).select(
                "sig", "labels", "t", "sample_t", "value",
                F.lit(True).alias("drop_name"),
            )
        )
    # applies to histogram samples too — no float filter
    has_any = F.max(F.col("st").isNotNull().cast("int")).over(Window.partitionBy("sig"))
    return VectorFrame(
        vf.df.withColumn("__has_st", has_any)
        .filter(F.col("__has_st") == 1)
        .select(
            "sig",
            "labels",
            "t",
            F.col("t").alias("sample_t"),
            (F.coalesce(F.col("st"), F.lit(0)) / 1000.0).cast("double").alias("value"),
            F.lit(True).alias("drop_name"),
        )
    )


def eval_scalar(ctx: EvalContext, vf: VectorFrame) -> ScalarFrame:
    """scalar(v): the single *float* element's value, else NaN
    (functions.go:1174 — histogram samples don't count)."""
    per_step = vf.df.groupBy("t").agg(
        F.count("value").alias("n"),  # non-null = float samples only
        F.first("value", ignorenulls=True).alias("v"),
    )
    out = (
        ctx.grid.join(per_step, "t", "left")
        .select("t", F.when(F.col("n") == 1, F.col("v")).otherwise(_NAN()).alias("value"))
    )
    return ScalarFrame(out)


def eval_vector(ctx: EvalContext, scalar) -> VectorFrame:
    """vector(s): single empty-labeled series (functions.go:2523)."""
    empty = F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
    if isinstance(scalar, ConstScalar):
        df = ctx.grid.select(
            F.lit("").alias("sig"),
            empty.alias("labels"),
            "t",
            F.col("t").alias("sample_t"),
            F.lit(float(scalar.value)).alias("value"),
            F.lit(False).alias("drop_name"),
        )
    else:
        df = scalar.df.select(
            F.lit("").alias("sig"),
            empty.alias("labels"),
            "t",
            F.col("t").alias("sample_t"),
            F.col("value"),
            F.lit(False).alias("drop_name"),
        )
    return VectorFrame(df)


def eval_absent(ctx: EvalContext, vf: VectorFrame, inferred: dict[str, str]) -> VectorFrame:
    """absent(v) — 1 for steps where v has no elements (functions.go:1717);
    labels inferred from equality matchers of the argument selector."""
    present = vf.df.select("t").distinct()
    keys = sorted(inferred)
    labels = (
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in keys]), F.array(*[F.lit(inferred[k]) for k in keys])
        )
        if keys
        else F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
    )
    out = (
        ctx.grid.join(present, "t", "left_anti")
        .select(
            sig_expr(labels).alias("sig"),
            labels.alias("labels"),
            "t",
            F.col("t").alias("sample_t"),
            F.lit(1.0).alias("value"),
            F.lit(False).alias("drop_name"),
        )
    )
    return VectorFrame(out)


def eval_absent_over_time(
    ctx: EvalContext, windowed: DataFrame, inferred: dict[str, str]
) -> VectorFrame:
    return eval_absent(ctx, VectorFrame(windowed), inferred)


_LABEL_NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def eval_label_replace(
    vf: VectorFrame, dst: str, repl: str, src: str, regex: str
) -> VectorFrame:
    """label_replace (functions.go:2483): fully-anchored regex on src label
    value; on match, dst := template expansion; empty result deletes dst."""
    if not _LABEL_NAME_RE.match(dst):
        raise PromQLEvalError(f"label_replace: invalid destination label {dst!r}")
    try:
        re.compile(regex)
    except re.error as e:
        raise PromQLEvalError(f"label_replace: invalid regex: {e}")
    anchored = f"^(?:{regex})$"
    srcv = F.coalesce(F.element_at("labels", F.lit(src)), F.lit(""))
    matched = srcv.rlike(anchored)
    newv = F.regexp_replace(srcv, anchored, repl)
    with_dst = F.map_concat(
        F.map_filter("labels", lambda k, _: k != F.lit(dst)),
        F.create_map(F.lit(dst), newv),
    )
    without_dst = F.map_filter("labels", lambda k, _: k != F.lit(dst))
    labels = F.when(~matched, F.col("labels")).otherwise(
        F.when(newv == "", without_dst).otherwise(with_dst)
    )
    # writing __name__ re-establishes the name: clear the drop flag
    # (name_label_dropping.test:64; reference funcLabelReplace)
    flag = F.lit(False) if dst == "__name__" else F.col("drop_name")
    return VectorFrame(
        vf.df.select(
            sig_expr(labels).alias("sig"), labels.alias("labels"), "t", "sample_t",
            "value", flag.alias("drop_name"),
        )
    )


def eval_label_join(vf: VectorFrame, dst: str, sep: str, srcs: list[str]) -> VectorFrame:
    if not _LABEL_NAME_RE.match(dst):
        raise PromQLEvalError(f"label_join: invalid destination label {dst!r}")
    parts = [F.coalesce(F.element_at("labels", F.lit(s)), F.lit("")) for s in srcs]
    newv = F.concat_ws(sep, *parts) if parts else F.lit("")
    with_dst = F.map_concat(
        F.map_filter("labels", lambda k, _: k != F.lit(dst)),
        F.create_map(F.lit(dst), newv),
    )
    without_dst = F.map_filter("labels", lambda k, _: k != F.lit(dst))
    labels = F.when(newv == "", without_dst).otherwise(with_dst)
    flag = F.lit(False) if dst == "__name__" else F.col("drop_name")
    return VectorFrame(
        vf.df.select(
            sig_expr(labels).alias("sig"), labels.alias("labels"), "t", "sample_t",
            "value", flag.alias("drop_name"),
        )
    )


def _classic_native_conflicts(vf: VectorFrame):
    """(csig, t) keys where classic bucket series and native histograms
    coexist under the same full label set — both sides must be dropped
    with a warning (engine.go:1355-1372 ``resetHistograms``).  The
    signature keeps ``__name__`` and excludes only ``le``."""
    if "hist" not in vf.df.columns:
        return None
    df = vf.df
    no_le = F.map_filter("labels", lambda k, _: k != F.lit("le"))
    classic_keys = (
        df.filter(
            F.col("value").isNotNull()
            & _parse_le(F.coalesce(F.element_at("labels", F.lit("le")), F.lit(""))).isNotNull()
        )
        .select(sig_expr(no_le).alias("csig"), "t")
        .distinct()
    )
    native_keys = (
        df.filter(F.col("hist").isNotNull())
        .select(sig_expr(F.col("labels")).alias("csig"), "t")
        .distinct()
    )
    return classic_keys.join(native_keys, ["csig", "t"], "inner")


def filter_conflicting_native(vf: VectorFrame) -> VectorFrame:
    """Native-histogram rows minus those conflicting with classic buckets."""
    conflicts = _classic_native_conflicts(vf)
    if conflicts is None:
        return vf
    keyed = vf.df.withColumn("csig", sig_expr(F.col("labels")))
    return VectorFrame(
        keyed.join(F.broadcast(conflicts), ["csig", "t"], "left_anti").drop("csig")
    )


def _classic_buckets(vf: VectorFrame):
    """Group ``le``-labeled bucket series by labels-minus-le (``__name__``
    kept — reference signature, engine.go:1343) per step and collect
    sorted, coalesced (le, cumulative-count) arrays (quantile.go:620
    ``coalesceBuckets``).  Output labels drop ``__name__``; colliding
    output labelsets are caught by the evaluator's uniqueness guard.
    Groups conflicting with a native histogram are removed."""
    df = vf.df.filter(F.col("value").isNotNull())  # histogram samples aside
    le = F.coalesce(F.element_at("labels", F.lit("le")), F.lit(""))
    gfull = F.map_filter("labels", lambda k, _: k != F.lit("le"))
    glabels = gfull  # name kept under delayed removal; consumers set the flag
    grouped = (
        df.withColumn("__le", _parse_le(le))
        .filter(F.col("__le").isNotNull())
        .select(
            sig_expr(gfull).alias("csig"),
            glabels.alias("labels"),
            "t",
            "__le",
            "value",
        )
        # duplicate le representations ("0.2", "2e-1") merge by summing
        .groupBy("csig", "t", "__le")
        .agg(F.first("labels").alias("labels"), F.sum("value").alias("c"))
        .select(
            "csig", "labels", "t",
            F.struct(F.col("__le").alias("le"), F.col("c").alias("c")).alias("b"),
        )
        .groupBy("csig", "t")
        .agg(F.first("labels").alias("labels"), F.sort_array(F.collect_list("b")).alias("bs"))
    )
    conflicts = _classic_native_conflicts(vf)
    if conflicts is not None:
        grouped = grouped.join(F.broadcast(conflicts), ["csig", "t"], "left_anti")
    return grouped.select(
        sig_expr(F.col("labels")).alias("sig"), "labels", "t", "bs"
    )


def eval_histogram_fraction_classic(
    ctx: EvalContext, lower: float, upper: float, vf: VectorFrame
) -> VectorFrame:
    """Classic-bucket histogram_fraction (promql/quantile.go:520
    ``BucketFraction``): fraction of observations in [lower, upper] with
    linear interpolation inside buckets; implemented as a single array
    fold carrying (rank, lowerRank, upperRank, set-flags)."""
    buckets = _classic_buckets(vf)
    bs = F.col("bs")
    has_inf = F.exists(bs, lambda b: b["le"] == F.lit(float("inf")))
    total = F.element_at(bs, -1)["c"]

    if math.isnan(lower) or math.isnan(upper):
        value = _NAN()
    elif lower >= upper:
        value = F.lit(0.0)
    else:
        lo, up = F.lit(float(lower)), F.lit(float(upper))
        first_lb = F.when(F.element_at(bs, 1)["le"] <= 0, F.lit(float("-inf"))).otherwise(
            F.lit(0.0)
        )
        init = F.struct(
            F.lit(0.0).alias("rank"),
            F.lit(0.0).alias("lrank"),
            F.lit(0.0).alias("urank"),
            F.lit(False).alias("lset"),
            F.lit(False).alias("uset"),
            first_lb.alias("lb"),
        )

        def step(acc, b):
            lb, le, c = acc["lb"], b["le"], b["c"]
            # For a −Inf-wide bucket interpolation degenerates to the
            # bucket's cumulative count (see BucketFraction comment).
            def interp(v):
                return F.when(lb == F.lit(float("-inf")), c).otherwise(
                    acc["rank"] + (c - acc["rank"]) * (v - lb) / (le - lb)
                )

            lset1 = acc["lset"] | (lb >= lo)
            lrank1 = F.when(acc["lset"], acc["lrank"]).otherwise(
                F.when(lb >= lo, acc["rank"]).otherwise(
                    F.when((lb < lo) & (le > lo), interp(lo)).otherwise(acc["lrank"])
                )
            )
            lset2 = lset1 | ((lb < lo) & (le > lo))
            uset1 = acc["uset"] | (lb >= up)
            urank1 = F.when(acc["uset"], acc["urank"]).otherwise(
                F.when(lb >= up, acc["rank"]).otherwise(
                    F.when((lb < up) & (le > up), interp(up)).otherwise(acc["urank"])
                )
            )
            uset2 = uset1 | ((lb < up) & (le > up))
            return F.struct(
                c.alias("rank"),
                lrank1.alias("lrank"),
                urank1.alias("urank"),
                lset2.alias("lset"),
                uset2.alias("uset"),
                le.alias("lb"),
            )

        acc = F.aggregate(bs, init, step)
        lrank = F.when(~acc["lset"] | (acc["lrank"] > total), total).otherwise(acc["lrank"])
        urank = F.when(~acc["uset"] | (acc["urank"] > total), total).otherwise(acc["urank"])
        value = (urank - lrank) / total

    value = F.when((total == 0) | ~has_inf, _NAN()).otherwise(value)
    out = buckets.select(
        "sig", "labels", "t", F.col("t").alias("sample_t"),
        value.cast("double").alias("value"), F.lit(True).alias("drop_name"),
    )
    return VectorFrame(out)


def eval_histogram_quantile_classic(ctx: EvalContext, phi, vf: VectorFrame) -> VectorFrame:
    """Classic ``le``-labeled bucket quantile (promql/quantile.go:105
    ``BucketQuantile``): group series by labels-minus-le, coalesce buckets,
    enforce monotonicity, linear interpolation within the bucket; highest
    bucket must be +Inf.

    Implemented as a per-(group, step) sort + array fold — JVM-side.
    """
    if not isinstance(phi, ConstScalar):
        raise PromQLEvalError("histogram_quantile: scalar parameter required")
    q = float(phi.value)

    buckets = _classic_buckets(vf)

    # merge duplicate le's (sum), enforce monotonicity (running max), then
    # interpolate.  All as array expressions.
    bs = F.col("bs")
    has_inf = F.exists(bs, lambda b: b["le"] == F.lit(float("inf")))

    value = F.when(
        has_inf & (F.size(bs) >= 2), _bucket_quantile_expr(bs, q)
    ).otherwise(_NAN())
    out = buckets.select(
        "sig", "labels", "t", F.col("t").alias("sample_t"), value.alias("value"),
        F.lit(True).alias("drop_name"),
    )
    return VectorFrame(out)


def _parse_le(le: Column) -> Column:
    # try_cast: unparseable/absent le must yield NULL (filtered), not an
    # ANSI cast error — histogram-sample rows carry no le label at all
    low = F.lower(le)
    return (
        F.when(low.isin("+inf", "inf", "+infinity", "infinity"), F.lit(float("inf")))
        .when(low.isin("-inf", "-infinity"), F.lit(float("-inf")))
        .otherwise(le.try_cast("double"))
    )


def _bucket_quantile_expr(bs: Column, q: float) -> Column:
    """Linear interpolation inside the target bucket (quantile.go:105).

    Monotonicity is enforced by a running-max fold first
    (quantile.go:668 ``ensureMonotonicAndIgnoreSmallDeltas`` — we apply
    the simple running-max form)."""
    if math.isnan(q):
        return _NAN()
    if q < 0:
        return F.lit(float("-inf"))
    if q > 1:
        return F.lit(float("inf"))

    # running max of cumulative counts
    mono = F.aggregate(
        bs,
        F.array().cast("array<struct<le:double,c:double>>"),
        lambda acc, b: F.concat(
            acc,
            F.array(
                F.struct(
                    b["le"].alias("le"),
                    F.when(F.size(acc) > 0, F.greatest(b["c"], F.element_at(acc, -1)["c"]))
                    .otherwise(b["c"])
                    .alias("c"),
                )
            ),
        ),
    )
    total = F.element_at(mono, -1)["c"]
    rank = F.lit(q) * total
    # first bucket with c >= rank; NaN counts satisfy nothing → idx 0,
    # clamped to 1 for safe access (the NaN guard below wins anyway)
    idx0 = F.coalesce(
        F.array_position(F.transform(mono, lambda b: b["c"] >= rank), F.lit(True)),
        F.lit(0),
    ).cast("int")
    idx = F.greatest(idx0, F.lit(1))
    b = F.element_at(mono, idx)
    prev_c = F.when(idx > 1, F.element_at(mono, idx - 1)["c"]).otherwise(F.lit(0.0))
    prev_le = F.when(idx > 1, F.element_at(mono, idx - 1)["le"]).otherwise(F.lit(0.0))

    # reference behavior: target bucket = +Inf ⇒ lower bound of it (the
    # last finite le); first bucket with upper bound ≤ 0 ⇒ that bound
    # directly; else linear interpolation from the previous bound.
    last_finite = F.element_at(mono, F.size(mono) - 1)["le"]
    interpolated = prev_le + (b["le"] - prev_le) * F.when(
        b["c"] - prev_c > 0, (rank - prev_c) / (b["c"] - prev_c)
    ).otherwise(F.lit(0.0))
    value = (
        F.when((total == 0) | F.isnan(total) | (idx0 == 0), _NAN())
        .when(b["le"] == F.lit(float("inf")), last_finite)
        .when((idx == 1) & (b["le"] <= 0), b["le"])
        .when((idx == 1) & (b["le"] > 0), b["le"] * (rank / b["c"]))
        .otherwise(interpolated)
    )
    return value
