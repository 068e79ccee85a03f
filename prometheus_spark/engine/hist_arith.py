"""Native-histogram arithmetic over vector frames — the Python↔JVM bridge.

Histogram span-merge algebra (reference: model/histogram/float_histogram.go
Add/Sub/Compact/DetectReset; promql/functions.go:640 ``histogramRate``) is
irreducibly per-sample sequential, so it runs in Arrow-batched pandas UDFs —
``mapInPandas`` over key-sorted partitions with many (sig, t) groups per
Arrow batch (``_grouped_apply_batched``), never a pandas frame per group.
Histogram samples are a small fraction of any real workload; the float hot
path never enters Python.

Arrow marshalling rules (hard-won):
- maps can't cross pandas→Arrow: labels ship as parallel key/value arrays
  and the struct is assembled JVM-side;
- list columns must be ``dtype=object`` and every batch must yield a
  correctly-shaped DataFrame even when empty.
"""

from __future__ import annotations

import functools

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prometheus_spark.engine.context import EvalContext
from prometheus_spark.model.labels import drop_name_expr, sig_expr
from prometheus_spark.model.schema import HISTOGRAM_TYPE

_FLAT_FIELDS = [
    T.StructField("label_keys", T.ArrayType(T.StringType())),
    T.StructField("label_values", T.ArrayType(T.StringType())),
    T.StructField("t", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("has_hist", T.BooleanType()),
    T.StructField("h_schema", T.IntegerType()),
    T.StructField("h_zt", T.DoubleType()),
    T.StructField("h_zc", T.DoubleType()),
    T.StructField("h_count", T.DoubleType()),
    T.StructField("h_sum", T.DoubleType()),
    T.StructField("h_pos_off", T.ArrayType(T.IntegerType())),
    T.StructField("h_pos_len", T.ArrayType(T.IntegerType())),
    T.StructField("h_pos_bkt", T.ArrayType(T.DoubleType())),
    T.StructField("h_neg_off", T.ArrayType(T.IntegerType())),
    T.StructField("h_neg_len", T.ArrayType(T.IntegerType())),
    T.StructField("h_neg_bkt", T.ArrayType(T.DoubleType())),
    T.StructField("h_custom", T.ArrayType(T.DoubleType())),
    T.StructField("h_hint", T.IntegerType()),
]
FLAT_SCHEMA = T.StructType(_FLAT_FIELDS)

_EMPTY = {
    "label_keys": [], "label_values": [], "t": [], "value": [], "has_hist": [],
    "h_schema": [], "h_zt": [], "h_zc": [], "h_count": [], "h_sum": [],
    "h_pos_off": [], "h_pos_len": [], "h_pos_bkt": [],
    "h_neg_off": [], "h_neg_len": [], "h_neg_bkt": [],
    "h_custom": [], "h_hint": [],
}


def _emit_pdf(rows: dict):
    """Build a correctly-typed pandas DataFrame from parallel lists."""
    import pandas as pd

    object_cols = {
        "label_keys", "label_values", "h_pos_off", "h_pos_len", "h_pos_bkt",
        "h_neg_off", "h_neg_len", "h_neg_bkt", "h_custom",
    }
    data = {}
    for f in _FLAT_FIELDS:
        col = rows[f.name]
        if f.name in object_cols:
            data[f.name] = pd.Series(col, dtype=object)
        elif f.name == "t":
            data[f.name] = pd.Series(col, dtype="int64")
        elif f.name == "has_hist":
            data[f.name] = pd.Series(col, dtype=bool)
        else:
            data[f.name] = pd.Series(col, dtype=object)  # nullable numerics
    return pd.DataFrame(data)


def _append_row(rows: dict, labels: dict, t: int, value, fh) -> None:
    rows["label_keys"].append(list(labels.keys()))
    rows["label_values"].append(list(labels.values()))
    rows["t"].append(int(t))
    rows["value"].append(value)
    if fh is None:
        rows["has_hist"].append(False)
        for k in ("h_schema", "h_zt", "h_zc", "h_count", "h_sum", "h_hint"):
            rows[k].append(None)
        for k in ("h_pos_off", "h_pos_len", "h_pos_bkt",
                  "h_neg_off", "h_neg_len", "h_neg_bkt", "h_custom"):
            rows[k].append(None)
        return
    rows["has_hist"].append(True)
    rows["h_schema"].append(int(fh.schema))
    rows["h_zt"].append(float(fh.zero_threshold))
    rows["h_zc"].append(float(fh.zero_count))
    rows["h_count"].append(float(fh.count))
    rows["h_sum"].append(float(fh.sum))
    rows["h_pos_off"].append([int(o) for o, _ in fh.pos_spans])
    rows["h_pos_len"].append([int(n) for _, n in fh.pos_spans])
    rows["h_pos_bkt"].append([float(b) for b in fh.pos_buckets])
    rows["h_neg_off"].append([int(o) for o, _ in fh.neg_spans])
    rows["h_neg_len"].append([int(n) for _, n in fh.neg_spans])
    rows["h_neg_bkt"].append([float(b) for b in fh.neg_buckets])
    rows["h_custom"].append([float(v) for v in fh.custom_values])
    rows["h_hint"].append(int(fh.counter_reset_hint))


def _fresh() -> dict:
    return {k: list(v) for k, v in _EMPTY.items()}


def _grouped_apply_batched(src: DataFrame, keys, process) -> DataFrame:
    """Grouped map without a pandas frame round-trip per group.

    ``groupBy(...).applyInPandas`` hands every (sig, t) group its own
    DataFrame and collects one back — ~ms of pandas overhead per group,
    which dominates when histogram groups are tiny and numerous.  Here
    the shuffle is the same (repartition by the leading key), partitions
    are sorted by the full key, and one Arrow batch spans MANY groups:
    ``process(group_pdf, rows)`` appends its output into a shared
    column-list buffer, and a frame is materialized once per ~batch.

    Groups can straddle Arrow-batch boundaries; the (contiguous,
    because sorted) tail group of each batch is carried into the next.
    """
    import pandas as pd

    keys = list(keys)
    # hash on the FULL key: grouping (sig, t) by sig alone serializes
    # low-sig-cardinality shapes — a global sum() has ONE output sig, so
    # every (t) group landed in a single task
    part = src.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(*keys)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        carry = None
        rows = _fresh()
        emitted = False

        def run(pdf):
            for _, g in pdf.groupby(keys, sort=False):
                process(g, rows)

        for pdf in it:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # partition is key-sorted → the last group is the contiguous
            # run of rows equal to the final key
            mask = pd.Series(True, index=pdf.index)
            for k in keys:
                mask &= pdf[k] == pdf[k].iloc[-1]
            tail_start = len(pdf) - int(mask.sum())
            carry = pdf.iloc[tail_start:]
            run(pdf.iloc[:tail_start])
            if len(rows["t"]) >= 8192:
                emitted = True
                yield _emit_pdf(rows)
                rows = _fresh()
        if carry is not None and len(carry):
            run(carry)
        if rows["t"] or not emitted:
            yield _emit_pdf(rows)

    return part.mapInPandas(batches, FLAT_SCHEMA)


def assemble(df: DataFrame, drop_name: bool = False) -> DataFrame:
    """Flattened Python output → canonical vector frame with hist struct.

    The projection is one static SQL string (composed once at import) —
    assemble runs on every histogram-path query, and the old per-call
    Column construction was a measurable slice of hist plan-build time."""
    return df.selectExpr(*_ASSEMBLE_COLS(bool(drop_name)))


@functools.lru_cache(maxsize=2)
def _ASSEMBLE_COLS(drop_name: bool) -> tuple:
    from prometheus_spark.model.labels import sig_sql

    htype = HISTOGRAM_TYPE.simpleString()
    hist = (
        "CAST(named_struct("
        "'schema', h_schema, 'zero_threshold', h_zt, 'zero_count', h_zc, "
        "'count', h_count, 'sum', h_sum, "
        "'pos_spans', arrays_zip(h_pos_off, h_pos_len), "
        "'pos_buckets', h_pos_bkt, "
        "'neg_spans', arrays_zip(h_neg_off, h_neg_len), "
        "'neg_buckets', h_neg_bkt, "
        "'custom_values', h_custom, "
        "'counter_reset_hint', CAST(h_hint AS TINYINT)"
        f") AS {htype})"
    )
    labels = "map_from_arrays(label_keys, label_values)"
    # delayed name removal: labels stay; drop_name flags the row and the
    # engine's finalization strips the metadata labels
    # pandas→Arrow folds NaN into null in the float column; histogram rows
    # legitimately carry NULL value, so only coalesce non-hist rows
    value = (
        "CASE WHEN has_hist THEN CAST(NULL AS DOUBLE) "
        "ELSE coalesce(value, CAST('NaN' AS DOUBLE)) END"
    )
    return (
        sig_sql(labels) + " AS sig",
        labels + " AS labels",
        "t",
        "t AS sample_t",
        value + " AS value",
        f"{str(drop_name).lower()} AS drop_name",
        f"CASE WHEN has_hist THEN {hist} END AS hist",
    )


def binop_add_sub(ctx: EvalContext, pairs: DataFrame, sub: bool) -> DataFrame:
    """hist ± hist over joined pairs (engine.go:3484 ``vectorElemBinop``
    ADD/SUB histogram case).  ``pairs``: (labels, t, __lh, __rh) with both
    histograms non-null.  Incompatible schemas drop the sample."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    src = pairs.select("labels", "t", "__lh", "__rh")

    def batches(it: Iterator) -> Iterator:
        from prometheus_spark.model.histogram import (
            GAUGE_TYPE,
            HistIncompatibleSchema,
            from_row,
        )

        for pdf in it:
            rows = _fresh()
            # itertuples mangles leading-underscore names; zip columns
            for labels, t, lh, rh in zip(
                pdf["labels"], pdf["t"], pdf["__lh"], pdf["__rh"]
            ):
                l, r = from_row(lh), from_row(rh)
                try:
                    l.add(r, sub=sub)
                except HistIncompatibleSchema:
                    continue
                if sub:
                    l.counter_reset_hint = GAUGE_TYPE
                l.compact()
                _append_row(rows, dict(labels), t, None, l)
            yield _emit_pdf(rows)

    # hist±hist changes the metric schema → flag for delayed name removal
    return assemble(src.mapInPandas(batches, FLAT_SCHEMA), drop_name=True)


def trim_scalar(ctx: EvalContext, src: DataFrame, is_upper: bool) -> DataFrame:
    """``</`` / ``>/`` — histogram bucket trimming by a scalar
    (vectorElemBinop TRIM_UPPER/TRIM_LOWER; float_histogram.go:2129).
    ``src``: (labels, t, hist, __s) with hist non-null."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)

    def batches(it: Iterator) -> Iterator:
        from prometheus_spark.model.histogram import from_row, hist_trim_buckets

        for pdf in it:
            rows = _fresh()
            for labels, t, hd, s in zip(
                pdf["labels"], pdf["t"], pdf["hist"], pdf["__s"]
            ):
                h = hist_trim_buckets(from_row(hd), float(s), is_upper)
                _append_row(rows, dict(labels), t, None, h)
            yield _emit_pdf(rows)

    return assemble(
        src.select("labels", "t", "hist", "__s").mapInPandas(batches, FLAT_SCHEMA)
    )


def group_sum(
    ctx: EvalContext,
    df: DataFrame,
    avg: bool,
    drop_name: bool = False,
    order_col: str = "__ord",
) -> DataFrame:
    """Sum/avg histograms per (sig, t) group (engine.go:3716 ``KahanAdd``
    path).  ``df``: (sig, labels, t, hist, <order_col>) with hist non-null;
    ``order_col`` fixes the Kahan summation order (the reference iterates
    series in label order / samples in time order — compensation is
    order-sensitive).  Groups with incompatible schemas are dropped."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    src = df.select("sig", "labels", "t", "hist", F.col(order_col).alias("__ord"))

    def one_group(pdf, rows):
        from prometheus_spark.model.histogram import from_row, hist_mean, hist_sum

        pdf = pdf.sort_values("__ord")
        hists = [from_row(h) for h in pdf["hist"]]
        acc, incompatible = (hist_mean if avg else hist_sum)(hists)
        if acc is not None and not incompatible:
            _append_row(rows, dict(pdf["labels"].iloc[0]), pdf["t"].iloc[0], None, acc)
        return

    out = _grouped_apply_batched(src, ("sig", "t"), one_group)
    return assemble(out, drop_name=drop_name)


def window_rate(
    ctx: EvalContext,
    windowed: DataFrame,
    range_ms: int,
    is_counter: bool,
    is_rate: bool,
) -> DataFrame:
    """rate/increase/delta over all-histogram windows (functions.go:640
    ``histogramRate`` + :452 extrapolation).  ``windowed``: (sig, labels,
    t, wend, sample_t, hist), hist non-null."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    if "st" not in windowed.columns:
        windowed = windowed.withColumn("st", F.lit(None).cast("long"))
    src = windowed.select("sig", "labels", "t", "wend", "sample_t", "hist", "st")
    range_s = range_ms / 1000.0

    def one_group(pdf, rows):
        from prometheus_spark.model.histogram import from_row, hist_rate

        pdf = pdf.sort_values("sample_t")
        points = [(int(t), from_row(h)) for t, h in zip(pdf["sample_t"], pdf["hist"])]
        sts = [None if st is None or st != st else int(st) for st in pdf["st"]]
        wend = int(pdf["wend"].iloc[0])
        first_t, last_t = points[0][0], points[-1][0]
        st0 = sts[0] or 0
        # first sample's ST inside the window: substitute a zero sample at
        # the ST for left extrapolation (functions.go:551); this also
        # enables single-sample rates
        st_cond = is_counter and st0 != 0 and (wend - range_ms) < st0 < first_t
        h = hist_rate(points, range_s, is_counter, is_rate, sts)
        if h is None and not (st_cond and len(points) == 1):
            return
        sampled = (last_t - first_t) / 1000.0
        avg_spacing = sampled / (len(points) - 1) if len(points) > 1 else 0.0
        threshold = avg_spacing * 1.1
        dur_start = (first_t - (wend - range_ms)) / 1000.0
        dur_end = (wend - last_t) / 1000.0
        if st_cond:
            dur_start = 0.0
            sampled = (last_t - st0) / 1000.0
            if h is None:
                h = points[0][1].copy()
            else:
                h.add(points[0][1])
        else:
            if dur_start >= threshold:
                dur_start = avg_spacing / 2.0
            if is_counter and h.count > 0 and points[0][1].count >= 0:
                dur_zero = sampled * (points[0][1].count / h.count)
                if dur_zero < dur_start:
                    dur_start = dur_zero
        if dur_end >= threshold:
            dur_end = avg_spacing / 2.0
        factor = (sampled + dur_start + dur_end) / sampled if sampled else 1.0
        if is_rate:
            factor /= range_s
        h.mul(factor)
        h.compact()
        from prometheus_spark.model.histogram import GAUGE_TYPE

        h.counter_reset_hint = GAUGE_TYPE
        _append_row(rows, dict(pdf["labels"].iloc[0]), int(pdf["t"].iloc[0]), None, h)
        return

    out = _grouped_apply_batched(src, ("sig", "t"), one_group)
    return assemble(out, drop_name=True)


def window_instant_pair(ctx: EvalContext, windowed: DataFrame, is_rate: bool) -> DataFrame:
    """irate/idelta over windows containing histogram samples
    (functions.go ``instantValue``): last two samples of the combined
    float+histogram sequence; a mixed pair drops the series."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    if "st" not in windowed.columns:
        windowed = windowed.withColumn("st", F.lit(None).cast("long"))
    src = windowed.select("sig", "labels", "t", "sample_t", "value", "hist", "st")

    def one_group(pdf, rows):
        from prometheus_spark.model.histogram import (
            GAUGE_TYPE,
            HistIncompatibleSchema,
            from_row,
            st_reset,
        )

        pdf = pdf.sort_values("sample_t")
        if len(pdf) < 2:
            return
        t0, t1 = int(pdf["sample_t"].iloc[-2]), int(pdf["sample_t"].iloc[-1])
        if t1 == t0:
            return
        dt = (t1 - t0) / 1000.0
        h0 = from_row(pdf["hist"].iloc[-2]) if pdf["hist"].iloc[-2] is not None else None
        h1 = from_row(pdf["hist"].iloc[-1]) if pdf["hist"].iloc[-1] is not None else None
        s0, s1 = pdf["st"].iloc[-2], pdf["st"].iloc[-1]
        s0 = None if s0 is None or s0 != s0 else int(s0)
        s1 = None if s1 is None or s1 != s1 else int(s1)
        streset = st_reset(s0, t0, s1, t1)
        labels = dict(pdf["labels"].iloc[0])
        t_out = int(pdf["t"].iloc[0])
        if h0 is None and h1 is None:
            v0, v1 = float(pdf["value"].iloc[-2]), float(pdf["value"].iloc[-1])
            res = v1 if (is_rate and (v1 < v0 or streset)) else v1 - v0
            if is_rate:
                res /= dt
            _append_row(rows, labels, t_out, res, None)
        elif h0 is not None and h1 is not None:
            res = h1.copy()
            try:
                if (not is_rate) or not (streset or h1.detect_reset(h0)):
                    res.add(h0, sub=True)
            except HistIncompatibleSchema:
                return
            res.counter_reset_hint = GAUGE_TYPE
            if is_rate:
                res.div(dt)
            res.compact()
            _append_row(rows, labels, t_out, None, res)
        # mixed float/histogram pair: drop
        return

    out = _grouped_apply_batched(src, ("sig", "t"), one_group)
    return assemble(out, drop_name=True)


def window_extended_rate(
    ctx: EvalContext,
    windowed: DataFrame,
    range_ms: int,
    is_counter: bool,
    is_rate: bool,
    smoothed: bool,
) -> DataFrame:
    """rate/increase/delta on anchored/smoothed all-histogram windows
    (functions.go:374 ``extendedHistogramRate``)."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    src = windowed.select("sig", "labels", "t", "sample_t", "orig_t", "hist", "wend", "role")

    def one_group(pdf, rows):
        from prometheus_spark.model.histogram import from_row, hist_extended_rate

        pdf = pdf.sort_values("sample_t")
        points = [
            (int(ot), from_row(h), r)
            for ot, h, r in zip(pdf["orig_t"], pdf["hist"], pdf["role"])
            if h is not None
        ]
        if len(points) != len(pdf):  # mixed float/histogram window
            return
        h = hist_extended_rate(
            points, range_ms, int(pdf["wend"].iloc[0]), is_counter, is_rate, smoothed
        )
        if h is not None:
            _append_row(rows, dict(pdf["labels"].iloc[0]), int(pdf["t"].iloc[0]), None, h)
        return

    out = _grouped_apply_batched(src, ("sig", "t"), one_group)
    return assemble(out, drop_name=True)


def smoothed_instant_hist(
    ctx: EvalContext, df: DataFrame, offset: int, at=None
) -> DataFrame:
    """Instant smoothed selector over series carrying histogram samples
    (engine.go ``smoothSeries`` histogram branch): exact sample → copy;
    surrounded → interpolateHistograms (counter unless both gauge); only a
    preceding sample → carry forward with hint reset to unknown; a step
    window mixing floats and histograms is skipped.  Name kept."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    src = df.select("sig", "labels", "t", "value", "hist")
    lb = ctx.lookback_ms
    start, end, step = ctx.start_ms, ctx.end_ms, ctx.step_ms
    ref = ctx.resolve_at(at) - offset if at is not None else None
    off = offset

    def one_series(pdf, rows):
        from bisect import bisect_left

        from prometheus_spark.model.histogram import (
            GAUGE_TYPE,
            UNKNOWN_RESET,
            HistIncompatibleSchema,
            from_row,
            hist_interpolate,
        )

        pdf = pdf.sort_values("t")
        ts = [int(x) for x in pdf["t"]]
        vals = list(pdf["value"])
        hists = [from_row(h) if h is not None else None for h in pdf["hist"]]
        labels = dict(pdf["labels"].iloc[0])
        for step_t in range(start, end + 1, step or 1):
            data_ts = ref if ref is not None else step_t - off
            lo_i = bisect_left(ts, data_ts - lb + 1)
            hi_i = bisect_left(ts, data_ts + lb + 1)
            w_h = [(ts[i], hists[i]) for i in range(lo_i, hi_i) if hists[i] is not None]
            w_f = [(ts[i], vals[i]) for i in range(lo_i, hi_i) if hists[i] is None]
            if w_h and w_f:
                continue  # mixed window: warn & skip
            if not w_h:
                continue  # pure-float series handled JVM-side
            i = bisect_left([t for t, _ in w_h], data_ts)
            out_h = None
            if i < len(w_h) and w_h[i][0] == data_ts:
                out_h = w_h[i][1].copy()
            elif 0 < i < len(w_h):
                (pt, ph), (nt, nh) = w_h[i - 1], w_h[i]
                if ph.uses_custom_buckets() != nh.uses_custom_buckets():
                    continue
                is_counter = (
                    ph.counter_reset_hint != GAUGE_TYPE
                    or nh.counter_reset_hint != GAUGE_TYPE
                )
                try:
                    out_h = hist_interpolate(ph, pt, nh, nt, data_ts, is_counter)
                except HistIncompatibleSchema:
                    continue
            elif i > 0:
                out_h = w_h[i - 1][1].copy()
                out_h.counter_reset_hint = UNKNOWN_RESET
            else:
                continue
            out_h.compact()
            _append_row(rows, labels, step_t, None, out_h)
        return

    out = _grouped_apply_batched(src, ("sig",), one_series)
    return assemble(out)


def window_resets_changes(ctx: EvalContext, windowed: DataFrame, func: str) -> DataFrame:
    """resets/changes over windows containing histogram samples
    (functions.go:2359/2431): float↔histogram transitions always count;
    hist→hist uses DetectReset / !Equals."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    if "st" not in windowed.columns:
        windowed = windowed.withColumn("st", F.lit(None).cast("long"))
    src = windowed.select("sig", "labels", "t", "sample_t", "value", "hist", "st")
    count_resets = func == "resets"

    def one_group(pdf, rows):
        import math

        from prometheus_spark.model.histogram import from_row, st_reset

        pdf = pdf.sort_values("sample_t")
        samples = []  # (float|None, FloatHist|None, t, st)
        for v, h, t, st in zip(pdf["value"], pdf["hist"], pdf["sample_t"], pdf["st"]):
            # NULL vs NaN is ambiguous in pandas doubles; hist presence
            # decides the sample kind (hist rows carry NULL value)
            fh = from_row(h) if h is not None else None
            stv = None if st is None or st != st else int(st)
            samples.append((None if fh is not None else float(v), fh, int(t), stv))
        if not samples:
            return
        n = 0
        prev_f, prev_h, prev_t, prev_st = samples[0]
        for cur_f, cur_h, cur_t, cur_st in samples[1:]:
            streset = count_resets and st_reset(prev_st, prev_t, cur_st, cur_t)
            if prev_h is None and cur_h is None:
                if count_resets:
                    if cur_f < prev_f or streset:
                        n += 1
                elif cur_f != prev_f and not (math.isnan(cur_f) and math.isnan(prev_f)):
                    n += 1
            elif (prev_h is None) != (cur_h is None):
                n += 1
            else:
                if count_resets:
                    if streset or cur_h.detect_reset(prev_h):
                        n += 1
                elif not cur_h.equals(prev_h):
                    n += 1
            prev_f, prev_h, prev_t, prev_st = cur_f, cur_h, cur_t, cur_st
        _append_row(rows, dict(pdf["labels"].iloc[0]), int(pdf["t"].iloc[0]), float(n), None)
        return

    out = _grouped_apply_batched(src, ("sig", "t"), one_group)
    return assemble(out, drop_name=True)


def window_rate_asof(
    ctx: EvalContext,
    base: DataFrame,
    range_ms: int,
    offset_ms: int,
    is_counter: bool,
    is_rate: bool,
) -> DataFrame:
    """rate/increase/delta over PURE-histogram series without the
    range/step window explode.

    :func:`window_rate` receives every sample duplicated once per window
    it falls in and runs ``hist_rate`` per (sig, step) group — at ratio
    40 (``rate(h[20m])`` on a 30s grid) that is 40× the input through a
    shuffle AND 40× the ``from_row`` deserializations.  Here each series
    ships ONCE into an Arrow batch: samples deserialize once, adjacent-
    pair counter resets and schema/custom-bucket arrays are computed
    once, windows come from two ``searchsorted`` probes, and each window
    replays ``hist_rate``'s exact op sequence on index slices — the
    per-window correction loop touches only the resets inside the window
    (``reset_idx`` bisection), so windows without resets cost three
    histogram ops (copy, sub, mul).  Bit-identical to the explode path:
    same ops in the same order per window (pinned by
    tests/test_prefix_range.py::test_hist_rate_asof_parity and the
    native_histograms corpus under PROMSPARK_PREFIX_RANGE_THRESHOLD=0).

    ``base``: un-windowed samples (sig, labels, t, hist[, st]) of series
    whose samples are ALL histograms; mixed float+hist series must stay
    on the explode path (``_split_windows`` owns per-window float/mixed
    routing).
    """
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    import numpy as np

    if "st" not in base.columns:
        base = base.withColumn("st", F.lit(None).cast("long"))
    src = base.select("sig", "labels", "t", "hist", "st")
    range_s = range_ms / 1000.0
    rng = int(range_ms)
    step_arr = np.arange(
        ctx.start_ms, ctx.end_ms + 1, ctx.step_ms, dtype=np.int64
    )
    wend_arr = step_arr - offset_ms

    def one_series(pdf, rows):
        from prometheus_spark.model.histogram import (
            GAUGE_TYPE,
            FloatHist,
            HistIncompatibleSchema,
            from_row,
            st_reset,
        )

        pdf = pdf.sort_values("t")
        ts = pdf["t"].to_numpy(np.int64)
        points = [from_row(h) for h in pdf["hist"]]
        sts = [None if st is None or st != st else int(st) for st in pdf["st"]]
        labels = dict(pdf["labels"].iloc[0])
        n_s = len(points)
        reset = np.zeros(n_s, dtype=bool)  # reset[j] = pair (j-1, j)
        if is_counter:
            for j in range(1, n_s):
                pj, pp = points[j], points[j - 1]
                if pj is None or pp is None:
                    continue
                reset[j] = st_reset(
                    sts[j - 1], int(ts[j - 1]), sts[j], int(ts[j])
                ) or pj.detect_reset(pp)
        reset_idx = np.flatnonzero(reset)
        nones = np.array([p is None for p in points], dtype=bool)
        schemas = np.array(
            [p.schema if p is not None else 127 for p in points], dtype=np.int32
        )
        customs = np.array(
            [bool(p.uses_custom_buckets()) if p is not None else False
             for p in points],
            dtype=bool,
        )
        right = np.searchsorted(ts, wend_arr, side="right")
        left = np.searchsorted(ts, wend_arr - rng, side="right")

        def rate_window(a: int, b: int):
            # hist_rate (model/histogram.py:1094) on the index slice
            prev, last = points[a], points[b]
            if prev is None or last is None:
                return None
            using_custom = prev.uses_custom_buckets()
            if is_counter:
                second = points[a + 1]
                if second is not None and reset[a + 1]:
                    prev = FloatHist(
                        schema=second.schema,
                        custom_values=list(second.custom_values),
                    )
                    using_custom = second.uses_custom_buckets()
            if last.uses_custom_buckets() != using_custom:
                return None
            min_schema = min(last.schema, prev.schema)
            if b - a >= 2:  # middles a+1 .. b-1
                mid = slice(a + 1, b)
                if nones[mid].any():
                    return None
                if is_counter:
                    if (customs[mid] != using_custom).any():
                        return None
                    noncust = ~customs[mid]
                    if noncust.any():
                        mmin = int(schemas[mid][noncust].min())
                        if mmin < min_schema:
                            min_schema = mmin
            h = last.copy().reduce_to_schema(min_schema)
            try:
                h.add(prev, sub=True)
                if is_counter:
                    # pairs j in [a+2 .. b] with a reset, in time order —
                    # identical op order to hist_rate's loop (the window's
                    # first pair is a numeric no-op there: on reset, prev
                    # was replaced by an empty histogram before the add)
                    lo = int(np.searchsorted(reset_idx, a + 2))
                    hi = int(np.searchsorted(reset_idx, b, side="right"))
                    for j in reset_idx[lo:hi]:
                        h.add(points[int(j) - 1])
            except HistIncompatibleSchema:
                return None
            h.counter_reset_hint = GAUGE_TYPE
            return h.compact()

        for w in range(len(step_arr)):
            a, b = int(left[w]), int(right[w]) - 1
            npts = b - a + 1
            if npts < 1:
                continue
            wend = int(wend_arr[w])
            first_t, last_t = int(ts[a]), int(ts[b])
            st0 = sts[a] or 0
            st_cond = (
                is_counter and st0 != 0 and (wend - rng) < st0 < first_t
            )
            h = rate_window(a, b) if npts >= 2 else None
            if h is None and not (st_cond and npts == 1):
                continue
            # extrapolation — window_rate.one_group, verbatim arithmetic
            sampled = (last_t - first_t) / 1000.0
            avg_spacing = sampled / (npts - 1) if npts > 1 else 0.0
            threshold = avg_spacing * 1.1
            dur_start = (first_t - (wend - rng)) / 1000.0
            dur_end = (wend - last_t) / 1000.0
            if st_cond:
                dur_start = 0.0
                sampled = (last_t - st0) / 1000.0
                if h is None:
                    h = points[a].copy()
                else:
                    h.add(points[a])
            else:
                if dur_start >= threshold:
                    dur_start = avg_spacing / 2.0
                if is_counter and h.count > 0 and points[a].count >= 0:
                    dur_zero = sampled * (points[a].count / h.count)
                    if dur_zero < dur_start:
                        dur_start = dur_zero
            if dur_end >= threshold:
                dur_end = avg_spacing / 2.0
            factor = (sampled + dur_start + dur_end) / sampled if sampled else 1.0
            if is_rate:
                factor /= range_s
            h.mul(factor)
            h.compact()
            h.counter_reset_hint = GAUGE_TYPE
            _append_row(rows, labels, int(step_arr[w]), None, h)
        return

    out = _grouped_apply_batched(src, ("sig",), one_series)
    return assemble(out, drop_name=True)
