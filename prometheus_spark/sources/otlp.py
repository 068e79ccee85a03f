"""OTLP metrics receiver / translation (OpenTelemetry → samples).

Reference surface: web/api/v1/api.go:484 (OTLP write endpoint) and
storage/remote/otlptranslator/prometheusremotewrite/ (translation).
Wire schema: opentelemetry-proto ``ExportMetricsServiceRequest`` — a
public protocol; decoded here with the same pure-Python protobuf codec
as remote_write.py (no generated code, no external deps).

Translation semantics mirrored from the reference translator:

- metric name normalization: invalid chars → ``_``, unit suffix
  appended, ``_total`` for monotonic sums, ``_ratio`` for unit-"1"
  gauges (public otlptranslator naming rules)
- resource attributes ``service.namespace``/``service.name`` →
  ``job`` ("namespace/name"), ``service.instance.id`` → ``instance``
  (metrics_to_prw.go:455-465)
- gauge / cumulative sum → float samples; delta sums are rejected like
  the reference default (no delta ingestion)
- explicit-bounds histogram → classic ``_bucket``/``_sum``/``_count``
  series (+Inf bucket synthesized)
- exponential histogram → native histogram: ``schema = min(scale, 8)``
  with 2^(scale-8) bucket merging, Prometheus bucket index =
  OTLP index + 1 (histograms.go:89-140, convertBucketsLayout)
- summary → ``{quantile="φ"}`` / ``_sum`` / ``_count``
- ``target_info`` emitted per resource carrying the non-identifying
  resource attributes (helper.go:552-600, simplified: one sample per
  distinct datapoint timestamp)

Spark-shaped ingest: ``otlp_to_rows`` runs at the HTTP/receiver
boundary (per request, never per query); rows then flow through the
same spool → ``readStream`` path as remote-write.
"""

from __future__ import annotations

import math
import re
import struct
from typing import Optional

from prometheus_spark.sources.remote_write import (
    _fields,
    _read_varint,
    _zigzag_dec,
)

NATIVE_SCHEMA_MAX = 8
NATIVE_SCHEMA_MIN = -4
DEFAULT_ZERO_THRESHOLD = 1e-128  # histograms.go:33

# Public OTLP → Prometheus unit mapping (otlptranslator unit map).
_UNIT_MAP = {
    "d": "days", "h": "hours", "min": "minutes", "s": "seconds",
    "ms": "milliseconds", "us": "microseconds", "ns": "nanoseconds",
    "By": "bytes", "KiBy": "kibibytes", "MiBy": "mebibytes",
    "GiBy": "gibibytes", "TiBy": "tibibytes",
    "KBy": "kilobytes", "MBy": "megabytes", "GBy": "gigabytes",
    "TBy": "terabytes",
    "1": "", "%": "percent",
}
_PER_UNIT_MAP = {
    "s": "second", "m": "minute", "h": "hour", "d": "day",
    "w": "week", "mo": "month", "y": "year",
}


def _unit_word(unit: str) -> str:
    """Normalized unit word for the __unit__ label (otlptranslator
    unitNamer.Build essentials: the same main/per mapping the name
    suffix logic uses)."""
    if not unit:
        return ""
    if "/" in unit:
        num, _, den = unit.partition("/")
        main = _UNIT_MAP.get(num.strip(), _sanitize(num.strip()))
        per = _PER_UNIT_MAP.get(den.strip(), _sanitize(den.strip()))
        return f"{main}_per_{per}" if per else main
    return _UNIT_MAP.get(unit.strip(), _sanitize(unit.strip()))


def _sanitize(name: str) -> str:
    out = re.sub(r"[^a-zA-Z0-9_:]", "_", name)
    out = re.sub(r"__+", "_", out)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def _sanitize_label(name: str) -> str:
    out = re.sub(r"[^a-zA-Z0-9_]", "_", name)
    if out and out[0].isdigit():
        out = "key_" + out
    return out


def normalize_metric_name(
    name: str,
    unit: str,
    metric_type: str,
    monotonic: bool = False,
    strategy: str = "UnderscoreEscapingWithSuffixes",
) -> str:
    """otlptranslator.BuildCompliantName essentials.  ``strategy`` maps
    the config's ``otlp.translation_strategy`` options: underscore
    escaping and/or type-unit suffixes, or ``NoTranslation`` verbatim
    (config.go OTLPConfig / otlptranslator TranslationStrategyOption)."""
    if strategy == "NoTranslation":
        return name
    escape = strategy.startswith("UnderscoreEscaping")
    with_suffixes = strategy.endswith("WithSuffixes")
    out = _sanitize(name) if escape else name
    if not with_suffixes:
        return out
    main_unit, per_unit = "", ""
    if unit and "/" in unit:
        num, _, den = unit.partition("/")
        main_unit = _UNIT_MAP.get(num.strip(), _sanitize(num.strip()))
        per = _PER_UNIT_MAP.get(den.strip(), _sanitize(den.strip()))
        per_unit = f"per_{per}" if per else ""
    elif unit:
        main_unit = _UNIT_MAP.get(unit.strip(), _sanitize(unit.strip()))
    for suffix in (main_unit, per_unit):
        if suffix and not out.endswith(suffix):
            out = f"{out}_{suffix}"
    if metric_type == "sum" and monotonic:
        if out.endswith("_total"):
            out = out[: -len("_total")]
        out = out + "_total"
    elif metric_type == "gauge" and unit == "1" and not out.endswith("_ratio"):
        out = out + "_ratio"
    return out


# --------------------------------------------------------------------------
# wire decode helpers


def _f64(v: bytes) -> float:
    return struct.unpack("<d", v)[0]


def _sf64(v: bytes) -> int:
    return struct.unpack("<q", v)[0]


def _u64(v: bytes) -> int:
    return struct.unpack("<Q", v)[0]


def _packed_u64(buf: bytes) -> list[int]:
    return [_u64(buf[i : i + 8]) for i in range(0, len(buf), 8)]


def _packed_f64(buf: bytes) -> list[float]:
    return [_f64(buf[i : i + 8]) for i in range(0, len(buf), 8)]


def _packed_varints(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        n, pos = _read_varint(buf, pos)
        out.append(n)
    return out


def _any_value(buf: bytes) -> str:
    for fno, wt, v in _fields(buf):
        if fno == 1:
            return v.decode()
        if fno == 2:
            return "true" if v else "false"
        if fno == 3:
            return str(v if v < (1 << 63) else v - (1 << 64))
        if fno == 4 and wt == 1:
            return repr(_f64(v))
    return ""


def _keyvalues(bufs: list[bytes]) -> dict[str, str]:
    out = {}
    for buf in bufs:
        key, val = "", ""
        for fno, _wt, v in _fields(buf):
            if fno == 1:
                key = v.decode()
            elif fno == 2:
                val = _any_value(v)
        out[key] = val
    return out


def _gofmt(v: float) -> str:
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


# --------------------------------------------------------------------------
# exponential buckets → native histogram layout (histograms.go:170-245)


def convert_buckets_layout(
    bucket_counts: list[int], offset: int, scale_down: int
) -> tuple[list[dict], list[float]]:
    """OTLP dense exponential buckets → (spans, absolute float buckets),
    Prometheus index = (otlp index >> scale_down) + 1."""
    merged: dict[int, float] = {}
    for i, c in enumerate(bucket_counts):
        if c == 0:
            continue
        idx = ((offset + i) >> scale_down) + 1
        merged[idx] = merged.get(idx, 0.0) + float(c)
    if not merged:
        return [], []
    idxs = sorted(merged)
    spans: list[dict] = []
    buckets: list[float] = []
    prev_end: Optional[int] = None
    for idx in idxs:
        if prev_end is None:
            spans.append({"offset": idx, "length": 1})
        elif idx == prev_end:
            spans[-1]["length"] += 1
        else:
            spans.append({"offset": idx - prev_end, "length": 1})
        buckets.append(merged[idx])
        prev_end = idx + 1
    return spans, buckets


# --------------------------------------------------------------------------
# datapoint decoders

_DELTA = 1  # AggregationTemporality enum
_CUMULATIVE = 2


class DeltaToCumulative:
    """In-memory delta→cumulative conversion state — the opt-in path of
    the reference OTLP handler (storage/remote/write_otlp_handler.go:43
    ``OTLPOptions.ConvertDelta``, backed by the otel deltatocumulative
    processor).  Per series: running totals keyed by the final label
    set; a changed start timestamp marks a new stream and resets the
    accumulator; out-of-order datapoints are dropped (the processor
    requires strictly increasing timestamps per series).

    State lives on the receiver (per OTLPReceiver instance) so totals
    accumulate across requests, like the processor living inside the
    long-lived handler.  Cardinality is bounded by active delta series —
    the same footprint the reference accepts in-memory."""

    _DROP = object()  # sentinel: out-of-order datapoint, drop it

    def __init__(self, max_series: int = 1_000_000):
        self._state: dict = {}
        # bound on tracked delta series — state is per-receiver and
        # lives for the process; past the cap the oldest-updated series
        # are evicted (the otel processor expires idle streams too)
        self.max_series = max_series

    def _slot(self, key, t, st):
        """Existing stream state, None for a fresh/reset stream, or
        _DROP for an out-of-order datapoint.  The stream-restart check
        runs FIRST: a restarted source's new start timestamp resets the
        accumulator even when its first sample timestamp doesn't exceed
        the dead stream's last one (clock skew / start-aligned first
        point)."""
        s = self._state.get(key)
        if s is None:
            return None
        if st is not None and s["st"] is not None and st != s["st"]:
            return None  # restarted source → new stream, reset totals
        if t <= s["t"]:
            return self._DROP
        return s

    def _evict_if_full(self):
        if len(self._state) <= self.max_series:
            return
        drop = sorted(self._state.items(), key=lambda kv: kv[1]["t"])[
            : len(self._state) - self.max_series
        ]
        for k, _ in drop:
            del self._state[k]

    def add_number(self, key, t, v, st):
        """→ (cumulative_value, stream_start) or None to drop."""
        s = self._slot(key, t, st)
        if s is self._DROP:
            return None
        if s is None:
            s = {"t": t, "st": st, "value": float(v)}
            self._state[key] = s
            self._evict_if_full()
        else:
            s["t"] = t
            s["value"] += float(v)
        return s["value"], s["st"]

    def add_classic(self, key, t, dp, st):
        """Explicit-bounds histogram delta → accumulated (count, sum,
        bucket_counts, stream_start); a bounds change resets the
        stream."""
        s = self._slot(key, t, st)
        if s is self._DROP:
            return None
        if s is not None and s["bounds"] != list(dp["bounds"]):
            s = None
        if s is None:
            s = {
                "t": t, "st": st,
                "count": float(dp["count"]),
                "sum": None if dp["sum"] is None else float(dp["sum"]),
                "bounds": list(dp["bounds"]),
                "buckets": [float(b) for b in dp["bucket_counts"]],
            }
            self._state[key] = s
            self._evict_if_full()
        else:
            s["t"] = t
            s["count"] += float(dp["count"])
            if dp["sum"] is not None:
                s["sum"] = (s["sum"] or 0.0) + float(dp["sum"])
            for i, b in enumerate(dp["bucket_counts"]):
                if i < len(s["buckets"]):
                    s["buckets"][i] += float(b)
                else:
                    s["buckets"].append(float(b))
        return s["count"], s["sum"], list(s["buckets"]), s["st"]

    def add_native(self, key, t, hist, st):
        """Exponential-histogram delta → accumulated native histogram
        dict (FloatHist.add handles schema reconciliation)."""
        from prometheus_spark.model.histogram import from_row

        s = self._slot(key, t, st)
        if s is self._DROP:
            return None
        if s is None:
            s = {"t": t, "st": st, "hist": from_row(hist)}
            self._state[key] = s
            self._evict_if_full()
        else:
            s["t"] = t
            s["hist"].add(from_row(hist))
        return s["hist"].to_row(), s["st"]


def _otlp_exemplar(buf: bytes) -> dict:
    """OTLP Exemplar{filtered_attributes=7, time_unix_nano=2,
    as_double=3, span_id=4, trace_id=5, as_int=6} → prometheus exemplar
    labels with hex trace_id/span_id (helper.go getPromExemplars)."""
    labels: dict[str, str] = {}
    value, t = 0.0, 0
    attrs: list[bytes] = []
    for fno, wt, v in _fields(buf):
        if fno == 7:
            attrs.append(v)
        elif fno == 2 and wt == 1:
            t = _u64(v) // 1_000_000
        elif fno == 3 and wt == 1:
            value = _f64(v)
        elif fno == 6 and wt == 1:
            value = float(_sf64(v))
        elif fno == 4 and wt == 2 and v:
            labels["span_id"] = v.hex()
        elif fno == 5 and wt == 2 and v:
            labels["trace_id"] = v.hex()
    for k, v in _keyvalues(attrs).items():
        labels.setdefault(_sanitize_label(k), v)
    return {"labels": labels, "value": value, "t": t}


def _number_dp(buf: bytes) -> dict:
    dp = {"attrs": [], "t": 0, "st": None, "value": 0.0, "flags": 0,
          "exemplars": []}
    for fno, wt, v in _fields(buf):
        if fno == 7:
            dp["attrs"].append(v)
        elif fno == 2 and wt == 1:
            dp["st"] = _u64(v) // 1_000_000
        elif fno == 3 and wt == 1:
            dp["t"] = _u64(v) // 1_000_000
        elif fno == 4 and wt == 1:
            dp["value"] = _f64(v)
        elif fno == 6 and wt == 1:
            dp["value"] = float(_sf64(v))
        elif fno == 8 and wt == 0:
            dp["flags"] = v
        elif fno == 5 and wt == 2:  # exemplars
            dp["exemplars"].append(_otlp_exemplar(v))
    return dp


def _hist_dp(buf: bytes) -> dict:
    dp = {"attrs": [], "t": 0, "st": None, "count": 0, "sum": None,
          "bucket_counts": [], "bounds": [], "exemplars": []}
    for fno, wt, v in _fields(buf):
        if fno == 9:
            dp["attrs"].append(v)
        elif fno == 2 and wt == 1:
            dp["st"] = _u64(v) // 1_000_000
        elif fno == 3 and wt == 1:
            dp["t"] = _u64(v) // 1_000_000
        elif fno == 4 and wt == 1:
            dp["count"] = _u64(v)
        elif fno == 5 and wt == 1:
            dp["sum"] = _f64(v)
        elif fno == 6 and wt == 2:
            dp["bucket_counts"] = _packed_u64(v)
        elif fno == 7 and wt == 2:
            dp["bounds"] = _packed_f64(v)
        elif fno == 8 and wt == 2:  # exemplars
            dp["exemplars"].append(_otlp_exemplar(v))
    return dp


def _exp_hist_dp(buf: bytes) -> dict:
    dp = {"attrs": [], "t": 0, "st": None, "count": 0, "sum": None,
          "scale": 0, "zero_count": 0,
          "pos_offset": 0, "pos_counts": [],
          "neg_offset": 0, "neg_counts": [], "exemplars": []}
    for fno, wt, v in _fields(buf):
        if fno == 1:
            dp["attrs"].append(v)
        elif fno == 2 and wt == 1:
            dp["st"] = _u64(v) // 1_000_000
        elif fno == 3 and wt == 1:
            dp["t"] = _u64(v) // 1_000_000
        elif fno == 4 and wt == 1:
            dp["count"] = _u64(v)
        elif fno == 5 and wt == 1:
            dp["sum"] = _f64(v)
        elif fno == 6 and wt == 0:
            dp["scale"] = _zigzag_dec(v)
        elif fno == 7 and wt == 1:
            dp["zero_count"] = _u64(v)
        elif fno in (8, 9) and wt == 2:  # positive / negative Buckets
            off, counts = 0, []
            for bf, bwt, bv in _fields(v):
                if bf == 1 and bwt == 0:
                    off = _zigzag_dec(bv)
                elif bf == 2 and bwt == 2:
                    counts = _packed_varints(bv)
                elif bf == 2 and bwt == 0:
                    counts.append(bv)
            if fno == 8:
                dp["pos_offset"], dp["pos_counts"] = off, counts
            else:
                dp["neg_offset"], dp["neg_counts"] = off, counts
        elif fno == 11 and wt == 2:  # exemplars
            dp["exemplars"].append(_otlp_exemplar(v))
    return dp


def _summary_dp(buf: bytes) -> dict:
    dp = {"attrs": [], "t": 0, "st": None, "count": 0, "sum": 0.0,
          "quantiles": []}
    for fno, wt, v in _fields(buf):
        if fno == 7:
            dp["attrs"].append(v)
        elif fno == 2 and wt == 1:
            dp["st"] = _u64(v) // 1_000_000
        elif fno == 3 and wt == 1:
            dp["t"] = _u64(v) // 1_000_000
        elif fno == 4 and wt == 1:
            dp["count"] = _u64(v)
        elif fno == 5 and wt == 1:
            dp["sum"] = _f64(v)
        elif fno == 6 and wt == 2:  # ValueAtQuantile{1: q, 2: value}
            q = val = 0.0
            for qf, qwt, qv in _fields(v):
                if qf == 1 and qwt == 1:
                    q = _f64(qv)
                elif qf == 2 and qwt == 1:
                    val = _f64(qv)
            dp["quantiles"].append((q, val))
    return dp


def _exp_to_native(dp: dict) -> Optional[dict]:
    """Exponential datapoint → HISTOGRAM_TYPE dict (histograms.go:89)."""
    scale = dp["scale"]
    if scale < NATIVE_SCHEMA_MIN:
        return None  # reference rejects scale < -4
    scale_down = max(0, scale - NATIVE_SCHEMA_MAX)
    schema = min(scale, NATIVE_SCHEMA_MAX)
    pos_spans, pos_buckets = convert_buckets_layout(
        dp["pos_counts"], dp["pos_offset"], scale_down
    )
    neg_spans, neg_buckets = convert_buckets_layout(
        dp["neg_counts"], dp["neg_offset"], scale_down
    )
    return {
        "schema": schema,
        "zero_threshold": DEFAULT_ZERO_THRESHOLD,
        "zero_count": float(dp["zero_count"]),
        "count": float(dp["count"]),
        "sum": dp["sum"] if dp["sum"] is not None else 0.0,
        "pos_spans": pos_spans,
        "pos_buckets": pos_buckets,
        "neg_spans": neg_spans,
        "neg_buckets": neg_buckets,
        "custom_values": [],
        "counter_reset_hint": 0,
    }


# --------------------------------------------------------------------------
# request-level translation

_IDENTIFYING = ("service.name", "service.namespace", "service.instance.id")


def otlp_to_rows(
    body: bytes,
    emit_target_info: bool = True,
    with_exemplars: bool = False,
    promote_resource_attributes: list | None = None,
    promote_all_resource_attributes: bool = False,
    ignore_resource_attributes: list | None = None,
    keep_identifying_resource_attributes: bool = False,
    translation_strategy: str = "UnderscoreEscapingWithSuffixes",
    delta_state: "DeltaToCumulative | None" = None,
    native_delta: bool = False,
    enable_type_and_unit_labels: bool = False,
):
    """ExportMetricsServiceRequest → [(labels, t_ms, value_or_hist, st)].

    ``st`` is the datapoint start timestamp in ms (None when absent) —
    feeds the engine's created-timestamp handling.  With
    ``with_exemplars=True`` returns ``(rows, exemplars)`` — OTLP
    datapoint exemplars translated to trace_id/span_id-labelled
    prometheus exemplars (helper.go getPromExemplars), attached to the
    translated series (classic histograms: the ``_count`` series).

    The keyword knobs mirror the config's ``otlp:`` section
    (config.go OTLPConfig): promoted resource attributes become labels
    on every translated series (datapoint attributes win on collision),
    the ignore list removes attributes from promotion AND target_info,
    ``keep_identifying_resource_attributes`` copies service.* into
    target_info too, and ``translation_strategy`` selects the metric
    name normalization (see :func:`normalize_metric_name`).

    Delta temporality (write_otlp_handler.go:41-47 OTLPOptions):
    rejected (dropped) by default; ``delta_state`` opts into in-memory
    delta→cumulative conversion (ConvertDelta); ``native_delta`` opts
    into storing raw delta samples as-is (NativeDelta).  The two are
    mutually exclusive, as in the reference.
    """
    if native_delta and delta_state is not None:
        raise ValueError(
            "cannot enable native delta ingestion and delta2cumulative "
            "conversion at the same time"
        )
    promote = set(promote_resource_attributes or ())
    ignore = set(ignore_resource_attributes or ())
    rows: list = []
    exemplars: list = []

    def _take_exemplars(dp: dict, series_labels: dict) -> None:
        for ex in dp.get("exemplars", []):
            exemplars.append({"series_labels": dict(series_labels), **ex})
    for fno, _wt, rm in _fields(body):
        if fno != 1:  # resource_metrics
            continue
        resource_attrs: dict[str, str] = {}
        scope_bufs: list[bytes] = []
        for rf, _rwt, rv in _fields(rm):
            if rf == 1:  # Resource{1: repeated KeyValue}
                kvs = [v for f2, _w2, v in _fields(rv) if f2 == 1]
                resource_attrs = _keyvalues(kvs)
            elif rf == 2:
                scope_bufs.append(rv)
        base: dict[str, str] = {}
        # promoted resource attributes land on every series; job/instance
        # and datapoint attributes override on collision (helper.go
        # promoteResourceAttributes ordering)
        for k, v in resource_attrs.items():
            if k in ignore or k in _IDENTIFYING:
                continue
            if promote_all_resource_attributes or k in promote:
                base[_sanitize_label(k)] = v
        job = resource_attrs.get("service.name")
        if job is not None:
            ns = resource_attrs.get("service.namespace")
            base["job"] = f"{ns}/{job}" if ns else job
        inst = resource_attrs.get("service.instance.id")
        if inst is not None:
            base["instance"] = inst

        ts_seen: set[int] = set()
        for scope in scope_bufs:
            for sf, _swt, sv in _fields(scope):
                if sf != 2:  # metrics
                    continue
                name = unit = ""
                gauge_dps: list[bytes] = []
                sum_dps: list[bytes] = []
                hist_dps: list[bytes] = []
                exp_dps: list[bytes] = []
                summary_dps: list[bytes] = []
                monotonic = False
                temporality = _CUMULATIVE
                for mf, _mwt, mv in _fields(sv):
                    if mf == 1:
                        name = mv.decode()
                    elif mf == 3:
                        unit = mv.decode()
                    elif mf == 5:  # Gauge{1: dps}
                        gauge_dps += [
                            v for f, _w, v in _fields(mv) if f == 1
                        ]
                    elif mf == 7:  # Sum{1: dps, 2: temporality, 3: monotonic}
                        for f, w, v in _fields(mv):
                            if f == 1:
                                sum_dps.append(v)
                            elif f == 2 and w == 0:
                                temporality = v
                            elif f == 3 and w == 0:
                                monotonic = bool(v)
                    elif mf == 9:  # Histogram{1: dps, 2: temporality}
                        for f, w, v in _fields(mv):
                            if f == 1:
                                hist_dps.append(v)
                            elif f == 2 and w == 0:
                                temporality = v
                    elif mf == 10:  # ExponentialHistogram
                        for f, w, v in _fields(mv):
                            if f == 1:
                                exp_dps.append(v)
                            elif f == 2 and w == 0:
                                temporality = v
                    elif mf == 11:  # Summary{1: dps}
                        summary_dps += [
                            v for f, _w, v in _fields(mv) if f == 1
                        ]

                # current family's metadata for __type__/__unit__
                # (type-and-unit-labels also covers the OTLP path —
                # otlptranslator helper.go:165); branches set the type
                mt = {"type": ""}

                def lbls(dp: dict, mname: str, extra: dict = {}) -> dict:
                    out = dict(base)
                    for k, v in _keyvalues(dp["attrs"]).items():
                        out[_sanitize_label(k)] = v
                    out.update(extra)
                    out["__name__"] = mname
                    if enable_type_and_unit_labels:
                        if mt["type"] and mt["type"] != "unknown":
                            out["__type__"] = mt["type"]
                        uw = _unit_word(unit)
                        if uw:
                            out["__unit__"] = uw
                    return out

                if gauge_dps:
                    mt["type"] = "gauge"
                    mname = normalize_metric_name(name, unit, "gauge", strategy=translation_strategy)
                    for buf in gauge_dps:
                        dp = _number_dp(buf)
                        ts_seen.add(dp["t"])
                        rows.append((lbls(dp, mname), dp["t"],
                                     dp["value"], dp["st"]))
                        _take_exemplars(dp, lbls(dp, mname))
                convert = temporality == _DELTA and delta_state is not None
                accept_delta = temporality == _DELTA and (
                    native_delta or convert
                )
                if sum_dps and (temporality == _CUMULATIVE or accept_delta):
                    # native delta stores with unknown type (main.go
                    # otlp-native-delta-ingestion comment)
                    mt["type"] = (
                        "unknown"
                        if temporality == _DELTA and native_delta
                        else ("counter" if monotonic else "gauge")
                    )
                    mname = normalize_metric_name(
                        name, unit, "sum", monotonic=monotonic,
                        strategy=translation_strategy,
                    )
                    dps = [_number_dp(buf) for buf in sum_dps]
                    if convert:
                        # the processor requires per-series time order
                        dps.sort(key=lambda d: d["t"])
                    for dp in dps:
                        slabels = lbls(dp, mname)
                        v, st = dp["value"], dp["st"]
                        if convert:
                            acc = delta_state.add_number(
                                tuple(sorted(slabels.items())),
                                dp["t"], v, st,
                            )
                            if acc is None:
                                continue
                            v, st = acc
                        ts_seen.add(dp["t"])
                        rows.append((slabels, dp["t"], v, st))
                        _take_exemplars(dp, slabels)
                if hist_dps and (temporality == _CUMULATIVE or accept_delta):
                    mt["type"] = "histogram"
                    mname = normalize_metric_name(name, unit, "histogram", strategy=translation_strategy)
                    hdps = [_hist_dp(buf) for buf in hist_dps]
                    if convert:
                        hdps.sort(key=lambda d: d["t"])
                    for dp in hdps:
                        st = dp["st"]
                        if convert:
                            acc = delta_state.add_classic(
                                tuple(sorted(lbls(dp, mname).items())),
                                dp["t"], dp, st,
                            )
                            if acc is None:
                                continue
                            dp = dict(
                                dp,
                                count=acc[0], sum=acc[1], bucket_counts=acc[2],
                            )
                            st = acc[3]
                        ts_seen.add(dp["t"])
                        rows.append((lbls(dp, mname + "_count"), dp["t"],
                                     float(dp["count"]), st))
                        _take_exemplars(dp, lbls(dp, mname + "_count"))
                        if dp["sum"] is not None:
                            rows.append((lbls(dp, mname + "_sum"), dp["t"],
                                         dp["sum"], st))
                        cum = 0.0
                        for i, bc in enumerate(dp["bucket_counts"]):
                            cum += bc
                            ub = (
                                dp["bounds"][i]
                                if i < len(dp["bounds"])
                                else math.inf
                            )
                            rows.append((
                                lbls(dp, mname + "_bucket",
                                     {"le": _gofmt(ub)}),
                                dp["t"], cum, st,
                            ))
                        if len(dp["bucket_counts"]) <= len(dp["bounds"]):
                            rows.append((
                                lbls(dp, mname + "_bucket", {"le": "+Inf"}),
                                dp["t"], float(dp["count"]), st,
                            ))
                if exp_dps and (temporality == _CUMULATIVE or accept_delta):
                    mt["type"] = "histogram"
                    mname = normalize_metric_name(name, unit, "histogram", strategy=translation_strategy)
                    edps = [_exp_hist_dp(buf) for buf in exp_dps]
                    if convert:
                        edps.sort(key=lambda d: d["t"])
                    for dp in edps:
                        h = _exp_to_native(dp)
                        if h is None:
                            continue
                        st = dp["st"]
                        if convert:
                            acc = delta_state.add_native(
                                tuple(sorted(lbls(dp, mname).items())),
                                dp["t"], h, st,
                            )
                            if acc is None:
                                continue
                            h, st = acc
                        ts_seen.add(dp["t"])
                        rows.append((lbls(dp, mname), dp["t"], h, st))
                        _take_exemplars(dp, lbls(dp, mname))
                if summary_dps:
                    mt["type"] = "summary"
                    mname = normalize_metric_name(name, unit, "summary", strategy=translation_strategy)
                    for buf in summary_dps:
                        dp = _summary_dp(buf)
                        ts_seen.add(dp["t"])
                        st = dp["st"]
                        rows.append((lbls(dp, mname + "_count"), dp["t"],
                                     float(dp["count"]), st))
                        rows.append((lbls(dp, mname + "_sum"), dp["t"],
                                     dp["sum"], st))
                        for q, val in dp["quantiles"]:
                            rows.append((
                                lbls(dp, mname, {"quantile": _gofmt(q)}),
                                dp["t"], val, st,
                            ))

        extra_attrs = {
            _sanitize_label(k): v
            for k, v in resource_attrs.items()
            if (keep_identifying_resource_attributes or k not in _IDENTIFYING)
            and k not in ignore
        }
        if emit_target_info and extra_attrs and base and ts_seen:
            for t in sorted(ts_seen):
                rows.append((
                    {**base, **extra_attrs, "__name__": "target_info"},
                    t, 1.0, None,
                ))
    if with_exemplars:
        return rows, exemplars
    return rows


class OTLPReceiver:
    """Minimal OTLP/HTTP metrics endpoint: POST /v1/metrics bodies are
    translated and appended as JSON-lines into a spool directory shared
    with the remote-write receiver (same readStream pickup)."""

    def __init__(
        self,
        spool_dir: str,
        otlp_config: dict | None = None,
        convert_delta: bool = False,
        native_delta: bool = False,
        enable_type_and_unit_labels: bool = False,
    ):
        import os

        self.spool_dir = spool_dir
        self.exemplar_dir = os.path.join(spool_dir, "_exemplars")
        os.makedirs(spool_dir, exist_ok=True)
        os.makedirs(self.exemplar_dir, exist_ok=True)
        self._n = 0
        # the config's otlp: section (config.go OTLPConfig), applied to
        # every translated request
        self.otlp_config = dict(otlp_config or {})
        # feature flags otlp-deltatocumulative / otlp-native-delta-ingestion
        # (write_otlp_handler.go:58-61 — mutually exclusive)
        if convert_delta and native_delta:
            raise ValueError(
                "cannot enable native delta ingestion and delta2cumulative "
                "conversion at the same time"
            )
        self.native_delta = native_delta
        self.delta_state = DeltaToCumulative() if convert_delta else None
        self.enable_type_and_unit_labels = enable_type_and_unit_labels

    def handle_body(self, body: bytes) -> int:
        import json
        import os

        oc = self.otlp_config
        rows, exemplars = otlp_to_rows(
            body,
            with_exemplars=True,
            promote_resource_attributes=oc.get("promote_resource_attributes"),
            promote_all_resource_attributes=bool(
                oc.get("promote_all_resource_attributes", False)
            ),
            ignore_resource_attributes=oc.get("ignore_resource_attributes"),
            keep_identifying_resource_attributes=bool(
                oc.get("keep_identifying_resource_attributes", False)
            ),
            translation_strategy=oc.get(
                "translation_strategy", "UnderscoreEscapingWithSuffixes"
            ),
            delta_state=self.delta_state,
            native_delta=self.native_delta,
            enable_type_and_unit_labels=self.enable_type_and_unit_labels,
        )
        self._n += 1
        path = os.path.join(
            self.spool_dir, f"otlp_{os.getpid()}_{self._n:08d}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for labels, t, v, st in rows:
                rec = {"labels": labels, "t": t}
                if isinstance(v, dict):
                    rec["hist"] = v
                else:
                    rec["value"] = v
                if st is not None:
                    rec["st"] = st
                f.write(json.dumps(rec) + "\n")
        os.replace(tmp, path)
        if exemplars:
            ex_path = os.path.join(
                self.exemplar_dir, f"ex_{os.getpid()}_{self._n:08d}.json"
            )
            tmp = ex_path + ".tmp"
            with open(tmp, "w") as f:
                for ex in exemplars:
                    f.write(json.dumps(ex) + "\n")
            os.replace(tmp, ex_path)
        return len(rows)

    def exemplars_df(self, spark):
        """The exemplar spool as the canonical exemplar frame."""
        import glob as _glob
        import json

        from prometheus_spark.storage.exemplars import exemplars_from_rows

        out = []
        for path in sorted(_glob.glob(f"{self.exemplar_dir}/*.json")):
            with open(path) as f:
                for line in f:
                    ex = json.loads(line)
                    out.append(
                        (ex["series_labels"], ex["t"], ex["labels"],
                         ex["value"], ex["t"])
                    )
        return exemplars_from_rows(spark, out)

    def server(self, host: str = "127.0.0.1", port: int = 0):
        import http.server
        import socketserver

        recv = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — stdlib naming
                if self.path not in ("/v1/metrics", "/otlp/v1/metrics"):
                    self.send_error(404)
                    return
                ln = int(self.headers.get("Content-Length", 0))
                try:
                    recv.handle_body(self.rfile.read(ln))
                except Exception as e:  # noqa: BLE001 — surface as 400
                    self.send_error(400, str(e)[:200])
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/x-protobuf")
                self.end_headers()
                self.wfile.write(b"")

            def log_message(self, *a):
                pass

        class Server(socketserver.ThreadingMixIn, http.server.HTTPServer):
            daemon_threads = True

        return Server((host, port), Handler)
