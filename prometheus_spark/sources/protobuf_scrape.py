"""Prometheus protobuf exposition format parser (ingest boundary).

Reference: model/textparse/protobufparse.go — scrape bodies with
``Content-Type: application/vnd.google.protobuf;
proto=io.prometheus.client.MetricFamily; encoding=delimited`` are a
stream of varint-length-delimited ``MetricFamily`` messages
(schema: prompb/io/prometheus/client/metrics.proto, a public protocol).

The wire decoding reuses the pure-Python protobuf codec from
``remote_write.py`` (varint / length-delimited / fixed64 — public
encoding spec, no generated code).  Semantics mirrored from the
reference parser:

- COUNTER / GAUGE / UNTYPED → one sample under the family name
  (protobufparse.go:297-307); counter ``start_timestamp`` (field 3)
  surfaces as the created timestamp (``created_t``)
- SUMMARY → ``name_count`` / ``name_sum`` / ``name{quantile="φ"}``
  (the magic-suffix scheme, protobufparse.go:653-668)
- HISTOGRAM / GAUGE_HISTOGRAM: a message carrying native fields
  (schema/zero/spans/deltas/counts) yields ONE native-histogram sample
  under the family name; otherwise the classic ``_count``/``_sum``/
  ``_bucket{le=...}`` series are emitted, with the implicit ``+Inf``
  bucket synthesized when absent (protobufparse.go:341-370).  With
  ``parse_classic_histograms`` both representations are emitted, like
  the reference's ``parseClassicHistograms`` knob.

Spark entry point ``parse_protobuf_df`` is an Arrow-batched
``mapInPandas`` over binary scrape bodies — decode runs once per
scraped byte at the ingest boundary, never per query.  Histograms ride
to the JVM as JSON and become the canonical ``HISTOGRAM_TYPE`` struct
via ``from_json`` (Arrow can't ship arbitrary structs from pandas).
"""

from __future__ import annotations

import json
import math
import struct
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from prometheus_spark.sources.remote_write import (
    _fields,
    _packed_doubles,
    _read_varint,
    _zigzag_dec,
)

# MetricType enum (metrics.proto:33-45)
COUNTER, GAUGE, SUMMARY, UNTYPED, HISTOGRAM, GAUGE_HISTOGRAM = range(6)


def _gofmt(v: float) -> str:
    """Go strconv.FormatFloat(v,'g',-1,64) for label values (le/quantile)."""
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if math.isnan(v):
        return "NaN"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _ts_ms(buf: bytes) -> int:
    """google.protobuf.Timestamp{1: seconds, 2: nanos} → epoch ms."""
    sec = nanos = 0
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            sec = v if v < (1 << 63) else v - (1 << 64)
        elif fno == 2:
            nanos = v
    return sec * 1000 + nanos // 1_000_000


def _f64(v: bytes) -> float:
    return struct.unpack("<d", v)[0]


def _packed_sint64(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        n, pos = _read_varint(buf, pos)
        out.append(_zigzag_dec(n))
    return out


def _decode_label_pair(buf: bytes) -> tuple[str, str]:
    name = value = ""
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            name = v.decode()
        elif fno == 2:
            value = v.decode()
    return name, value


def _decode_span(buf: bytes) -> dict:
    span = {"offset": 0, "length": 0}
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            span["offset"] = _zigzag_dec(v)
        elif fno == 2:
            span["length"] = v
    return span


def _decode_client_histogram(buf: bytes) -> dict:
    """io.prometheus.client.Histogram (metrics.proto:75-117)."""
    h = {
        "count": 0.0, "count_float": None, "sum": 0.0,
        "buckets": [],  # classic: [(upper_bound, cumulative_count)]
        "schema": None, "zero_threshold": 0.0, "zero_count": 0.0,
        "neg_spans": [], "neg_deltas": [], "neg_counts": [],
        "pos_spans": [], "pos_deltas": [], "pos_counts": [],
        "created_ms": None,
    }
    for fno, wt, v in _fields(buf):
        if fno == 1:
            h["count"] = float(v)
        elif fno == 4 and wt == 1:
            h["count_float"] = _f64(v)
        elif fno == 2:
            h["sum"] = _f64(v)
        elif fno == 3:  # Bucket
            ub = math.inf
            cc = 0.0
            for bf, bwt, bv in _fields(v):
                if bf == 1:
                    cc = float(bv)
                elif bf == 4 and bwt == 1:
                    cc = _f64(bv)
                elif bf == 2:
                    ub = _f64(bv)
            h["buckets"].append((ub, cc))
        elif fno == 15:
            h["created_ms"] = _ts_ms(v)
        elif fno == 5:
            h["schema"] = _zigzag_dec(v)
        elif fno == 6:
            h["zero_threshold"] = _f64(v)
        elif fno == 7:
            h["zero_count"] = float(v)
        elif fno == 8 and wt == 1:
            h["zero_count"] = _f64(v)
        elif fno == 9:
            h["neg_spans"].append(_decode_span(v))
        elif fno == 10:
            h["neg_deltas"] = _packed_sint64(v)
        elif fno == 11:
            h["neg_counts"] = _packed_doubles(v)
        elif fno == 12:
            h["pos_spans"].append(_decode_span(v))
        elif fno == 13:
            h["pos_deltas"] = _packed_sint64(v)
        elif fno == 14:
            h["pos_counts"] = _packed_doubles(v)
    return h


def _is_native(h: dict) -> bool:
    """A client histogram is native iff it carries sparse-bucket fields
    (protobufparse.go native/classic dispatch)."""
    return bool(
        h["schema"] is not None
        or h["zero_threshold"]
        or h["zero_count"]
        or h["pos_spans"] or h["neg_spans"]
        or h["pos_deltas"] or h["neg_deltas"]
        or h["pos_counts"] or h["neg_counts"]
    )


def _native_struct(h: dict, gauge: bool) -> dict:
    """client Histogram → canonical HISTOGRAM_TYPE dict (absolute
    float buckets; integer deltas are cumulated, mirroring
    FloatHistogram conversion in model/histogram/histogram.go:334)."""

    def absolute(deltas: list[int], counts: list[float]) -> list[float]:
        if counts:
            return [float(c) for c in counts]
        out, cur = [], 0
        for d in deltas:
            cur += d
            out.append(float(cur))
        return out

    count = h["count_float"] if h["count_float"] is not None else h["count"]
    return {
        "schema": h["schema"] or 0,
        "zero_threshold": h["zero_threshold"],
        "zero_count": h["zero_count"],
        "count": float(count),
        "sum": h["sum"],
        "pos_spans": h["pos_spans"],
        "pos_buckets": absolute(h["pos_deltas"], h["pos_counts"]),
        "neg_spans": h["neg_spans"],
        "neg_buckets": absolute(h["neg_deltas"], h["neg_counts"]),
        "custom_values": [],
        # 3 = GaugeType (model/histogram/histogram.go:26-34)
        "counter_reset_hint": 3 if gauge else 0,
    }


def parse_protobuf_scrape(
    data: bytes,
    default_ts_ms: int = 0,
    parse_classic_histograms: bool = False,
):
    """Decode a delimited MetricFamily stream.

    Returns ``(rows, metadata)``:

    - rows: [(labels incl __name__, t_ms, value_or_hist_dict, created_ms)]
    - metadata: {family_name: {"type": str, "help": str, "unit": str}}
    """
    rows: list = []
    metadata: dict[str, dict] = {}
    pos = 0
    n = len(data)
    while pos < n:
        ln, pos = _read_varint(data, pos)
        fam = data[pos : pos + ln]
        pos += ln
        name, help_, unit = "", "", ""
        mtype = UNTYPED
        metrics: list[bytes] = []
        for fno, _wt, v in _fields(fam):
            if fno == 1:
                name = v.decode()
            elif fno == 2:
                help_ = v.decode()
            elif fno == 3:
                mtype = v
            elif fno == 4:
                metrics.append(v)
            elif fno == 5:
                unit = v.decode()
        type_str = {
            COUNTER: "counter", GAUGE: "gauge", SUMMARY: "summary",
            UNTYPED: "unknown", HISTOGRAM: "histogram",
            GAUGE_HISTOGRAM: "gaugehistogram",
        }[mtype]
        metadata[name] = {"type": type_str, "help": help_, "unit": unit}

        for mbuf in metrics:
            labels: dict[str, str] = {}
            t_ms = default_ts_ms
            simple_value: Optional[float] = None
            created_ms: Optional[int] = None
            summary = None
            hist = None
            for fno, wt, v in _fields(mbuf):
                if fno == 1:
                    k, lv = _decode_label_pair(v)
                    labels[k] = lv
                elif fno == 6 and wt == 0:
                    t_ms = v if v < (1 << 63) else v - (1 << 64)
                elif fno in (2, 5):  # Gauge / Untyped {1: double value}
                    for gf, gwt, gv in _fields(v):
                        if gf == 1 and gwt == 1:
                            simple_value = _f64(gv)
                elif fno == 3:  # Counter {1: value, 3: start_timestamp}
                    for cf, cwt, cv in _fields(v):
                        if cf == 1 and cwt == 1:
                            simple_value = _f64(cv)
                        elif cf == 3 and cwt == 2:
                            created_ms = _ts_ms(cv)
                elif fno == 4:  # Summary
                    summary = {"count": 0.0, "sum": 0.0, "quantiles": [],
                               "created_ms": None}
                    for sf, swt, sv in _fields(v):
                        if sf == 1:
                            summary["count"] = float(sv)
                        elif sf == 2 and swt == 1:
                            summary["sum"] = _f64(sv)
                        elif sf == 3:
                            q = val = 0.0
                            for qf, qwt, qv in _fields(sv):
                                if qf == 1 and qwt == 1:
                                    q = _f64(qv)
                                elif qf == 2 and qwt == 1:
                                    val = _f64(qv)
                            summary["quantiles"].append((q, val))
                        elif sf == 4 and swt == 2:
                            summary["created_ms"] = _ts_ms(sv)
                elif fno == 7:  # Histogram
                    hist = _decode_client_histogram(v)

            base = dict(labels)
            if mtype in (COUNTER, GAUGE, UNTYPED) and simple_value is not None:
                rows.append(
                    ({**base, "__name__": name}, t_ms, simple_value, created_ms)
                )
            elif mtype == SUMMARY and summary is not None:
                c = summary["created_ms"]
                rows.append(
                    ({**base, "__name__": name + "_count"}, t_ms,
                     summary["count"], c)
                )
                rows.append(
                    ({**base, "__name__": name + "_sum"}, t_ms,
                     summary["sum"], c)
                )
                for q, val in summary["quantiles"]:
                    rows.append(
                        ({**base, "__name__": name, "quantile": _gofmt(q)},
                         t_ms, val, c)
                    )
            elif mtype in (HISTOGRAM, GAUGE_HISTOGRAM) and hist is not None:
                native = _is_native(hist)
                c = hist["created_ms"]
                if native:
                    rows.append(
                        ({**base, "__name__": name}, t_ms,
                         _native_struct(hist, mtype == GAUGE_HISTOGRAM), c)
                    )
                if not native or parse_classic_histograms:
                    count = (
                        hist["count_float"]
                        if hist["count_float"] is not None
                        else hist["count"]
                    )
                    rows.append(
                        ({**base, "__name__": name + "_count"}, t_ms,
                         float(count), c)
                    )
                    rows.append(
                        ({**base, "__name__": name + "_sum"}, t_ms,
                         hist["sum"], c)
                    )
                    saw_inf = False
                    for ub, cc in hist["buckets"]:
                        saw_inf = saw_inf or math.isinf(ub)
                        rows.append(
                            ({**base, "__name__": name + "_bucket",
                              "le": _gofmt(ub)}, t_ms, cc, c)
                        )
                    if not saw_inf:  # implicit +Inf = count
                        rows.append(
                            ({**base, "__name__": name + "_bucket",
                              "le": "+Inf"}, t_ms, float(count), c)
                        )
    return rows, metadata


PARSED_PB_SCHEMA = T.StructType(
    [
        T.StructField("label_keys", T.ArrayType(T.StringType()), False),
        T.StructField("label_values", T.ArrayType(T.StringType()), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("hist_json", T.StringType(), True),
        T.StructField("created_t", T.LongType(), True),
    ]
)


def parse_protobuf_df(
    bodies: DataFrame,
    body_col: str = "body",
    ts_col: Optional[str] = None,
    parse_classic_histograms: bool = False,
) -> DataFrame:
    """Binary scrape-body DataFrame → parsed samples.

    Output: (label arrays, t, value, hist struct, created_t).  Works on
    batch and ``readStream`` frames alike.
    """
    import pandas as pd

    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(bodies.sparkSession)
    cols = [body_col] + ([ts_col] if ts_col else [])
    src = bodies.select(*cols)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {k: [] for k in
                   ("label_keys", "label_values", "t", "value",
                    "hist_json", "created_t")}
            for i, body in enumerate(pdf[body_col]):
                default_ts = int(pdf[ts_col].iloc[i]) if ts_col else 0
                rows, _meta = parse_protobuf_scrape(
                    bytes(body), default_ts,
                    parse_classic_histograms=parse_classic_histograms,
                )
                for labels, t, v, created in rows:
                    out["label_keys"].append(list(labels.keys()))
                    out["label_values"].append(list(labels.values()))
                    out["t"].append(t)
                    if isinstance(v, dict):
                        out["value"].append(None)
                        out["hist_json"].append(json.dumps(v))
                    else:
                        out["value"].append(v)
                        out["hist_json"].append(None)
                    out["created_t"].append(created)
            yield pd.DataFrame(
                {
                    "label_keys": pd.Series(out["label_keys"], dtype=object),
                    "label_values": pd.Series(out["label_values"], dtype=object),
                    "t": pd.Series(out["t"], dtype="int64"),
                    "value": pd.Series(out["value"], dtype="float64"),
                    "hist_json": pd.Series(out["hist_json"], dtype=object),
                    "created_t": pd.Series(out["created_t"], dtype=object),
                }
            )

    return src.mapInPandas(batches, PARSED_PB_SCHEMA)


def to_samples(parsed: DataFrame) -> DataFrame:
    """Parsed protobuf rows → canonical samples layout (sig/name/labels/
    t/value/hist/stale [+ st when any created timestamps are present])."""
    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import sig_expr
    from prometheus_spark.model.schema import HISTOGRAM_TYPE, METRIC_NAME_LABEL

    labels = F.map_from_arrays("label_keys", "label_values")
    return parsed.select(
        sig_expr(labels).alias("sig"),
        F.element_at(labels, F.lit(METRIC_NAME_LABEL)).alias("name"),
        labels.alias("labels"),
        "t",
        "value",
        F.from_json("hist_json", HISTOGRAM_TYPE).alias("hist"),
        F.lit(False).alias("stale"),
        F.col("created_t").alias("st"),
    )
