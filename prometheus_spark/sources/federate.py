"""Federation: expose the current state of selected series as
Prometheus text exposition lines.

Reference: web/federate.go:55 — for each ``match[]`` selector, emit the
latest sample per series within the lookback window, labels sorted, one
``name{labels} value timestamp_ms`` line per series.

Spark-first: the "latest sample per series" is ``max_by`` over the
lookback-filtered frame (one shuffle on sig), and the line rendering is
pure string expressions — the result is a DataFrame of lines, so a 100M-
series federation never materializes on the driver; stream it to the
HTTP response partition by partition."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prometheus_spark.model.schema import METRIC_NAME_LABEL


def _escape(col):
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\"'),
        "\n",
        r"\n",
    )


def federate(
    samples: DataFrame,
    matchers: Sequence[dict[str, str]],
    now_ms: int,
    lookback_ms: int = 300_000,
) -> DataFrame:
    """Latest-sample-per-series exposition lines for the union of the
    given equality matcher sets (each dict = one ``match[]`` selector).

    Returns a one-column (``line``) DataFrame ordered by metric name."""
    window = samples.filter(
        (F.col("t") > now_ms - lookback_ms)
        & (F.col("t") <= now_ms)
        & (~F.col("stale"))
        & F.col("value").isNotNull()
    )
    if matchers:
        conds = None
        for mset in matchers:
            c = F.lit(True)
            for k, v in mset.items():
                if k == METRIC_NAME_LABEL:
                    c = c & (F.col("name") == v)
                else:
                    c = c & (F.element_at("labels", k) == v)
            conds = c if conds is None else (conds | c)
        window = window.filter(conds)
    latest = window.groupBy("sig").agg(
        F.max_by(F.struct("t", "value", "name", "labels"), "t").alias("s")
    )
    entries = F.array_sort(
        F.map_entries(F.map_filter(F.col("s.labels"), lambda k, _: k != F.lit(METRIC_NAME_LABEL)))
    )
    label_blob = F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(e["key"], F.lit('="'), _escape(e["value"]), F.lit('"')),
        ),
        ",",
    )
    line = F.concat(
        F.col("s.name"),
        F.when(F.size(entries) > 0, F.concat(F.lit("{"), label_blob, F.lit("}"))).otherwise(F.lit("")),
        F.lit(" "),
        F.col("s.value").cast("string"),
        F.lit(" "),
        F.col("s.t").cast("string"),
    )
    return latest.select(F.col("s.name").alias("__n"), line.alias("line")).orderBy(
        "__n", "line"
    ).select("line")


# --- protobuf federation (negotiated format, native histograms) -----------
#
# The reference serves native histograms over /federate ONLY when the
# client negotiates a protobuf format (web/federate.go:190-200 —
# "Can't serve a native histogram with a non-protobuf format" → skipped
# for text).  This half mirrors that: varint-delimited
# io.prometheus.client.MetricFamily messages, float samples as UNTYPED,
# native histograms as HISTOGRAM / GAUGE_HISTOGRAM with float bucket
# counts — the exact layout sources/protobuf_scrape.py parses, so the
# two round-trip.  The encode runs driver-side at the HTTP-response
# boundary (federation output is selector-bounded, the same stance as
# the JSON serialization in web/api.py).

_MT_UNTYPED, _MT_HISTOGRAM, _MT_GAUGE_HISTOGRAM = 3, 4, 5
_GAUGE_HINT = 3  # model counter_reset_hint GaugeType


def _pb_vint(tag: int, v: int) -> bytes:
    out = bytearray([tag << 3])
    v &= (1 << 64) - 1
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _pb_ld(tag: int, b: bytes) -> bytes:
    out = bytearray([(tag << 3) | 2])
    v = len(b)
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out) + b


def _pb_f64(tag: int, v: float) -> bytes:
    import struct as _struct

    return bytes([(tag << 3) | 1]) + _struct.pack("<d", float(v))


def _pb_uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _encode_client_histogram(h) -> bytes:
    """Canonical hist struct → io.prometheus.client.Histogram with the
    float-histogram fields (count_float=4, zero_count_float=8, packed
    double bucket counts 11/14; metrics.proto:75-117)."""
    def zz(v: int) -> int:
        return (v << 1) ^ (v >> 63)

    import struct as _struct

    out = bytearray()
    out += _pb_f64(4, h["count"])
    out += _pb_f64(2, h["sum"])
    out += _pb_vint(5, zz(int(h["schema"])))
    out += _pb_f64(6, h["zero_threshold"])
    out += _pb_f64(8, h["zero_count"])
    for fno, spans in ((9, h["neg_spans"]), (12, h["pos_spans"])):
        for s in spans or []:
            out += _pb_ld(
                fno, _pb_vint(1, zz(int(s["offset"]))) + _pb_vint(2, int(s["length"]))
            )
    for fno, counts in ((11, h["neg_buckets"]), (14, h["pos_buckets"])):
        if counts:
            out += _pb_ld(
                fno, b"".join(_struct.pack("<d", float(c)) for c in counts)
            )
    return bytes(out)


def federate_protobuf(
    samples: DataFrame,
    matchers: Sequence[dict[str, str]],
    now_ms: int,
    lookback_ms: int = 300_000,
) -> bytes:
    """Varint-delimited MetricFamily stream for the given selectors —
    floats AND native histograms (federate.go protobuf negotiation)."""
    window = samples.filter(
        (F.col("t") > now_ms - lookback_ms)
        & (F.col("t") <= now_ms)
        & (~F.col("stale"))
        & (F.col("value").isNotNull() | F.col("hist").isNotNull())
    )
    if matchers:
        conds = None
        for mset in matchers:
            c = F.lit(True)
            for k, v in mset.items():
                if k == METRIC_NAME_LABEL:
                    c = c & (F.col("name") == v)
                else:
                    c = c & (F.element_at("labels", k) == v)
            conds = c if conds is None else (conds | c)
        window = window.filter(conds)
    latest = (
        window.groupBy("sig")
        .agg(F.max_by(F.struct("t", "value", "hist", "name", "labels"), "t").alias("s"))
        .select("s.*")
        .orderBy("name", "sig")
    )
    rows = latest.collect()  # HTTP-response boundary, selector-bounded

    # one MetricFamily per (name, float/hist/gauge-hist kind) run, in
    # name order (federate.go:185-240 family-break rules)
    out = bytearray()
    fam_name = None
    fam_type = None
    fam_metrics: list[bytes] = []

    def flush():
        if fam_name is None or not fam_metrics:
            return
        body = _pb_ld(1, fam_name.encode()) + _pb_vint(3, fam_type)
        for m in fam_metrics:
            body += _pb_ld(4, m)
        out.extend(_pb_uvarint(len(body)) + body)

    for r in rows:
        hist = r["hist"]
        if hist is not None:
            h = hist.asDict(recursive=True)
            mtype = (
                _MT_GAUGE_HISTOGRAM
                if int(h.get("counter_reset_hint") or 0) == _GAUGE_HINT
                else _MT_HISTOGRAM
            )
        else:
            mtype = _MT_UNTYPED
        if r["name"] != fam_name or mtype != fam_type:
            flush()
            fam_name, fam_type = r["name"], mtype
            fam_metrics = []
        metric = bytearray()
        for k in sorted(r["labels"]):
            if k == METRIC_NAME_LABEL:
                continue
            metric += _pb_ld(
                1, _pb_ld(1, k.encode()) + _pb_ld(2, r["labels"][k].encode())
            )
        if hist is not None:
            metric += _pb_ld(7, _encode_client_histogram(h))
        else:
            metric += _pb_ld(5, _pb_f64(1, r["value"]))  # Untyped{value=1}
        metric += _pb_vint(6, int(r["t"]))
        fam_metrics.append(bytes(metric))
    flush()
    return bytes(out)
