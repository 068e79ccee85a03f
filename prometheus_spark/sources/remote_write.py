"""Remote-write receiver/sender (prompb WriteRequest over snappy+HTTP).

Reference surface: web/api/v1/api.go:483 (receiver) and
storage/remote/queue_manager.go (sender); wire schema prompb/remote.proto
+ prompb/types.proto (public protocol).  Both the protobuf wire format
and the snappy framing are implemented here in pure Python from the
public specs — no generated code, no external deps:

- protobuf: only the message shapes remote-write uses —
  WriteRequest{1: repeated TimeSeries}, TimeSeries{1: labels, 2: samples,
  4: histograms}, Label{1: name, 2: value}, Sample{1: double value,
  2: int64 ts}, Histogram{2: count_float, 3: sum, 4: sint32 schema,
  5: zero_threshold, 7: zero_count_float, 8/10: neg spans/counts,
  11/13: pos spans/counts, 15: ts, 16: custom_values}
- snappy block format: full decoder (literals + all three copy tags);
  the encoder emits literal-only blocks, which is valid snappy — any
  decoder accepts it (compression ratio 1, fine for tests and
  correctness; swap in a native codec for production throughput)

Ingest stays Spark-shaped: the receiver appends decoded rows to a spool
directory that a ``readStream`` (or batch ``read``) picks up — the
decode runs per-request at the HTTP boundary, never per-query.
"""

from __future__ import annotations

import struct
from typing import Iterable, Optional

# --------------------------------------------------------------------------
# protobuf wire codec (varint + length-delimited + fixed64)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_dec(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _zigzag_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _fields(buf: bytes):
    """Iterate (field_no, wire_type, value) over a protobuf message body.
    Length-delimited values come back as bytes; varints as int; fixed64
    as raw 8 bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, pos = _read_varint(buf, pos)
        elif wt == 1:  # fixed64
            v = buf[pos : pos + 8]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            v = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _ld(fno: int, payload: bytes) -> bytes:
    return _write_varint(fno << 3 | 2) + _write_varint(len(payload)) + payload


def _f64(fno: int, value: float) -> bytes:
    return _write_varint(fno << 3 | 1) + struct.pack("<d", value)


def _vint(fno: int, value: int) -> bytes:
    return _write_varint(fno << 3) + _write_varint(value)


def _packed_doubles(buf: bytes) -> list[float]:
    return [x[0] for x in struct.iter_unpack("<d", buf)]


# --------------------------------------------------------------------------
# snappy block format (no framing): full decoder, literal-only encoder


def snappy_decode(data: bytes) -> bytes:
    ulen, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = int.from_bytes(data[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0:
            raise ValueError("invalid snappy copy offset 0")
        start = len(out) - off
        for i in range(ln):  # may overlap — byte-at-a-time is the spec
            out.append(out[start + i])
    if len(out) != ulen:
        raise ValueError(f"snappy length mismatch: {len(out)} != {ulen}")
    return bytes(out)


def snappy_encode(data: bytes) -> bytes:
    """Literal-only snappy encoding — spec-valid, ratio 1."""
    out = bytearray(_write_varint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nbytes = (ln.bit_length() + 7) // 8
            out.append((59 + nbytes) << 2)
            out += ln.to_bytes(nbytes, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


# --------------------------------------------------------------------------
# WriteRequest encode/decode


def _decode_hist(buf: bytes) -> dict:
    h = {
        "schema": 0, "zero_threshold": 0.0, "zero_count": 0.0, "count": 0.0,
        "sum": 0.0, "pos_spans": [], "pos_buckets": [], "neg_spans": [],
        "neg_buckets": [], "custom_values": [], "counter_reset_hint": 0,
    }
    t = 0
    for fno, wt, v in _fields(buf):
        if fno == 2 and wt == 1:
            h["count"] = struct.unpack("<d", v)[0]
        elif fno == 1 and wt == 0:
            h["count"] = float(v)
        elif fno == 3:
            h["sum"] = struct.unpack("<d", v)[0]
        elif fno == 4:
            h["schema"] = _zigzag_dec(v)
        elif fno == 5:
            h["zero_threshold"] = struct.unpack("<d", v)[0]
        elif fno == 7 and wt == 1:
            h["zero_count"] = struct.unpack("<d", v)[0]
        elif fno == 6 and wt == 0:
            h["zero_count"] = float(v)
        elif fno in (8, 11):
            span = {"offset": 0, "length": 0}
            for sf, _swt, sv in _fields(v):
                if sf == 1:
                    span["offset"] = _zigzag_dec(sv)
                elif sf == 2:
                    span["length"] = sv
            (h["neg_spans"] if fno == 8 else h["pos_spans"]).append(span)
        elif fno == 10:
            h["neg_buckets"] = _packed_doubles(v)
        elif fno == 13:
            h["pos_buckets"] = _packed_doubles(v)
        elif fno in (9, 12) and wt == 2:
            # integer-histogram deltas (packed sint64): absolute count of
            # bucket i = prefix sum of deltas (types.proto 209-215)
            deltas = [_zigzag_dec(d) for d in _read_packed_varints(v)]
            counts: list[float] = []
            acc = 0
            for d in deltas:
                acc += d
                counts.append(float(acc))
            h["neg_buckets" if fno == 9 else "pos_buckets"] = counts
        elif fno == 15:
            t = v
        elif fno == 16:
            h["custom_values"] = _packed_doubles(v)
        elif fno == 14:
            h["counter_reset_hint"] = v
    return {"t": t, "hist": h}


def _encode_hist(h: dict, t_ms: int) -> bytes:
    """prompb Histogram (types.proto:160-230) for a FLOAT histogram —
    the engine's canonical ``hist`` struct: count_float=2, sum=3,
    schema=4 (sint), zero_threshold=5, zero_count_float=7,
    negative_spans=8 / negative_counts=10, positive_spans=11 /
    positive_counts=13, reset_hint=14, timestamp=15, custom_values=16.
    Mirror of :func:`_decode_hist` (the two round-trip in tests)."""
    out = bytearray()
    out += _f64(2, float(h.get("count", 0.0)))
    out += _f64(3, float(h.get("sum", 0.0)))
    out += _vint(4, _zigzag_enc(int(h.get("schema", 0))))
    out += _f64(5, float(h.get("zero_threshold", 0.0)))
    out += _f64(7, float(h.get("zero_count", 0.0)))

    def spans(fno: int, items) -> bytes:
        b = bytearray()
        for s in items or []:
            b += _ld(
                fno,
                _vint(1, _zigzag_enc(int(s.get("offset", 0))))
                + _vint(2, int(s.get("length", 0))),
            )
        return bytes(b)

    def packed_doubles(fno: int, vals) -> bytes:
        if not vals:
            return b""
        return _ld(
            fno, b"".join(struct.pack("<d", float(v)) for v in vals)
        )

    out += spans(8, h.get("neg_spans"))
    out += packed_doubles(10, h.get("neg_buckets"))
    out += spans(11, h.get("pos_spans"))
    out += packed_doubles(13, h.get("pos_buckets"))
    if h.get("counter_reset_hint"):
        out += _vint(14, int(h["counter_reset_hint"]))
    out += _vint(15, t_ms & ((1 << 64) - 1))
    out += packed_doubles(16, h.get("custom_values"))
    return bytes(out)


def _decode_exemplar(buf: bytes) -> dict:
    """prompb Exemplar{labels=1, value=2, timestamp=3} (types.proto)."""
    labels: dict[str, str] = {}
    value, t = 0.0, 0
    for ef, ewt, ev in _fields(buf):
        if ef == 1:
            name = val = ""
            for lf, _lwt, lv in _fields(ev):
                if lf == 1:
                    name = lv.decode()
                elif lf == 2:
                    val = lv.decode()
            labels[name] = val
        elif ef == 2 and ewt == 1:
            value = struct.unpack("<d", ev)[0]
        elif ef == 3:
            t = ev if ev < (1 << 63) else ev - (1 << 64)
    return {"labels": labels, "value": value, "t": t}


def decode_write_request(
    body: bytes, compressed: bool = True, with_exemplars: bool = False
):
    """snappy+proto WriteRequest → [(labels, t_ms, value_or_hist)].
    Histogram samples return a dict in place of the float value (the
    shape ``storage.samples_from_rows`` accepts).  With
    ``with_exemplars=True`` returns ``(rows, exemplars)`` where each
    exemplar is {series_labels, labels, value, t} (the reference carries
    exemplars per TimeSeries — storage/remote/codec.go:417)."""
    if compressed:
        body = snappy_decode(body)
    rows: list = []
    exemplars: list = []
    for fno, _wt, ts_buf in _fields(body):
        if fno != 1:  # WriteRequest.timeseries
            continue
        labels: dict[str, str] = {}
        samples: list = []
        hists: list = []
        exs: list = []
        for tf, _twt, tv in _fields(ts_buf):
            if tf == 1:  # Label
                name = value = ""
                for lf, _lwt, lv in _fields(tv):
                    if lf == 1:
                        name = lv.decode()
                    elif lf == 2:
                        value = lv.decode()
                labels[name] = value
            elif tf == 2:  # Sample
                val, t = 0.0, 0
                for sf, swt, sv in _fields(tv):
                    if sf == 1 and swt == 1:
                        val = struct.unpack("<d", sv)[0]
                    elif sf == 2:
                        t = sv if sv < (1 << 63) else sv - (1 << 64)
                samples.append((t, val))
            elif tf == 3:  # Exemplar (types.proto TimeSeries.exemplars)
                exs.append(_decode_exemplar(tv))
            elif tf == 4:  # Histogram
                hists.append(_decode_hist(tv))
        for t, val in samples:
            rows.append((dict(labels), t, val))
        for h in hists:
            rows.append((dict(labels), h["t"], h["hist"]))
        for ex in exs:
            exemplars.append({"series_labels": dict(labels), **ex})
    if with_exemplars:
        return rows, exemplars
    return rows


# --------------------------------------------------------------------------
# Remote-write 2.0: io.prometheus.write.v2.Request (symbol-table format,
# prompb/io/prometheus/write/v2/types.proto).  Strings are interned once
# in ``symbols`` (index 0 MUST be the empty string per spec) and every
# label/exemplar references symbols by index pairs.

V2_CONTENT_TYPE = "application/x-protobuf;proto=io.prometheus.write.v2.Request"
V1_CONTENT_TYPE = "application/x-protobuf;proto=prometheus.WriteRequest"


def _read_packed_varints(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def _labels_from_refs(refs: list[int], symbols: list[str]) -> dict[str, str]:
    if len(refs) % 2:
        raise ValueError("v2: odd number of label refs")
    return {
        symbols[refs[i]]: symbols[refs[i + 1]] for i in range(0, len(refs), 2)
    }


def decode_write_request_v2(
    body: bytes, compressed: bool = True, with_exemplars: bool = False
):
    """io.prometheus.write.v2.Request → [(labels, t_ms, value_or_hist)]
    (+ exemplars, + stats): Request{symbols=4, timeseries=5};
    TimeSeries{labels_refs=1 packed, samples=2, histograms=3,
    exemplars=4, metadata=5}; v2 Exemplar{labels_refs=1, value=2,
    timestamp=3} (types.proto:36-103)."""
    if compressed:
        body = snappy_decode(body)
    symbols: list[str] = []
    ts_bufs: list[bytes] = []
    for fno, _wt, v in _fields(body):
        if fno == 4:
            symbols.append(v.decode())
        elif fno == 5:
            ts_bufs.append(v)
    if symbols and symbols[0] != "":
        raise ValueError("v2: symbols[0] must be the empty string")
    rows: list = []
    exemplars: list = []
    for ts_buf in ts_bufs:
        refs: list[int] = []
        samples: list = []
        hists: list = []
        exs: list = []
        for tf, twt, tv in _fields(ts_buf):
            if tf == 1:  # labels_refs — packed or (legal) unpacked
                if twt == 2:
                    refs.extend(_read_packed_varints(tv))
                else:
                    refs.append(tv)
            elif tf == 2:  # Sample{value=1, timestamp=2}
                val, t = 0.0, 0
                for sf, swt, sv in _fields(tv):
                    if sf == 1 and swt == 1:
                        val = struct.unpack("<d", sv)[0]
                    elif sf == 2:
                        t = sv if sv < (1 << 63) else sv - (1 << 64)
                samples.append((t, val))
            elif tf == 3:  # Histogram — same field layout as v1
                hists.append(_decode_hist(tv))
            elif tf == 4:  # v2 Exemplar (labels_refs instead of Label)
                ex_refs: list[int] = []
                value, t = 0.0, 0
                for ef, ewt, ev in _fields(tv):
                    if ef == 1:
                        if ewt == 2:
                            ex_refs.extend(_read_packed_varints(ev))
                        else:
                            ex_refs.append(ev)
                    elif ef == 2 and ewt == 1:
                        value = struct.unpack("<d", ev)[0]
                    elif ef == 3:
                        t = ev if ev < (1 << 63) else ev - (1 << 64)
                exs.append(
                    {
                        "labels": _labels_from_refs(ex_refs, symbols),
                        "value": value,
                        "t": t,
                    }
                )
        labels = _labels_from_refs(refs, symbols)
        for t, val in samples:
            rows.append((dict(labels), t, val))
        for h in hists:
            rows.append((dict(labels), h["t"], h["hist"]))
        for ex in exs:
            exemplars.append({"series_labels": dict(labels), **ex})
    if with_exemplars:
        return rows, exemplars
    return rows


def encode_write_request_v2(
    rows: Iterable[tuple[dict, int, float]],
    compress: bool = True,
    exemplars: Optional[list] = None,
) -> bytes:
    """[(labels, t_ms, float value)] → snappy(proto v2 Request) with an
    interned symbol table (symbols[0] = "" per spec)."""
    symbols: list[str] = [""]
    index: dict[str, int] = {"": 0}

    def sym(s: str) -> int:
        i = index.get(s)
        if i is None:
            i = len(symbols)
            symbols.append(s)
            index[s] = i
        return i

    series: dict[tuple, dict] = {}
    for labels, t, v in rows:
        key = tuple(sorted(labels.items()))
        series.setdefault(key, {"samples": [], "exemplars": []})[
            "samples"
        ].append((t, v))
    for ex in exemplars or []:
        key = tuple(sorted(ex["series_labels"].items()))
        series.setdefault(key, {"samples": [], "exemplars": []})[
            "exemplars"
        ].append(ex)

    ts_bodies: list[bytes] = []
    for key, content in series.items():
        refs = bytearray()
        for k, v in key:
            refs += _write_varint(sym(k)) + _write_varint(sym(v))
        ts = bytearray()
        ts += _write_varint(1 << 3 | 2) + _write_varint(len(refs)) + refs
        for t, v in content["samples"]:
            if isinstance(v, dict):  # native histogram (v2 field 3)
                ts += _ld(3, _encode_hist(v, t))
            else:
                ts += _ld(2, _f64(1, float(v)) + _vint(2, t & ((1 << 64) - 1)))
        for ex in content["exemplars"]:
            ex_refs = bytearray()
            for k, v in sorted(ex.get("labels", {}).items()):
                ex_refs += _write_varint(sym(k)) + _write_varint(sym(v))
            ex_body = (
                _write_varint(1 << 3 | 2)
                + _write_varint(len(ex_refs))
                + bytes(ex_refs)
                + _f64(2, float(ex["value"]))
                + _vint(3, int(ex["t"]) & ((1 << 64) - 1))
            )
            ts += _ld(4, ex_body)
        ts_bodies.append(bytes(ts))

    body = bytearray()
    for s in symbols:
        body += _ld(4, s.encode())
    for ts in ts_bodies:
        body += _ld(5, ts)
    out = bytes(body)
    return snappy_encode(out) if compress else out


def encode_write_request(
    rows: Iterable[tuple[dict, int, float]], compress: bool = True
) -> bytes:
    """[(labels, t_ms, value)] → snappy(proto WriteRequest), grouping
    rows with identical labels into one TimeSeries.  A dict value is a
    native histogram and rides TimeSeries.histograms (field 4) — the
    reference's send_native_histograms path (queue_manager.go)."""
    series: dict[tuple, list] = {}
    for labels, t, v in rows:
        series.setdefault(tuple(sorted(labels.items())), []).append((t, v))
    body = bytearray()
    for key, samples in series.items():
        ts = bytearray()
        for k, v in key:
            ts += _ld(1, _ld(1, k.encode()) + _ld(2, v.encode()))
        for t, v in samples:
            if isinstance(v, dict):
                ts += _ld(4, _encode_hist(v, t))
            else:
                ts += _ld(2, _f64(1, float(v)) + _vint(2, t & ((1 << 64) - 1)))
        body += _ld(1, bytes(ts))
    out = bytes(body)
    return snappy_encode(out) if compress else out


# --------------------------------------------------------------------------
# HTTP receiver → spool directory → Spark


class RemoteWriteReceiver:
    """Minimal remote-write endpoint: POST /api/v1/write bodies are
    decoded and appended as JSON-lines files into a spool directory that
    Spark reads (batch or ``readStream.format("json")`` — the streaming
    pickup IS the scale path; the HTTP hop only ever sees one request at
    a time).  Start with ``serve_forever=False`` in tests and drive
    ``handle_body`` directly, or run the threaded server."""

    def __init__(self, spool_dir: str):
        import os

        self.spool_dir = spool_dir
        self.exemplar_dir = os.path.join(spool_dir, "_exemplars")
        os.makedirs(spool_dir, exist_ok=True)
        os.makedirs(self.exemplar_dir, exist_ok=True)
        self._n = 0

    def handle_body(self, body: bytes, content_type: str = "") -> int:
        """Decode one POST body, negotiated by Content-Type exactly as the
        reference receiver (web/api/v1/api.go:483 region): the
        ``proto=io.prometheus.write.v2.Request`` parameter selects the v2
        symbol-table codec, everything else falls back to v1.
        Exemplars ride along into a sibling spool."""
        import json
        import os

        if "io.prometheus.write.v2.request" in content_type.lower():
            rows, exemplars = decode_write_request_v2(body, with_exemplars=True)
        else:
            rows, exemplars = decode_write_request(body, with_exemplars=True)
        self._n += 1
        self.last_stats = {
            "samples": sum(1 for _l, _t, v in rows if not isinstance(v, dict)),
            "histograms": sum(1 for _l, _t, v in rows if isinstance(v, dict)),
            "exemplars": len(exemplars),
        }
        path = os.path.join(self.spool_dir, f"rw_{os.getpid()}_{self._n:08d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for labels, t, v in rows:
                if isinstance(v, dict):
                    f.write(json.dumps({"labels": labels, "t": t, "hist": v}) + "\n")
                else:
                    f.write(json.dumps({"labels": labels, "t": t, "value": v}) + "\n")
        os.replace(tmp, path)  # atomic: readStream never sees partial files
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
        """The exemplar spool as the canonical exemplar frame
        (storage.exemplars.EXEMPLAR_SCHEMA) for /api/v1/query_exemplars."""
        import glob as _glob
        import json

        from prometheus_spark.storage.exemplars import exemplars_from_rows

        rows = []
        for path in sorted(_glob.glob(f"{self.exemplar_dir}/*.json")):
            with open(path) as f:
                for line in f:
                    ex = json.loads(line)
                    rows.append(
                        (ex["series_labels"], ex["t"], ex["labels"],
                         ex["value"], ex["t"])
                    )
        return exemplars_from_rows(spark, rows)

    def server(self, host: str = "127.0.0.1", port: int = 0):
        """Build (not start) a threaded HTTP server for /api/v1/write."""
        import http.server
        import socketserver

        recv = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — stdlib naming
                if self.path not in ("/api/v1/write", "/write"):
                    self.send_error(404)
                    return
                ln = int(self.headers.get("Content-Length", 0))
                ct = self.headers.get("Content-Type", "")
                try:
                    recv.handle_body(self.rfile.read(ln), content_type=ct)
                except Exception as e:  # noqa: BLE001 — surface as 400
                    self.send_error(400, str(e)[:200])
                    return
                self.send_response(204)
                if "io.prometheus.write.v2.request" in ct.lower():
                    # 2.0 spec: receivers MUST return written-stats headers
                    st = getattr(recv, "last_stats", {})
                    self.send_header(
                        "X-Prometheus-Remote-Write-Samples-Written",
                        str(st.get("samples", 0)),
                    )
                    self.send_header(
                        "X-Prometheus-Remote-Write-Histograms-Written",
                        str(st.get("histograms", 0)),
                    )
                    self.send_header(
                        "X-Prometheus-Remote-Write-Exemplars-Written",
                        str(st.get("exemplars", 0)),
                    )
                self.end_headers()

            def log_message(self, *a):  # silence
                pass

        class Server(socketserver.ThreadingMixIn, http.server.HTTPServer):
            daemon_threads = True

        return Server((host, port), Handler)


def spool_to_samples(spark, spool_dir: str, streaming: bool = False):
    """Read the receiver's spool as a canonical samples frame.

    Carries native-histogram records (``hist``) and start timestamps
    (``st``, written by the OTLP receiver) through to the engine."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from prometheus_spark.model.labels import sig_expr
    from prometheus_spark.model.schema import HISTOGRAM_TYPE, METRIC_NAME_LABEL

    schema = T.StructType(
        [
            T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
            T.StructField("t", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("hist", HISTOGRAM_TYPE),
            T.StructField("st", T.LongType()),
            T.StructField("stale", T.BooleanType()),
        ]
    )
    reader = (
        spark.readStream.schema(schema) if streaming else spark.read.schema(schema)
    )
    df = reader.json(spool_dir)
    return df.select(
        sig_expr("labels").alias("sig"),
        F.element_at("labels", METRIC_NAME_LABEL).alias("name"),
        "labels",
        "t",
        "value",
        "hist",
        # scrape staleness markers ride the spool as {"stale": true} rows
        F.coalesce(F.col("stale"), F.lit(False)).alias("stale"),
        "st",
    )


def send_write_request(
    url: str,
    rows,
    timeout: float = 10.0,
    headers: Optional[dict] = None,
    auth_header: Optional[str] = None,
) -> int:
    """Sender leg (queue_manager.go counterpart): POST one encoded batch.
    Use ``df.foreachPartition`` with this per partition for distributed
    sends — each executor ships its own shard.  ``headers`` adds the
    config's custom headers; ``auth_header`` the precomputed
    Authorization value (remote_write basic_auth/authorization)."""
    import urllib.request

    body = encode_write_request(rows)
    hdrs = {
        "Content-Encoding": "snappy",
        "Content-Type": "application/x-protobuf",
        "X-Prometheus-Remote-Write-Version": "0.1.0",
    }
    hdrs.update(headers or {})
    if auth_header:
        hdrs["Authorization"] = auth_header
    req = urllib.request.Request(url, data=body, headers=hdrs, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status


def send_write_request_v2(
    url: str, rows, timeout: float = 10.0, exemplars=None
) -> int:
    """Remote-write 2.0 sender leg: symbol-table Request with the spec's
    negotiation headers (Content-Type proto=, RW-Version 2.0.0)."""
    import urllib.request

    body = encode_write_request_v2(rows, exemplars=exemplars)
    req = urllib.request.Request(
        url,
        data=body,
        headers={
            "Content-Encoding": "snappy",
            "Content-Type": V2_CONTENT_TYPE,
            "X-Prometheus-Remote-Write-Version": "2.0.0",
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status


def send_samples_df(
    df,
    url: str,
    max_batch: int = 500,
    timeout: float = 10.0,
    retries: int = 3,
    min_backoff_s: float = 0.03,
    headers: Optional[dict] = None,
    auth_header: Optional[str] = None,
) -> None:
    """Distributed remote-write sender (queue_manager.go semantics):
    each DataFrame partition is a shard with its own send loop —
    batches capped at ``max_batch`` samples (MaxSamplesPerSend), retried
    on 5xx/network errors with doubling backoff starting at
    ``min_backoff_s`` (sendWriteRequestWithBackoff, MinBackoff 30ms),
    dropped on 4xx (unrecoverable, queue_manager.go:1560 region).

    Scale note: the shard count IS the partition count — repartition the
    frame to choose parallelism, exactly how the reference resharding
    maps onto Spark.  Sends happen executor-side; the driver never sees
    sample data.
    """
    import time as _time
    import urllib.error

    def _send_partition(rows_iter):
        batch: list = []

        def flush():
            if not batch:
                return
            delay = min_backoff_s
            for attempt in range(retries + 1):
                try:
                    send_write_request(
                        url, list(batch), timeout,
                        headers=headers, auth_header=auth_header,
                    )
                    break
                except urllib.error.HTTPError as e:
                    if 400 <= e.code < 500 or attempt == retries:
                        break  # unrecoverable → drop the batch
                    _time.sleep(delay)
                    delay *= 2
                except Exception:  # noqa: BLE001 — network failure
                    if attempt == retries:
                        break
                    _time.sleep(delay)
                    delay *= 2
            batch.clear()

        import struct as _struct

        stale_nan = _struct.unpack("<d", _struct.pack("<Q", 0x7FF0000000000002))[0]
        for r in rows_iter:
            if "hist" in r.__fields__ and r["hist"] is not None:
                v = r["hist"].asDict(recursive=True)
            elif "stale" in r.__fields__ and r["stale"]:
                # staleness markers ride the wire as the bit-exact
                # StaleNaN float (value/value.go), like the reference's
                # remote-write of stale appends
                v = stale_nan
            else:
                v = float(r["value"])
            batch.append((dict(r["labels"]), int(r["t"]), v))
            if len(batch) >= max_batch:
                flush()
        flush()

    cols = ["labels", "t", "value"]
    for optional in ("hist", "stale"):
        if optional in df.columns:
            cols.append(optional)
    df.select(*cols).foreachPartition(_send_partition)


def forward_samples(df, rw) -> None:
    """Ship a samples frame per one ``remote_write`` config entry
    (config.RemoteWriteConfig): apply ``write_relabel_configs``
    distributed (rows whose label set is dropped never leave the
    executors), gate native histograms on ``send_native_histograms``
    (reference default: off — hist rows are dropped, not downcast), and
    send with the entry's auth/headers/queue tuning."""
    from prometheus_spark.sources.relabel import apply_relabel

    if rw.write_relabel_configs:
        df = apply_relabel(df, rw.write_relabel_configs)
    if "hist" in df.columns and not rw.send_native_histograms:
        df = df.filter("hist IS NULL")
    send_samples_df(
        df,
        rw.url,
        max_batch=rw.max_samples_per_send,
        timeout=rw.remote_timeout_s,
        min_backoff_s=rw.min_backoff_s,
        retries=rw.retries,
        headers=rw.headers,
        auth_header=rw.auth_header,
    )
