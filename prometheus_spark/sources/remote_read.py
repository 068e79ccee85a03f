"""Remote-read server and client codec (prompb ReadRequest/ReadResponse).

The reference serves raw series cross-instance at ``POST /api/v1/read``
(web/api/v1/api.go:482, storage/remote/read_handler.go): a
snappy-compressed protobuf ``ReadRequest`` of label-matcher queries,
answered with a ``ReadResponse`` of SAMPLES-typed query results
(prompb/remote.proto:31-76, prompb/types.proto:127 TimeSeries).

The Spark side is a matcher-predicate filter over the samples table —
Catalyst pushes the name/time predicates to the scan; only the matched
series travel to the driver for protobuf rendering, the same boundary
the reference's read handler represents.

Both response types are offered (remote.proto:38-50): SAMPLES (the
universal fallback) and STREAMED_XOR_CHUNKS — series rendered as
Gorilla XOR chunks (storage/chunkenc.py) inside length-prefixed,
CRC32-Castagnoli-checksummed frames of ChunkedReadResponse messages
(storage/remote/chunked.go:64-90, read_handler.go:188), negotiated
FIFO from the request's accepted_response_types.  Streaming means a
large read never materializes one giant protobuf: frames flush per
``max_bytes_in_frame`` (the reference's --storage.remote.read-max-
bytes-in-frame, default 1 MiB).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

from prometheus_spark.sources.remote_write import (
    _decode_hist,
    _encode_hist,
    _f64,
    _fields,
    _ld,
    _vint,
    snappy_decode,
    snappy_encode,
)

_MATCH_TYPES = {0: "=", 1: "!=", 2: "=~", 3: "!~"}
_MATCH_CODES = {v: k for k, v in _MATCH_TYPES.items()}

#: remote.proto:38-50 ReadRequest.ResponseType
SAMPLES = 0
STREAMED_XOR_CHUNKS = 1

CONTENT_TYPE_SAMPLES = "application/x-protobuf"
CONTENT_TYPE_STREAMED = (
    "application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse"
)

#: --storage.remote.read-max-bytes-in-frame default (read_handler.go)
DEFAULT_MAX_BYTES_IN_FRAME = 1 << 20


def negotiate_response_type(accepted: list[int]) -> int:
    """FIFO pick of the first supported type; empty list → SAMPLES
    (remote.proto:55-58, storage/remote/codec.go NegotiateResponseType)."""
    if not accepted:
        return SAMPLES
    for t in accepted:
        if t in (SAMPLES, STREAMED_XOR_CHUNKS):
            return t
    raise ValueError(f"server does not support any of the requested response types: {accepted}")


def decode_read_request(body: bytes, compressed: bool = True) -> list[dict]:
    """snappy(proto ReadRequest) → [{start_ms, end_ms, matchers:
    [(op, name, value)]}] (remote.proto:67 Query)."""
    return decode_read_request_full(body, compressed)[0]


def decode_read_request_full(
    body: bytes, compressed: bool = True
) -> tuple[list[dict], list[int]]:
    """Like :func:`decode_read_request` but also returns the request's
    ``accepted_response_types`` (remote.proto:58, packed or unpacked)."""
    if compressed:
        body = snappy_decode(body)
    queries = []
    accepted: list[int] = []
    for fno, _wt, qbuf in _fields(body):
        if fno == 2:  # accepted_response_types
            if isinstance(qbuf, (bytes, bytearray)):  # packed varints
                i = 0
                while i < len(qbuf):
                    v = 0
                    shift = 0
                    while True:
                        b = qbuf[i]
                        i += 1
                        v |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                    accepted.append(v)
            else:
                accepted.append(qbuf)
            continue
        if fno != 1:  # ReadRequest.queries
            continue
        q = {"start_ms": 0, "end_ms": 0, "matchers": []}
        for qf, _qwt, qv in _fields(qbuf):
            if qf == 1:
                q["start_ms"] = qv if qv < (1 << 63) else qv - (1 << 64)
            elif qf == 2:
                q["end_ms"] = qv if qv < (1 << 63) else qv - (1 << 64)
            elif qf == 3:  # LabelMatcher
                mtype, name, value = 0, "", ""
                for mf, _mwt, mv in _fields(qv):
                    if mf == 1:
                        mtype = mv
                    elif mf == 2:
                        name = mv.decode()
                    elif mf == 3:
                        value = mv.decode()
                q["matchers"].append((_MATCH_TYPES[mtype], name, value))
        queries.append(q)
    return queries, accepted


def encode_read_request(
    queries: list[dict],
    compress: bool = True,
    accepted_response_types: list[int] | None = None,
) -> bytes:
    """The client half: [{start_ms, end_ms, matchers}] → wire bytes."""
    body = bytearray()
    for q in queries:
        qb = bytearray()
        qb += _vint(1, q["start_ms"] & ((1 << 64) - 1))
        qb += _vint(2, q["end_ms"] & ((1 << 64) - 1))
        for op, name, value in q["matchers"]:
            qb += _ld(
                3,
                _vint(1, _MATCH_CODES[op])
                + _ld(2, name.encode())
                + _ld(3, value.encode()),
            )
        body += _ld(1, bytes(qb))
    for rt in accepted_response_types or []:
        body += _vint(2, rt)
    out = bytes(body)
    return snappy_encode(out) if compress else out


def encode_read_response(
    results: list[list[tuple[dict, list[tuple[int, float]]]]],
    compress: bool = True,
) -> bytes:
    """[[(labels, [(t_ms, value)])] per query] → snappy(ReadResponse).

    A sample whose value is a dict is a native histogram and rides
    ``TimeSeries.histograms`` (prompb/types.proto field 4) instead of
    ``samples``."""
    body = bytearray()
    for series_list in results:
        qr = bytearray()
        for labels, samples in series_list:
            ts = bytearray()
            for k in sorted(labels):
                ts += _ld(1, _ld(1, k.encode()) + _ld(2, labels[k].encode()))
            for t, v in samples:
                if isinstance(v, dict):
                    ts += _ld(4, _encode_hist(v, t))
                else:
                    ts += _ld(
                        2, _f64(1, float(v)) + _vint(2, t & ((1 << 64) - 1))
                    )
            qr += _ld(1, bytes(ts))
        body += _ld(1, bytes(qr))
    out = bytes(body)
    return snappy_encode(out) if compress else out


def decode_read_response(body: bytes, compressed: bool = True) -> list:
    """Wire bytes → [[(labels, [(t_ms, value)])] per query]."""
    if compressed:
        body = snappy_decode(body)
    results = []
    for fno, _wt, qrbuf in _fields(body):
        if fno != 1:
            continue
        series_list = []
        for qf, _qwt, tsbuf in _fields(qrbuf):
            if qf != 1:
                continue
            labels: dict[str, str] = {}
            samples: list = []
            for tf, _twt, tv in _fields(tsbuf):
                if tf == 1:
                    name = value = ""
                    for lf, _lwt, lv in _fields(tv):
                        if lf == 1:
                            name = lv.decode()
                        elif lf == 2:
                            value = lv.decode()
                    labels[name] = value
                elif tf == 2:
                    val, t = 0.0, 0
                    for sf, swt, sv in _fields(tv):
                        if sf == 1 and swt == 1:
                            val = struct.unpack("<d", sv)[0]
                        elif sf == 2:
                            t = sv if sv < (1 << 63) else sv - (1 << 64)
                    samples.append((t, val))
                elif tf == 4:  # native histogram (types.proto field 4)
                    hr = _decode_hist(tv)
                    samples.append((hr["t"], hr["hist"]))
            samples.sort(key=lambda p: p[0])
            series_list.append((labels, samples))
        results.append(series_list)
    return results


class RemoteReadClient:
    """HTTP remote-read client (storage/remote/client.go:356
    Read/ReadMultiple): POST a snappy ReadRequest advertising
    ``[STREAMED_XOR_CHUNKS, SAMPLES]`` (the reference's default
    AcceptedResponseTypes order, client.go:66) and decode whichever
    response type the server chose by Content-Type.

    Returns ``[[(labels, [(t_ms, value)])] per query]`` — the same shape
    :func:`decode_read_response` yields, so callers are agnostic to the
    negotiated wire format."""

    def __init__(
        self,
        url: str,
        timeout_s: float = 30.0,
        accepted_response_types: list[int] | None = None,
        post_fn=None,
    ):
        self.url = url
        self.timeout_s = timeout_s
        self.accepted = (
            accepted_response_types
            if accepted_response_types is not None
            else [STREAMED_XOR_CHUNKS, SAMPLES]
        )
        self._post = post_fn or self._http_post

    def _http_post(self, body: bytes) -> tuple[bytes, str]:
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=body,
            method="POST",
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "snappy",
                "X-Prometheus-Remote-Read-Version": "0.1.0",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read(), resp.headers.get("Content-Type", "")

    def read(self, queries: list[dict]) -> list:
        """queries = [{start_ms, end_ms, matchers: [(op, name, value)]}]."""
        body, ctype = self._post(
            encode_read_request(queries, accepted_response_types=self.accepted)
        )
        if ctype.startswith("application/x-streamed-protobuf"):
            return decode_streamed_read_response(body, n_queries=len(queries))
        return decode_read_response(body)


# --- STREAMED_XOR_CHUNKS framing (storage/remote/chunked.go) ---------------

_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """CRC32 with the Castagnoli polynomial (chunked.go:32), table-based."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = 0x82F63B78  # reversed 0x1EDC6F41
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
            table.append(crc)
        _CRC32C_TABLE = table
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _frame(msg: bytes) -> bytes:
    """One chunked frame: uvarint(len) + BE crc32c + payload
    (chunked.go:64-90 ChunkedWriter.Write)."""
    out = bytearray()
    v = len(msg)
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    out += struct.pack(">I", _crc32c(msg))
    out += msg
    return bytes(out)


def split_frames(body: bytes) -> list[bytes]:
    """Parse a concatenated frame stream back into payloads, verifying
    each CRC (chunked.go:93-140 ChunkedReader.Next)."""
    out = []
    i = 0
    n = len(body)
    while i < n:
        size = shift = 0
        while True:
            b = body[i]
            i += 1
            size |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        (crc,) = struct.unpack(">I", body[i : i + 4])
        i += 4
        payload = body[i : i + size]
        i += size
        if _crc32c(payload) != crc:
            raise ValueError("chunked frame: checksum mismatch")
        out.append(payload)
    return out


def _encode_chunked_series(
    labels: dict, chunks: list[tuple[int, int, int, bytes]]
) -> bytes:
    """prometheus.ChunkedSeries (types.proto:189): sorted labels +
    typed chunks (Encoding.XOR=1 / FLOAT_HISTOGRAM=3, types.proto:177)."""
    ts = bytearray()
    for k in sorted(labels):
        ts += _ld(1, _ld(1, k.encode()) + _ld(2, labels[k].encode()))
    for min_t, max_t, enc, data in chunks:
        ch = (
            _vint(1, min_t & ((1 << 64) - 1))
            + _vint(2, max_t & ((1 << 64) - 1))
            + _vint(3, enc)
            + _ld(4, data)
        )
        ts += _ld(2, ch)
    return bytes(ts)


def encode_chunked_read_response(
    series: list[tuple[dict, list[tuple[int, int, bytes]]]], query_index: int
) -> bytes:
    """ChunkedReadResponse message (remote.proto:83)."""
    body = bytearray()
    for labels, chunks in series:
        body += _ld(1, _encode_chunked_series(labels, chunks))
    body += _vint(2, query_index & ((1 << 64) - 1))
    return bytes(body)


def decode_chunked_read_response(msg: bytes) -> tuple[int, list]:
    """→ (query_index, [(labels, [(min_t, max_t, enc, chunk_bytes)])])."""
    qidx = 0
    series = []
    for fno, _wt, v in _fields(msg):
        if fno == 2:
            qidx = v
        elif fno == 1:
            labels: dict[str, str] = {}
            chunks = []
            for tf, _twt, tv in _fields(v):
                if tf == 1:
                    name = value = ""
                    for lf, _lwt, lv in _fields(tv):
                        if lf == 1:
                            name = lv.decode()
                        elif lf == 2:
                            value = lv.decode()
                    labels[name] = value
                elif tf == 2:
                    min_t = max_t = enc = 0
                    data = b""
                    for cf, _cwt, cv in _fields(tv):
                        if cf == 1:
                            min_t = cv if cv < (1 << 63) else cv - (1 << 64)
                        elif cf == 2:
                            max_t = cv if cv < (1 << 63) else cv - (1 << 64)
                        elif cf == 3:
                            enc = cv
                        elif cf == 4:
                            data = cv
                    chunks.append((min_t, max_t, enc, data))
            series.append((labels, chunks))
    return qidx, series


def encode_streamed_read_response(
    results: list[list[tuple[dict, list[tuple[int, float]]]]],
    max_bytes_in_frame: int = DEFAULT_MAX_BYTES_IN_FRAME,
) -> bytes:
    """Render per-query series lists as a stream of checksummed
    ChunkedReadResponse frames (read_handler.go:188
    remoteReadStreamedXORChunks + codec.go StreamChunkedReadResponses):
    full series stream in order; a frame flushes once its accumulated
    chunks exceed ``max_bytes_in_frame``, so a frame may carry part of a
    series but never interleaves two."""
    from prometheus_spark.storage.chunkenc import chunk_fh_series, chunk_series

    out = bytearray()
    for qidx, series_list in enumerate(results):
        for labels, samples in series_list:
            # float samples → XOR chunks (enc 1); native histograms →
            # FLOAT_HISTOGRAM chunks (enc 3, tsdb/chunkenc/
            # float_histogram.go).  Chunks are emitted in start-time
            # order; the proto allows overlap (remote.proto:80-82).
            floats = sorted(
                (t, v) for t, v in samples if not isinstance(v, dict)
            )
            hists = sorted(
                ((t, v) for t, v in samples if isinstance(v, dict)),
                key=lambda p: p[0],
            )
            chunks = sorted(
                [(mn, mx, 1, data) for mn, mx, data in chunk_series(floats)]
                + [
                    (mn, mx, 3, data)
                    for mn, mx, data in chunk_fh_series(hists)
                ]
            )
            pending: list = []
            pending_bytes = 0
            for ch in chunks:
                pending.append(ch)
                pending_bytes += len(ch[3])
                if pending_bytes >= max_bytes_in_frame:
                    out += _frame(
                        encode_chunked_read_response([(labels, pending)], qidx)
                    )
                    pending, pending_bytes = [], 0
            if pending or not chunks:
                out += _frame(
                    encode_chunked_read_response([(labels, pending)], qidx)
                )
    return bytes(out)


def decode_streamed_read_response(body: bytes, n_queries: int = 1) -> list:
    """Client half: frame stream → [[(labels, [(t, value)])] per query],
    merging split-series frames back together.  Chunk payloads dispatch
    through the full six-codec table (XOR/XOR2, integer/float histogram
    and both ST variants) — a newer reference server streams its native
    chunk bytes verbatim (read_handler.go), so the client must decode
    whatever codec the server's TSDB holds."""
    from prometheus_spark.storage.tsdb_block import decode_chunk

    results: list[list] = [[] for _ in range(n_queries)]
    # (qidx, labels-key) → accumulated samples
    for payload in split_frames(body):
        qidx, series = decode_chunked_read_response(payload)
        while qidx >= len(results):
            results.append([])
        for labels, chunks in series:
            samples = []
            for _min_t, _max_t, enc, data in chunks:
                samples.extend(decode_chunk(enc, data))
            samples.sort(key=lambda p: p[0])
            bucket = results[qidx]
            if bucket and bucket[-1][0] == labels:
                bucket[-1][1].extend(samples)  # continuation frame
            else:
                bucket.append((labels, samples))
    # float and histogram chunks may interleave across frames — restore
    # global time order per series
    for series_list in results:
        for _labels, samples in series_list:
            samples.sort(key=lambda p: p[0])
    return results


def serve_read(samples: DataFrame, request_body: bytes) -> bytes:
    """Answer a remote-read request over the samples table with the
    SAMPLES response type (the universal fallback)."""
    queries = decode_read_request(request_body)
    return encode_read_response(_execute_queries(samples, queries))


def serve_read_negotiated(
    samples: DataFrame,
    request_body: bytes,
    max_bytes_in_frame: int = DEFAULT_MAX_BYTES_IN_FRAME,
) -> tuple[bytes, str]:
    """Answer a remote-read request honoring accepted_response_types
    (read_handler.go:100-115): returns (body, content_type) —
    snappy(ReadResponse) for SAMPLES, an uncompressed checksummed frame
    stream for STREAMED_XOR_CHUNKS."""
    queries, accepted = decode_read_request_full(request_body)
    rtype = negotiate_response_type(accepted)
    results = _execute_queries(samples, queries)
    if rtype == STREAMED_XOR_CHUNKS:
        return (
            encode_streamed_read_response(results, max_bytes_in_frame),
            CONTENT_TYPE_STREAMED,
        )
    return encode_read_response(results), CONTENT_TYPE_SAMPLES


def _execute_queries(samples: DataFrame, queries: list[dict]) -> list:
    """One matcher-predicate + time-range filter per query — pushed down
    by Catalyst; results are collected per matched series only (bounded
    by the query's selectivity, as in the reference's handler)."""
    from pyspark.sql import functions as F

    from prometheus_spark.engine.selectors import matcher_predicate
    from prometheus_spark.parser.ast import Matcher, MatchType

    results = []
    for q in queries:
        matchers = [
            Matcher(name, MatchType(op), value)
            for op, name, value in q["matchers"]
        ]
        has_hist = "hist" in samples.columns
        present = F.col("value").isNotNull()
        cols = ["sig", "labels", "t", "value"]
        if has_hist:  # native histograms ride along (value is null)
            present = present | F.col("hist").isNotNull()
            cols.append("hist")
        df = (
            samples.where(matcher_predicate(matchers))
            .where(
                (F.col("t") >= q["start_ms"]) & (F.col("t") <= q["end_ms"])
            )
            .where(~F.col("stale") & present)
            .select(*cols)
            .orderBy("sig", "t")
        )
        series: dict[str, tuple[dict, list]] = {}
        for r in df.collect():
            entry = series.setdefault(r["sig"], (dict(r["labels"]), []))
            if has_hist and r["value"] is None and r["hist"] is not None:
                entry[1].append((r["t"], r["hist"].asDict(recursive=True)))
            else:
                entry[1].append((r["t"], r["value"]))
        results.append([series[k] for k in sorted(series)])
    return results


def read_remote_samples(
    spark,
    cfg,
    start_ms: int,
    end_ms: int,
    matchers: list[tuple[str, str, str]] | None = None,
    post_fn=None,
) -> "DataFrame":
    """One ``remote_read`` endpoint (config.RemoteReadConfig) → the
    canonical samples frame — the fanout read leg (storage/remote/
    read.go sampleAndChunkQueryable).  ``required_matchers`` gates the
    call the way the reference does: a query that doesn't carry every
    required equality matcher skips the endpoint (returns an empty
    frame) rather than flooding it.

    Scale note: remote-read responses are selector-bounded by protocol
    design (the reference buffers them the same way); the decoded rows
    enter a regular distributed frame for everything downstream.  Merge
    with local data via storage.fanout.merge_samples."""
    from prometheus_spark.storage import samples_from_rows

    matchers = list(matchers or [])
    eq = {name: value for op, name, value in matchers if op == "="}
    for k, v in (cfg.required_matchers or {}).items():
        if eq.get(k) != v:
            return samples_from_rows(spark, [])

    def post(body: bytes) -> tuple[bytes, str]:
        import urllib.request

        hdrs = {
            "Content-Type": "application/x-protobuf",
            "Content-Encoding": "snappy",
            "X-Prometheus-Remote-Read-Version": "0.1.0",
        }
        hdrs.update(cfg.headers or {})
        if cfg.auth_header:
            hdrs["Authorization"] = cfg.auth_header
        req = urllib.request.Request(
            cfg.url, data=body, method="POST", headers=hdrs
        )
        with urllib.request.urlopen(req, timeout=cfg.remote_timeout_s) as r:
            return r.read(), r.headers.get("Content-Type", "")

    client = RemoteReadClient(
        cfg.url, cfg.remote_timeout_s, post_fn=post_fn or post
    )
    [series] = client.read(
        [{"start_ms": start_ms, "end_ms": end_ms, "matchers": matchers}]
    )
    rows = []
    for labels, samples in series:
        for item in samples:
            t, v = item[0], item[1]
            rows.append((dict(labels), int(t), v))
    return samples_from_rows(spark, rows)
