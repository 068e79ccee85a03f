"""Remote-read server and client codec (prompb ReadRequest/ReadResponse).

The reference serves raw series cross-instance at ``POST /api/v1/read``
(web/api/v1/api.go:482, storage/remote/read_handler.go): a
snappy-compressed protobuf ``ReadRequest`` of label-matcher queries,
answered with a ``ReadResponse`` of SAMPLES-typed query results
(prompb/remote.proto:31-76, prompb/types.proto:127 TimeSeries).

The Spark side is a matcher-predicate filter over the samples table —
Catalyst pushes the name/time predicates to the scan; only the matched
series travel to the driver for protobuf rendering, the same boundary
the reference's read handler represents.  The STREAMED_XOR_CHUNKS
response type is not offered (we answer SAMPLES, the universal
fallback both sides must support per remote.proto:38-49).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

from prometheus_spark.sources.remote_write import (
    _f64,
    _fields,
    _ld,
    _vint,
    snappy_decode,
    snappy_encode,
)

_MATCH_TYPES = {0: "=", 1: "!=", 2: "=~", 3: "!~"}
_MATCH_CODES = {v: k for k, v in _MATCH_TYPES.items()}


def decode_read_request(body: bytes, compressed: bool = True) -> list[dict]:
    """snappy(proto ReadRequest) → [{start_ms, end_ms, matchers:
    [(op, name, value)]}] (remote.proto:67 Query)."""
    if compressed:
        body = snappy_decode(body)
    queries = []
    for fno, _wt, qbuf in _fields(body):
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
    return queries


def encode_read_request(queries: list[dict], compress: bool = True) -> bytes:
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
    out = bytes(body)
    return snappy_encode(out) if compress else out


def encode_read_response(
    results: list[list[tuple[dict, list[tuple[int, float]]]]],
    compress: bool = True,
) -> bytes:
    """[[(labels, [(t_ms, value)])] per query] → snappy(ReadResponse)."""
    body = bytearray()
    for series_list in results:
        qr = bytearray()
        for labels, samples in series_list:
            ts = bytearray()
            for k in sorted(labels):
                ts += _ld(1, _ld(1, k.encode()) + _ld(2, labels[k].encode()))
            for t, v in samples:
                ts += _ld(2, _f64(1, float(v)) + _vint(2, t & ((1 << 64) - 1)))
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
            series_list.append((labels, samples))
        results.append(series_list)
    return results


def serve_read(samples: DataFrame, request_body: bytes) -> bytes:
    """Answer a remote-read request over the samples table.

    One matcher-predicate + time-range filter per query — pushed down by
    Catalyst; results are collected per matched series only (bounded by
    the query's selectivity, as in the reference's handler)."""
    from pyspark.sql import functions as F

    from prometheus_spark.engine.selectors import matcher_predicate
    from prometheus_spark.parser.ast import Matcher, MatchType

    queries = decode_read_request(request_body)
    results = []
    for q in queries:
        matchers = [
            Matcher(name, MatchType(op), value)
            for op, name, value in q["matchers"]
        ]
        df = (
            samples.where(matcher_predicate(matchers))
            .where(
                (F.col("t") >= q["start_ms"]) & (F.col("t") <= q["end_ms"])
            )
            .where(~F.col("stale") & F.col("value").isNotNull())
            .select("sig", "labels", "t", "value")
            .orderBy("sig", "t")
        )
        series: dict[str, tuple[dict, list]] = {}
        for r in df.collect():
            entry = series.setdefault(r["sig"], (dict(r["labels"]), []))
            entry[1].append((r["t"], r["value"]))
        results.append([series[k] for k in sorted(series)])
    return encode_read_response(results)
