"""Go-compatible label-set hashing for ratio sampling.

The reference's ``limit_ratio`` keeps a sample iff
``float64(labels.Hash()) / float64(MaxUint64)`` falls in the ratio band
(promql/engine.go AddRatioSample).  ``labels.Hash()`` is xxhash64 (seed 0)
over the byte encoding ``name 0xff value 0xff ...`` in sorted label order
(model/labels/labels.go Hash).  Reproducing that hash bit-for-bit makes
our sampling decisions identical to the reference engine's — the property
the corpus (limit.test) checks statistically.

xxhash64 implemented here from the public algorithm spec (Yann Collet,
github.com/Cyan4973/xxHash — public BSD spec); pure Python, used only in
the limit_ratio path via an Arrow-batched pandas UDF (cardinality =
series count, never the sample hot path).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


_SEP = b"\xff"


def labels_hash(labels: dict) -> int:
    """model/labels/labels.go Hash(): xxhash64 over sorted
    ``name 0xff value 0xff`` byte pairs."""
    b = bytearray()
    for k in sorted(labels):
        b += k.encode()
        b += _SEP
        b += labels[k].encode()
        b += _SEP
    return xxhash64(bytes(b))


def ratio_offset_udf():
    """Pandas UDF: canonical sig string → the reference's ratio-sampling
    offset in [0, 1) (``float64(hash) / float64(MaxUint64)``).

    Takes the sig rather than the labels map because Arrow pandas UDFs
    don't accept MapType input; the sig is the same sorted (k, v)
    sequence, so the Go byte encoding rebuilds exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    return F.pandas_udf(_offset_series, T.DoubleType())


def _sig_offset(sig: str) -> float:
    from prometheus_spark.model.labels import KV_SEP, PAIR_SEP

    b = bytearray()
    if sig:
        for pair in sig.split(PAIR_SEP):
            k, _, v = pair.partition(KV_SEP)
            b += k.encode()
            b += _SEP
            b += v.encode()
            b += _SEP
    return xxhash64(bytes(b)) / float(_M)


def _offset_series(sig):
    return sig.map(_sig_offset)
