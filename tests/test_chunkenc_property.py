"""Property-based round-trip tests for the hand-rolled chunk codecs.

Every codec here was written bit-by-bit from the reference's layout
docs (tsdb/chunkenc/*.go); hypothesis hammers the encode→decode
identity over adversarial inputs — denormals, NaN payloads, huge
timestamp jumps, empty bucket sets — that example tests won't reach.
"""

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from prometheus_spark.storage.chunkenc import (
    fh_decode,
    fh_encode,
    hist_int_decode,
    hist_int_encode,
    xor_decode,
    xor_encode,
)

# Finite and non-finite doubles, including denormals and NaN payloads
_doubles = st.one_of(
    st.floats(allow_nan=False, allow_infinity=True),
    st.just(float("nan")),
    st.floats(min_value=-1e-300, max_value=1e-300),
)

# strictly increasing millisecond timestamps with occasionally huge gaps
_timestamps = st.lists(
    st.integers(min_value=1, max_value=1 << 40), min_size=1, max_size=60
).map(lambda deltas: [sum(deltas[: i + 1]) for i in range(len(deltas))])


def _eq(a: float, b: float) -> bool:
    if math.isnan(a) and math.isnan(b):
        # exact NaN payload must survive (stale markers are payload NaNs)
        return struct.pack("<d", a) == struct.pack("<d", b)
    return a == b


@settings(max_examples=200, deadline=None)
@given(_timestamps, st.data())
def test_xor_chunk_roundtrip(ts, data):
    values = data.draw(
        st.lists(_doubles, min_size=len(ts), max_size=len(ts))
    )
    samples = list(zip(ts, values))
    dec = xor_decode(xor_encode(samples))
    assert len(dec) == len(samples)
    for (t1, v1), (t2, v2) in zip(samples, dec):
        assert t1 == t2
        assert _eq(v1, v2)


@settings(max_examples=100, deadline=None)
@given(
    _timestamps,
    st.integers(min_value=-4, max_value=8),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=3),
    st.data(),
)
def test_float_histogram_chunk_roundtrip(ts, schema, n_pos, n_neg, data):
    def hist():
        return {
            "schema": schema,
            "zero_threshold": data.draw(
                st.sampled_from([0.0, 2.0**-128, 2.0**-20, 0.123])
            ),
            "zero_count": data.draw(_doubles),
            "count": data.draw(_doubles),
            "sum": data.draw(_doubles),
            "pos_spans": (
                [{"offset": 0, "length": n_pos}] if n_pos else []
            ),
            "pos_buckets": data.draw(
                st.lists(_doubles, min_size=n_pos, max_size=n_pos)
            ),
            "neg_spans": (
                [{"offset": 2, "length": n_neg}] if n_neg else []
            ),
            "neg_buckets": data.draw(
                st.lists(_doubles, min_size=n_neg, max_size=n_neg)
            ),
            "custom_values": [],
            "counter_reset_hint": data.draw(
                st.integers(min_value=0, max_value=3)
            ),
        }

    samples = [(t, hist()) for t in ts]
    # all samples share one layout; the first dictates the reset header
    first_hint = samples[0][1]["counter_reset_hint"]
    for _t, h in samples:
        h["zero_threshold"] = samples[0][1]["zero_threshold"]
        h["counter_reset_hint"] = first_hint
    dec = fh_decode(fh_encode(samples))
    assert len(dec) == len(samples)
    for (t1, h1), (t2, h2) in zip(samples, dec):
        assert t1 == t2
        for k in ("schema", "zero_threshold", "pos_spans", "neg_spans"):
            assert h1[k] == h2[k], k
        for k in ("zero_count", "count", "sum"):
            assert _eq(h1[k], h2[k]), k
        for k in ("pos_buckets", "neg_buckets"):
            assert len(h1[k]) == len(h2[k])
            assert all(_eq(a, b) for a, b in zip(h1[k], h2[k])), k
        assert h2["counter_reset_hint"] == first_hint


@settings(max_examples=100, deadline=None)
@given(
    _timestamps,
    st.integers(min_value=0, max_value=3),
    st.data(),
)
def test_integer_histogram_chunk_roundtrip(ts, n_pos, data):
    ints = st.integers(min_value=-(1 << 40), max_value=1 << 40)

    def hist():
        return {
            "schema": 0,
            "zero_threshold": 2.0**-128,
            "zero_count": data.draw(st.integers(0, 1 << 40)),
            "count": data.draw(st.integers(0, 1 << 40)),
            "sum": data.draw(st.floats(allow_nan=False, allow_infinity=False)),
            "pos_spans": [{"offset": 0, "length": n_pos}] if n_pos else [],
            "pos_buckets": data.draw(
                st.lists(ints, min_size=n_pos, max_size=n_pos)
            ),
            "neg_spans": [],
            "neg_buckets": [],
            "custom_values": [],
            "counter_reset_hint": 0,
        }

    samples = [(t, hist()) for t in ts]
    dec = hist_int_decode(hist_int_encode(samples))
    assert len(dec) == len(samples)
    for (t1, h1), (t2, h2) in zip(samples, dec):
        assert t1 == t2
        assert h2["count"] == float(h1["count"])
        assert h2["zero_count"] == float(h1["zero_count"])
        assert h2["sum"] == h1["sum"]
        # decoded buckets are prefix sums of the integer deltas
        acc, want = 0, []
        for d in h1["pos_buckets"]:
            acc += d
            want.append(float(acc))
        assert h2["pos_buckets"] == want


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=1 << 62), st.data())
def test_prompb_histogram_roundtrip(t, data):
    """The prompb Histogram encoder/decoder pair (remote_write.py)
    round-trips arbitrary float histograms — the SAMPLES remote-read
    path and both write protocols ride on it."""
    from prometheus_spark.sources.remote_write import (
        _decode_hist,
        _encode_hist,
    )

    n_pos = data.draw(st.integers(0, 3))
    n_neg = data.draw(st.integers(0, 3))
    h = {
        "schema": data.draw(st.integers(-4, 8)),
        "zero_threshold": data.draw(
            st.floats(min_value=0, max_value=1, allow_nan=False)
        ),
        "zero_count": data.draw(_doubles),
        "count": data.draw(_doubles),
        "sum": data.draw(_doubles),
        "pos_spans": [
            {"offset": data.draw(st.integers(-100, 100)),
             "length": data.draw(st.integers(0, 10))}
            for _ in range(data.draw(st.integers(0, 2)))
        ],
        "pos_buckets": data.draw(
            st.lists(_doubles, min_size=n_pos, max_size=n_pos)
        ),
        "neg_spans": [],
        "neg_buckets": data.draw(
            st.lists(_doubles, min_size=n_neg, max_size=n_neg)
        ),
        "custom_values": data.draw(
            st.lists(st.floats(allow_nan=False, allow_infinity=False),
                     max_size=3)
        ),
        "counter_reset_hint": data.draw(st.integers(0, 3)),
    }
    got = _decode_hist(_encode_hist(h, t))
    assert got["t"] == t
    g = got["hist"]
    assert g["schema"] == h["schema"]
    assert g["zero_threshold"] == h["zero_threshold"]
    assert g["pos_spans"] == h["pos_spans"]
    for k in ("zero_count", "count", "sum"):
        assert _eq(g[k], h[k]), k
    for k in ("pos_buckets", "neg_buckets", "custom_values"):
        assert all(_eq(a, b) for a, b in zip(g[k], h[k]))
        assert len(g[k]) == len(h[k])
    assert g["counter_reset_hint"] == h["counter_reset_hint"]


def test_histogram_xor_windows_start_unset_for_compression():
    """The cnt/zeroCount/sum XOR windows must start at the 0xff "no window
    yet" sentinel (float_histogram.go:93, histogram.go:107).  A zeroed
    initial window makes the reuse branch always taken, writing every
    changed value as a full 2+64-bit delta; with the sentinel the first
    change opens a tight window.  50 slowly-incrementing samples encode in
    well under the ~800 bytes the zeroed-window encoder produced."""
    from prometheus_spark.storage.chunkenc import (
        hist_int_decode,
        hist_int_encode,
    )

    def fh(i):
        return {
            "schema": 0, "zero_threshold": 0.0, "zero_count": 0.0,
            "count": 100.0 + i, "sum": 100.0 + i * 0.5,
            "pos_spans": [], "pos_buckets": [],
            "neg_spans": [], "neg_buckets": [],
            "custom_values": [], "counter_reset_hint": 0,
        }

    samples = [(i * 1000, fh(i)) for i in range(50)]
    buf = fh_encode(samples)
    dec = fh_decode(buf)
    assert [t for t, _ in dec] == [t for t, _ in samples]
    assert all(
        a[1]["sum"] == b[1]["sum"] and a[1]["count"] == b[1]["count"]
        for a, b in zip(samples, dec)
    )
    assert len(buf) < 300, len(buf)

    def ih(i):
        h = fh(i)
        h["count"], h["zero_count"] = 100 + i, 0
        return h

    si = [(i * 1000, ih(i)) for i in range(50)]
    bi = hist_int_encode(si)
    di = hist_int_decode(bi)
    assert all(a[1]["sum"] == b[1]["sum"] for a, b in zip(si, di))
    assert len(bi) < 150, len(bi)


# --- XOR2 + ST chunk codecs (tsdb/chunkenc/xor2.go, st.go, *_st.go) ---------

from prometheus_spark.storage.chunkenc import (  # noqa: E402
    STALE_NAN_BITS,
    fh_st_decode,
    hist_int_st_decode,
    xor2_decode,
    xor2_encode,
    xor2_st_decode,
)

_STALE = struct.unpack("<d", struct.pack("<Q", STALE_NAN_BITS))[0]

# doubles plus the bit-exact stale marker (XOR2 encodes it specially in
# both the joint control and the value stream)
_xor2_doubles = st.one_of(_doubles, st.just(_STALE))

# timestamps that exercise every dod bin: 0, 13-bit, 20-bit, 64-bit
# escape, and negative second-sample deltas (uint64 wraparound)
_xor2_timestamps = st.lists(
    st.integers(min_value=-(1 << 40), max_value=1 << 40),
    min_size=1,
    max_size=140,
).map(lambda deltas: [sum(deltas[: i + 1]) for i in range(len(deltas))])


@settings(max_examples=200, deadline=None)
@given(_xor2_timestamps, st.data())
def test_xor2_chunk_roundtrip(ts, data):
    values = data.draw(
        st.lists(_xor2_doubles, min_size=len(ts), max_size=len(ts))
    )
    samples = list(zip(ts, values))
    dec = xor2_decode(xor2_encode(samples))
    assert len(dec) == len(samples)
    for (t1, v1), (t2, v2) in zip(samples, dec):
        assert t1 == t2
        assert _eq(v1, v2)


# ST streams: 0 = unknown; changes at arbitrary sample indices including
# past the 7-bit firstSTChangeOn forced-record boundary (index 127)
def _st_lists(n):
    return st.lists(
        st.one_of(st.just(0), st.integers(min_value=1, max_value=1 << 35)),
        min_size=n,
        max_size=n,
    )


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=140),
    st.data(),
)
def test_xor2_st_stream_roundtrip(n, data):
    ts = [1_000_000 + 15_000 * i + (i % 3) for i in range(n)]
    sts = data.draw(_st_lists(n))
    samples = [(t, float(i)) for i, t in enumerate(ts)]
    dec = xor2_st_decode(xor2_encode(samples, sts))
    assert [(s, t) for s, t, _v in dec] == list(zip(sts, ts))


def test_xor2_st_change_past_header_boundary():
    """An ST that first changes after sample 127 forces an early record
    at maxFirstSTChangeOn so the 7-bit header field stays valid."""
    n = 200
    ts = [10_000 * i for i in range(n)]
    sts = [0] * 180 + [123_456] * 20
    samples = [(t, 1.0) for t in ts]
    enc = xor2_encode(samples, sts)
    assert enc[2] & 0x7F == 127  # forced firstSTChangeOn record
    dec = xor2_st_decode(enc)
    assert [s for s, _t, _v in dec] == sts


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=150), st.data())
def test_float_histogram_st_roundtrip(n, data):
    ts = [5_000_000 + 60_000 * i for i in range(n)]
    sts = data.draw(_st_lists(n))
    samples = [
        (
            t,
            {
                "schema": 0,
                "zero_threshold": 2.938735877055719e-39,
                "zero_count": float(i % 4),
                "count": 10.0 + i,
                "sum": 2.5 * i - 3,
                "pos_spans": [{"offset": 1, "length": 2}],
                "pos_buckets": [1.0 + i, float(i % 7)],
                "neg_spans": [],
                "neg_buckets": [],
                "custom_values": [],
                "counter_reset_hint": 0,
            },
        )
        for i, t in enumerate(ts)
    ]
    dec = fh_st_decode(fh_encode(samples, sts))
    assert [(s, t) for s, t, _h in dec] == list(zip(sts, ts))
    for (_t0, h0), (_s, _t1, h1) in zip(samples, dec):
        assert h1["count"] == h0["count"]
        assert h1["sum"] == h0["sum"]
        assert h1["pos_buckets"] == h0["pos_buckets"]


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=150), st.data())
def test_integer_histogram_st_roundtrip(n, data):
    ts = [5_000_000 + 60_000 * i for i in range(n)]
    sts = data.draw(_st_lists(n))
    samples = [
        (
            t,
            {
                "schema": 0,
                "zero_threshold": 2.938735877055719e-39,
                "zero_count": i % 4,
                "count": 10 + i,
                "sum": 2.5 * i - 3,
                "pos_spans": [{"offset": 1, "length": 2}],
                "pos_buckets": [1 + i, i % 7],  # integer deltas
                "neg_spans": [],
                "neg_buckets": [],
                "custom_values": [],
                "counter_reset_hint": 0,
            },
        )
        for i, t in enumerate(ts)
    ]
    dec = hist_int_st_decode(hist_int_encode(samples, sts))
    assert [(s, t) for s, t, _h in dec] == list(zip(sts, ts))
    for (_t0, h0), (_s, _t1, h1) in zip(samples, dec):
        assert h1["count"] == float(h0["count"])
        assert h1["sum"] == h0["sum"]


def test_decode_chunk_dispatches_new_encodings():
    from prometheus_spark.storage.tsdb_block import (
        ENC_FLOAT_HISTOGRAM_ST,
        ENC_HISTOGRAM_ST,
        ENC_XOR2,
        decode_chunk,
    )

    samples = [(1000 + 15_000 * i, float(i) * 1.5) for i in range(30)]
    assert decode_chunk(ENC_XOR2, xor2_encode(samples)) == samples

    h = {
        "schema": 0, "zero_threshold": 0.0, "zero_count": 0.0,
        "count": 5.0, "sum": 9.0,
        "pos_spans": [{"offset": 0, "length": 1}], "pos_buckets": [5.0],
        "neg_spans": [], "neg_buckets": [], "custom_values": [],
        "counter_reset_hint": 0,
    }
    fh_chunk = fh_encode([(1000, h)], sts=[900])
    [(t, hist)] = decode_chunk(ENC_FLOAT_HISTOGRAM_ST, fh_chunk)
    assert t == 1000 and hist["count"] == 5.0

    hi = dict(h, count=5, zero_count=0, pos_buckets=[5])
    hi_chunk = hist_int_encode([(1000, hi)], sts=[900])
    [(t, hist)] = decode_chunk(ENC_HISTOGRAM_ST, hi_chunk)
    assert t == 1000 and hist["count"] == 5.0


def test_streamed_read_client_decodes_xor2_chunks():
    """A newer reference server streams its TSDB's native chunk bytes
    (read_handler.go) — the remote-read client must decode XOR2/ST
    codecs, not just 1/2/3."""
    from prometheus_spark.sources.remote_read import (
        _frame,
        decode_streamed_read_response,
    )

    samples = [(1000 + 15_000 * i, float(i)) for i in range(40)]
    chunk = xor2_encode(samples)
    # hand-build a ChunkedReadResponse protobuf: one series, one chunk
    def _ld(tag, b):
        out = bytearray([(tag << 3) | 2])
        v = len(b)
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
        return bytes(out) + b

    def _vint(tag, v):
        out = bytearray([tag << 3])
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
        return bytes(out)

    lbl = _ld(1, _ld(1, b"__name__") + _ld(2, b"m"))
    chunk_msg = (
        _vint(1, samples[0][0] & 0xFFFFFFFFFFFFFFFF)
        + _vint(2, samples[-1][0])
        + _vint(3, 4)  # Encoding.XOR2
        + _ld(4, chunk)
    )
    series_body = lbl + _ld(2, chunk_msg)
    payload = _ld(1, series_body)  # ChunkedReadResponse.chunked_series
    body = _frame(payload)
    [result] = decode_streamed_read_response(body, n_queries=1)
    [(labels, got)] = result
    assert labels == {"__name__": "m"}
    assert got == samples
