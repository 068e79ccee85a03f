"""Round-trip tests for the protobuf scrape parser and OTLP translator.

Payloads are hand-encoded with the same pure-Python wire builders used
by the remote-write codec — no generated protobuf code anywhere.
"""

import math
import struct

import pytest

from prometheus_spark.sources.remote_write import _ld, _vint, _write_varint
from prometheus_spark.sources.protobuf_scrape import (
    parse_protobuf_df,
    parse_protobuf_scrape,
    to_samples,
)
from prometheus_spark.sources.otlp import (
    convert_buckets_layout,
    normalize_metric_name,
    otlp_to_rows,
)


def _df64(fno: int, value: float) -> bytes:
    return _write_varint(fno << 3 | 1) + struct.pack("<d", value)


def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _label(k: str, v: str) -> bytes:
    return _ld(1, _ld(1, k.encode()) + _ld(2, v.encode()))


def _delimited(*families: bytes) -> bytes:
    return b"".join(_write_varint(len(f)) + f for f in families)


# --- protobuf scrape families ------------------------------------------------


def _counter_family() -> bytes:
    # created (start) timestamp: 100s → 100000 ms
    counter = _df64(1, 42.0) + _ld(3, _vint(1, 100))
    metric = _label("job", "api") + _ld(3, counter) + _vint(6, 60_000)
    return (
        _ld(1, b"http_requests_total")
        + _ld(2, b"Total requests.")
        + _vint(3, 0)  # COUNTER
        + _ld(4, metric)
    )


def _summary_family() -> bytes:
    q = _df64(1, 0.99) + _df64(2, 1.5)
    summary = _vint(1, 10) + _df64(2, 12.5) + _ld(3, q)
    metric = _ld(4, summary) + _vint(6, 60_000)
    return _ld(1, b"rpc_duration") + _vint(3, 2) + _ld(4, metric)  # SUMMARY


def _classic_hist_family() -> bytes:
    b1 = _vint(1, 3) + _df64(2, 0.5)
    b2 = _vint(1, 7) + _df64(2, math.inf)
    hist = _vint(1, 7) + _df64(2, 3.2) + _ld(3, b1) + _ld(3, b2)
    metric = _ld(7, hist) + _vint(6, 60_000)
    return _ld(1, b"req_latency") + _vint(3, 4) + _ld(4, metric)  # HISTOGRAM


def _native_hist_family() -> bytes:
    span = _vint(1, _zz(0)) + _vint(2, 2)
    deltas = _write_varint(_zz(2)) + _write_varint(_zz(-1))
    hist = (
        _vint(1, 3)
        + _df64(2, 5.0)
        + _vint(5, _zz(3))  # schema sint32
        + _df64(6, 0.001)  # zero_threshold
        + _vint(7, 0)
        + _ld(12, span)  # positive_span
        + _ld(13, deltas)  # positive_delta (packed sint64)
    )
    metric = _ld(7, hist) + _vint(6, 60_000)
    return _ld(1, b"native_latency") + _vint(3, 4) + _ld(4, metric)


def test_protobuf_scrape_counter_created():
    rows, meta = parse_protobuf_scrape(_delimited(_counter_family()))
    assert meta["http_requests_total"]["type"] == "counter"
    assert rows == [
        ({"job": "api", "__name__": "http_requests_total"}, 60_000, 42.0, 100_000)
    ]


def test_protobuf_scrape_summary():
    rows, _ = parse_protobuf_scrape(_delimited(_summary_family()))
    by_name = {r[0]["__name__"]: r for r in rows}
    assert by_name["rpc_duration_count"][2] == 10.0
    assert by_name["rpc_duration_sum"][2] == 12.5
    assert by_name["rpc_duration"][0]["quantile"] == "0.99"
    assert by_name["rpc_duration"][2] == 1.5


def test_protobuf_scrape_classic_histogram():
    rows, _ = parse_protobuf_scrape(_delimited(_classic_hist_family()))
    got = {(r[0]["__name__"], r[0].get("le")): r[2] for r in rows}
    assert got[("req_latency_count", None)] == 7.0
    assert got[("req_latency_sum", None)] == 3.2
    assert got[("req_latency_bucket", "0.5")] == 3.0
    assert got[("req_latency_bucket", "+Inf")] == 7.0


def test_protobuf_scrape_native_histogram():
    rows, _ = parse_protobuf_scrape(_delimited(_native_hist_family()))
    assert len(rows) == 1
    labels, t, h, _created = rows[0]
    assert labels["__name__"] == "native_latency" and t == 60_000
    assert h["schema"] == 3 and h["count"] == 3.0 and h["sum"] == 5.0
    # deltas [2, -1] cumulate to absolute [2.0, 1.0]
    assert h["pos_buckets"] == [2.0, 1.0]
    assert h["pos_spans"] == [{"offset": 0, "length": 2}]


def test_protobuf_scrape_classic_plus_native():
    fam = _delimited(_native_hist_family())
    rows, _ = parse_protobuf_scrape(fam, parse_classic_histograms=True)
    names = sorted(r[0]["__name__"] for r in rows)
    assert names == [
        "native_latency",
        "native_latency_bucket",
        "native_latency_count",
        "native_latency_sum",
    ]


def test_protobuf_df_to_samples(spark):
    body = _delimited(
        _counter_family(), _classic_hist_family(), _native_hist_family()
    )
    df = spark.createDataFrame([(bytearray(body),)], "body binary")
    out = to_samples(parse_protobuf_df(df)).orderBy("name").collect()
    names = [r["name"] for r in out]
    assert "http_requests_total" in names and "native_latency" in names
    native = next(r for r in out if r["name"] == "native_latency")
    assert native["hist"]["schema"] == 3
    assert list(native["hist"]["pos_buckets"]) == [2.0, 1.0]
    counter = next(r for r in out if r["name"] == "http_requests_total")
    assert counter["value"] == 42.0 and counter["st"] == 100_000


# --- OTLP --------------------------------------------------------------------


def _kv(k: str, v: str) -> bytes:
    return _ld(1, k.encode()) + _ld(2, _ld(1, v.encode()))


def _fix64(fno: int, value: int) -> bytes:
    return _write_varint(fno << 3 | 1) + struct.pack("<Q", value)


def _otlp_request(metrics: list[bytes], resource_kvs: list[bytes]) -> bytes:
    scope = b"".join(_ld(2, m) for m in metrics)
    resource = b"".join(_ld(1, kv) for kv in resource_kvs)
    rm = _ld(1, resource) + _ld(2, scope)
    return _ld(1, rm)


def _otlp_number_dp(t_ns: int, value: float, attrs: list[bytes] = ()) -> bytes:
    out = _fix64(3, t_ns) + _df64(4, value)
    for a in attrs:
        out += _ld(7, a)
    return out


def test_otlp_gauge_and_monotonic_sum():
    gauge = _ld(1, b"mem.usage") + _ld(3, b"By") + _ld(
        5, _ld(1, _otlp_number_dp(60_000_000_000, 3.5))
    )
    # Sum{1: dp, 2: temporality=2 cumulative, 3: monotonic}
    summ = _ld(1, b"http.requests") + _ld(7,
        _ld(1, _otlp_number_dp(60_000_000_000, 9.0,
                               [_kv("method", "GET")]))
        + _vint(2, 2) + _vint(3, 1)
    )
    body = _otlp_request(
        [gauge, summ],
        [_kv("service.name", "api"), _kv("service.namespace", "prod"),
         _kv("service.instance.id", "i-1")],
    )
    rows = otlp_to_rows(body)
    by_name = {r[0]["__name__"]: r for r in rows}
    g = by_name["mem_usage_bytes"]
    assert g[0]["job"] == "prod/api" and g[0]["instance"] == "i-1"
    assert g[1] == 60_000 and g[2] == 3.5
    s = by_name["http_requests_total"]
    assert s[0]["method"] == "GET" and s[2] == 9.0


def test_otlp_delta_sum_rejected():
    summ = _ld(1, b"x") + _ld(7,
        _ld(1, _otlp_number_dp(1_000_000, 1.0)) + _vint(2, 1) + _vint(3, 1)
    )
    assert otlp_to_rows(_otlp_request([summ], [])) == []


def test_otlp_explicit_histogram():
    # bounds [0.5], bucket_counts [3, 4] → le=0.5:3, +Inf:7
    dp = (
        _fix64(3, 60_000_000_000)
        + _fix64(4, 7)
        + _df64(5, 3.2)
        + _ld(6, struct.pack("<QQ", 3, 4))
        + _ld(7, struct.pack("<d", 0.5))
    )
    hist = _ld(1, b"latency") + _ld(3, b"s") + _ld(9, _ld(1, dp) + _vint(2, 2))
    rows = otlp_to_rows(_otlp_request([hist], []))
    got = {(r[0]["__name__"], r[0].get("le")): r[2] for r in rows}
    assert got[("latency_seconds_count", None)] == 7.0
    assert got[("latency_seconds_sum", None)] == 3.2
    assert got[("latency_seconds_bucket", "0.5")] == 3.0
    assert got[("latency_seconds_bucket", "+Inf")] == 7.0


def test_otlp_exponential_histogram_to_native():
    # scale 2, positive offset 1, counts [1, 0, 2]
    pos = _vint(1, _zz(1)) + _ld(2, _write_varint(1) + _write_varint(0)
                                 + _write_varint(2))
    dp = (
        _fix64(3, 60_000_000_000)
        + _fix64(4, 4)
        + _df64(5, 10.0)
        + _vint(6, _zz(2))
        + _fix64(7, 1)
        + _ld(8, pos)
    )
    ehist = _ld(1, b"rt") + _ld(10, _ld(1, dp) + _vint(2, 2))
    rows = otlp_to_rows(_otlp_request([ehist], []))
    assert len(rows) == 1
    h = rows[0][2]
    assert h["schema"] == 2 and h["count"] == 4.0 and h["zero_count"] == 1.0
    # otlp indices 1..3 → prom indices 2..4; zero-count bucket dropped →
    # spans [offset 2 len 1, gap 1 len 1]
    assert h["pos_spans"] == [
        {"offset": 2, "length": 1},
        {"offset": 1, "length": 1},
    ]
    assert h["pos_buckets"] == [1.0, 2.0]


def test_otlp_target_info():
    gauge = _ld(1, b"g") + _ld(5, _ld(1, _otlp_number_dp(1_000_000, 1.0)))
    body = _otlp_request(
        [gauge],
        [_kv("service.name", "api"), _kv("host.name", "box1")],
    )
    rows = otlp_to_rows(body)
    ti = [r for r in rows if r[0]["__name__"] == "target_info"]
    assert len(ti) == 1
    assert ti[0][0]["host_name"] == "box1" and ti[0][2] == 1.0


def test_convert_buckets_layout_downscale():
    # scale_down=1: indices (0..3 at offset 0) merge pairwise
    spans, buckets = convert_buckets_layout([1, 2, 3, 4], 0, 1)
    # idx(i) = ((0+i)>>1)+1 → [1,1,2,2] → {1:3, 2:7}
    assert spans == [{"offset": 1, "length": 2}]
    assert buckets == [3.0, 7.0]


def test_normalize_metric_name():
    assert normalize_metric_name("http.requests", "", "sum", True) == (
        "http_requests_total"
    )
    assert normalize_metric_name("cpu.util", "1", "gauge") == "cpu_util_ratio"
    assert normalize_metric_name("disk.io", "By/s", "gauge") == (
        "disk_io_bytes_per_second"
    )


def test_otlp_receiver_spool(spark, tmp_path):
    from prometheus_spark.sources.otlp import OTLPReceiver

    gauge = _ld(1, b"up.count") + _ld(5, _ld(1, _otlp_number_dp(
        60_000_000_000, 2.0)))
    body = _otlp_request([gauge], [_kv("service.name", "api")])
    recv = OTLPReceiver(str(tmp_path / "spool"))
    n = recv.handle_body(body)
    assert n == 1
    from prometheus_spark.sources.remote_write import spool_to_samples

    df = spool_to_samples(spark, str(tmp_path / "spool"))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["value"] == 2.0
    assert rows[0]["labels"]["job"] == "api"


def test_otlp_exemplar_translation(spark, tmp_path):
    """OTLP datapoint exemplars (Exemplar{time=2, as_double=3, span_id=4,
    trace_id=5, filtered_attributes=7}) translate to trace_id/span_id-
    labelled prometheus exemplars attached to the translated series, and
    flow through the receiver's exemplar spool."""
    from prometheus_spark.sources.otlp import OTLPReceiver

    # exemplar: t=30s, value=1.25, trace/span ids, one filtered attribute
    ex = (
        _fix64(2, 30_000_000_000)
        + _df64(3, 1.25)
        + _ld(4, bytes.fromhex("00f067aa0ba902b7"))
        + _ld(5, bytes.fromhex("5b8efff798038103d269b633813fc60c"))
        + _ld(7, _kv("cluster", "c1"))
    )
    dp = _otlp_number_dp(60_000_000_000, 9.0) + _ld(5, ex)
    summ = _ld(1, b"http.requests") + _ld(7, _ld(1, dp) + _vint(2, 2) + _vint(3, 1))
    body = _otlp_request([summ], [_kv("service.name", "api")])

    rows, exemplars = otlp_to_rows(body, with_exemplars=True)
    assert len(exemplars) == 1
    e = exemplars[0]
    assert e["series_labels"]["__name__"] == "http_requests_total"
    assert e["labels"]["trace_id"] == "5b8efff798038103d269b633813fc60c"
    assert e["labels"]["span_id"] == "00f067aa0ba902b7"
    assert e["labels"]["cluster"] == "c1"
    assert e["value"] == 1.25 and e["t"] == 30_000

    recv = OTLPReceiver(str(tmp_path / "spool"))
    recv.handle_body(body)
    got = recv.exemplars_df(spark).collect()
    assert len(got) == 1 and got[0]["ex_labels"]["trace_id"] == e["labels"]["trace_id"]


def test_otlp_config_knobs():
    """config.go OTLPConfig knobs: resource-attribute promotion,
    ignore list, keep_identifying in target_info, and the
    translation_strategy name modes."""
    from prometheus_spark.sources.otlp import normalize_metric_name

    assert normalize_metric_name("a.b", "s", "gauge") == "a_b_seconds"
    assert (
        normalize_metric_name("a.b", "s", "gauge",
                              strategy="UnderscoreEscapingWithoutSuffixes")
        == "a_b"
    )
    assert (
        normalize_metric_name("a.b", "s", "gauge",
                              strategy="NoUTF8EscapingWithSuffixes")
        == "a.b_seconds"
    )
    assert (
        normalize_metric_name("a.b", "s", "gauge", strategy="NoTranslation")
        == "a.b"
    )

    gauge = _ld(1, b"m") + _ld(5, _ld(1, _otlp_number_dp(60_000_000_000, 5.0)))
    body = _otlp_request(
        [gauge],
        [_kv("service.name", "svc"), _kv("service.instance.id", "i1"),
         _kv("k8s.cluster.name", "c1"), _kv("noise", "x")],
    )
    rows = otlp_to_rows(
        body,
        promote_resource_attributes=["k8s.cluster.name"],
        ignore_resource_attributes=["noise"],
        keep_identifying_resource_attributes=True,
    )
    by_name = {}
    for labels, t, v, st in rows:
        by_name.setdefault(labels["__name__"], []).append((labels, v))
    [(mlabels, _)] = by_name["m"]
    assert mlabels["k8s_cluster_name"] == "c1"  # promoted
    assert "noise" not in mlabels
    [(tilabels, _)] = by_name["target_info"]
    assert tilabels["service_name"] == "svc"  # keep_identifying
    assert "noise" not in tilabels  # ignored everywhere


# --- OTLP delta temporality (write_otlp_handler.go OTLPOptions) -------------


def _delta_sum_body(values_ts, monotonic=1, st_ns=None, name=b"some.delta.total"):
    dps = b""
    for t_ns, v in values_ts:
        dp = _fix64(3, t_ns) + _df64(4, v)
        if st_ns is not None:
            dp = _fix64(2, st_ns) + dp
        dps += _ld(1, dp)
    summ = _ld(1, name) + _ld(7, dps + _vint(2, 1) + _vint(3, monotonic))
    return _otlp_request([summ], [])


def test_otlp_delta_to_cumulative():
    """Mirror of write_otlp_handler_test.go TestOTLPDelta: delta values
    0,1,2 at t,t+1s,t+2s convert to cumulative 0,1,3."""
    from prometheus_spark.sources.otlp import DeltaToCumulative

    body = _delta_sum_body(
        [(0, 0.0), (1_000_000_000, 1.0), (2_000_000_000, 2.0)], monotonic=0
    )
    rows = otlp_to_rows(body, delta_state=DeltaToCumulative())
    assert [(r[1], r[2]) for r in rows] == [(0, 0.0), (1_000, 1.0), (2_000, 3.0)]
    # non-monotonic sum → gauge-style name, no _total
    assert rows[0][0]["__name__"] == "some_delta_total"


def test_otlp_delta_state_spans_requests():
    from prometheus_spark.sources.otlp import DeltaToCumulative

    state = DeltaToCumulative()
    r1 = otlp_to_rows(_delta_sum_body([(0, 5.0)]), delta_state=state)
    r2 = otlp_to_rows(
        _delta_sum_body([(1_000_000_000, 7.0)]), delta_state=state
    )
    assert r1[0][2] == 5.0 and r2[0][2] == 12.0
    # out-of-order delta dropped (processor requires time order per series)
    r3 = otlp_to_rows(
        _delta_sum_body([(500_000_000, 99.0)]), delta_state=state
    )
    assert r3 == []


def test_otlp_delta_new_stream_resets():
    from prometheus_spark.sources.otlp import DeltaToCumulative

    state = DeltaToCumulative()
    otlp_to_rows(_delta_sum_body([(1_000_000_000, 5.0)], st_ns=0),
                 delta_state=state)
    # restarted source: new start timestamp → totals reset
    out = otlp_to_rows(
        _delta_sum_body([(3_000_000_000, 2.0)], st_ns=2_000_000_000),
        delta_state=state,
    )
    assert out[0][2] == 2.0 and out[0][3] == 2_000


def test_otlp_native_delta_stores_raw():
    body = _delta_sum_body([(0, 5.0), (1_000_000_000, 7.0)])
    rows = otlp_to_rows(body, native_delta=True)
    assert [(r[1], r[2]) for r in rows] == [(0, 5.0), (1_000, 7.0)]


def test_otlp_delta_flags_mutually_exclusive():
    from prometheus_spark.sources.otlp import DeltaToCumulative, OTLPReceiver

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at the same time"):
        otlp_to_rows(b"", delta_state=DeltaToCumulative(), native_delta=True)
    with _pytest.raises(ValueError, match="at the same time"):
        OTLPReceiver("/tmp/_never", convert_delta=True, native_delta=True)


def test_otlp_delta_classic_histogram_accumulates():
    from prometheus_spark.sources.otlp import DeltaToCumulative

    def hdp(t_ns, count, s, buckets):
        return (
            _fix64(3, t_ns)
            + _fix64(4, count)
            + _df64(5, s)
            + _ld(6, struct.pack("<" + "Q" * len(buckets), *buckets))
            + _ld(7, struct.pack("<d", 0.5))
        )

    state = DeltaToCumulative()
    hist1 = _ld(1, b"lat") + _ld(3, b"s") + _ld(
        9, _ld(1, hdp(1_000_000_000, 3, 1.5, [2, 1])) + _vint(2, 1)
    )
    hist2 = _ld(1, b"lat") + _ld(3, b"s") + _ld(
        9, _ld(1, hdp(2_000_000_000, 2, 1.0, [1, 1])) + _vint(2, 1)
    )
    otlp_to_rows(_otlp_request([hist1], []), delta_state=state)
    rows = otlp_to_rows(_otlp_request([hist2], []), delta_state=state)
    got = {(r[0]["__name__"], r[0].get("le")): r[2] for r in rows}
    assert got[("lat_seconds_count", None)] == 5.0
    assert got[("lat_seconds_sum", None)] == 2.5
    assert got[("lat_seconds_bucket", "0.5")] == 3.0  # 2+1
    assert got[("lat_seconds_bucket", "+Inf")] == 5.0


def test_otlp_delta_exponential_histogram_accumulates():
    from prometheus_spark.sources.otlp import DeltaToCumulative

    def edp(t_ns, count, s, counts):
        pos = _vint(1, _zz(1)) + _ld(
            2, b"".join(_write_varint(c) for c in counts)
        )
        return (
            _fix64(3, t_ns)
            + _fix64(4, count)
            + _df64(5, s)
            + _vint(6, _zz(2))  # scale 2
            + _ld(8, pos)
        )

    state = DeltaToCumulative()
    m1 = _ld(1, b"exp") + _ld(10, _ld(1, edp(1_000_000_000, 3, 3.0, [1, 2]))
                              + _vint(2, 1))
    m2 = _ld(1, b"exp") + _ld(10, _ld(1, edp(2_000_000_000, 2, 2.0, [2, 0]))
                              + _vint(2, 1))
    otlp_to_rows(_otlp_request([m1], []), delta_state=state)
    rows = otlp_to_rows(_otlp_request([m2], []), delta_state=state)
    h = rows[0][2]
    assert h["count"] == 5.0 and h["sum"] == 5.0
    assert list(h["pos_buckets"]) == [3.0, 2.0]


def test_otlp_delta_property_cumsum():
    """Property: for any in-order delta sequence, the converted values
    are exact prefix sums (the deltatocumulative invariant)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from prometheus_spark.sources.otlp import DeltaToCumulative

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(-1e9, 1e9, allow_nan=False), min_size=1, max_size=30))
    def check(deltas):
        state = DeltaToCumulative()
        running = 0.0
        for i, d in enumerate(deltas):
            got = state.add_number(("s",), i + 1, d, None)
            running += d
            assert got is not None
            assert got[0] == pytest.approx(running, rel=1e-9, abs=1e-9)

    check()


def test_otlp_delta_property_ooo_never_corrupts():
    """Property: out-of-order or duplicate-timestamp deltas are dropped
    and never perturb the running total."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from prometheus_spark.sources.otlp import DeltaToCumulative

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 20), st.floats(-100, 100, allow_nan=False)),
            min_size=1,
            max_size=40,
        )
    )
    def check(points):
        state = DeltaToCumulative()
        expected = 0.0
        last_t = None
        for t, d in points:
            got = state.add_number(("s",), t, d, None)
            if last_t is None or t > last_t:
                expected += d
                last_t = t
                assert got is not None and got[0] == pytest.approx(expected)
            else:
                assert got is None  # dropped, total untouched

    check()


def test_otlp_delta_reset_wins_over_ooo():
    """Regression (code review): a restarted stream (new start ts) must
    reset even when its first sample timestamp doesn't exceed the dead
    stream's last one."""
    from prometheus_spark.sources.otlp import DeltaToCumulative

    state = DeltaToCumulative()
    assert state.add_number(("s",), 10, 100.0, 1)[0] == 100.0
    # restart: new st=5, first t == old last t → reset, not drop
    got = state.add_number(("s",), 10, 7.0, 5)
    assert got == (7.0, 5)


def test_otlp_delta_state_bounded():
    from prometheus_spark.sources.otlp import DeltaToCumulative

    state = DeltaToCumulative(max_series=10)
    for i in range(25):
        state.add_number((f"s{i}",), i, 1.0, None)
    assert len(state._state) <= 10
    # the most recently updated series survive
    assert ("s24",) in state._state


def test_otlp_type_and_unit_labels():
    """type-and-unit-labels covers the OTLP path too (otlptranslator
    helper.go:165): __type__ from the OTLP metric kind, __unit__ from
    the normalized unit."""
    gauge = _ld(1, b"mem.usage") + _ld(3, b"By") + _ld(
        5, _ld(1, _otlp_number_dp(60_000_000_000, 3.5))
    )
    summ = _ld(1, b"reqs") + _ld(7,
        _ld(1, _otlp_number_dp(60_000_000_000, 9.0)) + _vint(2, 2) + _vint(3, 1)
    )
    body = _otlp_request([gauge, summ], [])
    rows = otlp_to_rows(body, enable_type_and_unit_labels=True)
    by = {r[0]["__name__"]: r[0] for r in rows}
    g = by["mem_usage_bytes"]
    assert g["__type__"] == "gauge" and g["__unit__"] == "bytes"
    c = by["reqs_total"]
    assert c["__type__"] == "counter" and "__unit__" not in c
    # off by default
    rows = otlp_to_rows(body)
    assert all("__type__" not in r[0] for r in rows)
