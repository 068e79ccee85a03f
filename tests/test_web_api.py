"""Tests for the /api/v1 veneer (web/api/v1/api.go parity surface)."""

import json
import urllib.request

import pytest

from prometheus_spark.storage import samples_from_rows
from prometheus_spark.web import PromAPI, marshal_float

M = 60_000


@pytest.fixture()
def api(spark):
    from prometheus_spark.engine import PromQLEngine

    rows = []
    for i in range(11):
        rows.append(({"__name__": "m", "job": "a"}, i * M, float(i)))
        rows.append(({"__name__": "m", "job": "b"}, i * M, float(i * 2)))
    samples = samples_from_rows(spark, rows).cache()
    return PromAPI(PromQLEngine(spark, samples))


def test_instant_vector(api):
    code, resp = api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    assert code == 200 and resp["status"] == "success"
    data = resp["data"]
    assert data["resultType"] == "vector"
    got = {e["metric"]["job"]: e["value"] for e in data["result"]}
    assert got["a"] == [600, "10"] and got["b"] == [600, "20"]


def test_scalar_query(api):
    code, resp = api.handle(
        "/api/v1/query", {"query": ["1 + 2"], "time": ["60"]}
    )
    assert code == 200
    assert resp["data"] == {"resultType": "scalar", "result": [60, "3"]}


def test_string_query(api):
    code, resp = api.handle(
        "/api/v1/query", {"query": ['"hello"'], "time": ["60"]}
    )
    assert code == 200
    assert resp["data"] == {"resultType": "string", "result": [60, "hello"]}


def test_range_matrix(api):
    code, resp = api.handle(
        "/api/v1/query_range",
        {"query": ["m{job='a'}"], "start": ["0"], "end": ["180"],
         "step": ["60"]},
    )
    assert code == 200
    data = resp["data"]
    assert data["resultType"] == "matrix" and len(data["result"]) == 1
    assert data["result"][0]["values"] == [
        [0, "0"], [60, "1"], [120, "2"], [180, "3"]
    ]


def test_range_validation(api):
    code, _ = api.handle(
        "/api/v1/query_range",
        {"query": ["m"], "start": ["100"], "end": ["0"], "step": ["60"]},
    )
    assert code == 400
    code, _ = api.handle(
        "/api/v1/query_range",
        {"query": ["m"], "start": ["0"], "end": ["100"], "step": ["0"]},
    )
    assert code == 400


def test_bad_query_returns_400(api):
    code, resp = api.handle("/api/v1/query", {"query": ["m{"], "time": ["0"]})
    assert code == 400 and resp["status"] == "error"


def test_series_and_labels(api):
    code, resp = api.handle("/api/v1/series", {"match[]": ["m{job='a'}"]})
    assert code == 200
    assert resp["data"] == [{"__name__": "m", "job": "a"}]

    code, resp = api.handle("/api/v1/labels", {})
    assert resp["data"] == ["__name__", "job"]

    code, resp = api.handle("/api/v1/label/job/values", {})
    assert resp["data"] == ["a", "b"]


def test_marshal_float_go_forms():
    assert marshal_float(3.0) == "3"
    assert marshal_float(0.5) == "0.5"
    assert marshal_float(float("inf")) == "+Inf"
    assert marshal_float(float("nan")) == "NaN"
    # inside the 'f' window repr would flip to exponent; Go keeps 'f'
    assert marshal_float(1e17) == "100000000000000000"
    assert marshal_float(1e-7) == "1e-07"
    assert marshal_float(1.5e21) == "1.5e+21"


def test_histogram_rendering(spark):
    from prometheus_spark.engine import PromQLEngine

    hist = {
        "schema": 0, "zero_threshold": 0.001, "zero_count": 2.0,
        "count": 5.0, "sum": 10.0,
        "pos_spans": [{"offset": 1, "length": 2}],
        "pos_buckets": [1.0, 2.0],
        "neg_spans": [], "neg_buckets": [],
        "custom_values": [], "counter_reset_hint": 0,
    }
    samples = samples_from_rows(
        spark, [({"__name__": "h"}, 0, hist)]
    )
    api = PromAPI(PromQLEngine(spark, samples))
    code, resp = api.handle("/api/v1/query", {"query": ["h"], "time": ["0"]})
    assert code == 200
    entry = resp["data"]["result"][0]
    t, h = entry["histogram"]
    assert t == 0 and h["count"] == "5" and h["sum"] == "10"
    # schema 0: bucket idx 1 → (1,2], idx 2 → (2,4]; zero bucket rule 3
    assert h["buckets"] == [
        [3, "-0.001", "0.001", "2"],
        [0, "1", "2", "1"],
        [0, "2", "4", "2"],
    ]


def test_http_server_roundtrip(api):
    srv = api.server()
    import threading

    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/query?query=m&time=600"
        ) as r:
            body = json.loads(r.read())
        assert body["status"] == "success"
        assert len(body["data"]["result"]) == 2

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/status/buildinfo"
        ) as r:
            assert json.loads(r.read())["data"]["version"].endswith("-spark")

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/federate?match[]=m%7Bjob%3D'a'%7D&time=600"
        ) as r:
            text = r.read().decode()
        assert 'm{job="a"} 10' in text
    finally:
        srv.shutdown()


def test_rules_alerts_targets_endpoints(api):
    from prometheus_spark.sources.scrape import ScrapeManager, ScrapeTarget
    from prometheus_spark.streaming import parse_rule_groups

    api.rule_groups = parse_rule_groups(
        """
groups:
  - name: g
    interval: 30s
    rules:
      - record: r:sum
        expr: sum(m)
      - alert: A
        expr: m > 100
        for: 5m
"""
    )
    api.scrape_manager = ScrapeManager(
        "/tmp/_api_spool_unused", [ScrapeTarget("http://x:9/m", {"job": "j"})]
    )
    api.record_alerts([("A", {"alertname": "A", "job": "a"}, {"summary": "s"}, "firing", 60_000, 1.0)])

    code, resp = api.handle("/api/v1/rules", {})
    g = resp["data"]["groups"][0]
    assert g["interval"] == 30
    assert [r["type"] for r in g["rules"]] == ["recording", "alerting"]
    assert g["rules"][1]["duration"] == 300

    code, resp = api.handle("/api/v1/alerts", {})
    assert resp["data"]["alerts"][0]["state"] == "firing"
    assert resp["data"]["alerts"][0]["activeAt"] == 60

    code, resp = api.handle("/api/v1/targets", {})
    tgt = resp["data"]["activeTargets"][0]
    assert tgt["labels"]["job"] == "j" and tgt["scrapeUrl"].endswith("/m")


def test_query_exemplars(spark, api):
    from prometheus_spark.storage.exemplars import exemplars_from_openmetrics

    body = """# TYPE m counter
m_total{job="a"} 5.0 100 # {trace_id="abc"} 0.67 99.5
m_total{job="b"} 7.0 100 # {trace_id="def"} 1.2 99.8
# EOF
"""
    api.exemplars = exemplars_from_openmetrics(spark, body)
    code, resp = api.handle(
        "/api/v1/query_exemplars",
        {"match[]": ['m_total{job="a"}'], "start": ["0"], "end": ["200"]},
    )
    assert code == 200
    data = resp["data"]
    assert len(data) == 1
    assert data[0]["seriesLabels"]["job"] == "a"
    ex = data[0]["exemplars"][0]
    assert ex["labels"] == {"trace_id": "abc"}
    assert ex["value"] == "0.67" and ex["timestamp"] == 99500 / 1000

    # no exemplar store → empty result, not an error
    api.exemplars = None
    code, resp = api.handle(
        "/api/v1/query_exemplars", {"match[]": ["m_total"]}
    )
    assert code == 200 and resp["data"] == []


def test_tsdb_stats(api):
    code, resp = api.handle("/api/v1/status/tsdb", {})
    assert code == 200
    data = resp["data"]
    assert data["headStats"]["numSeries"] == 2
    assert data["seriesCountByMetricName"] == [{"name": "m", "value": 2}]
    by_label = {e["name"]: e["value"] for e in data["labelValueCountByLabelName"]}
    assert by_label["job"] == 2 and by_label["__name__"] == 1


def test_delete_series_and_clean(api):
    # both jobs visible before deletion
    code, resp = api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    assert len(resp["data"]["result"]) == 2

    code, resp = api.handle(
        "/api/v1/admin/tsdb/delete_series", {"match[]": ['m{job="a"}']}
    )
    assert code == 204
    code, resp = api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    result = resp["data"]["result"]
    assert len(result) == 1 and result[0]["metric"]["job"] == "b"
    assert len(api.tombstones.stones) == 1

    code, _ = api.handle("/api/v1/admin/tsdb/clean_tombstones", {})
    assert code == 204 and api.tombstones.stones == []
    # deletion stays applied after compaction
    code, resp = api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    assert len(resp["data"]["result"]) == 1

    # time-bounded tombstone: drop job=b samples before t=300s only
    code, _ = api.handle(
        "/api/v1/admin/tsdb/delete_series",
        {"match[]": ['m{job="b"}'], "start": ["0"], "end": ["240"]},
    )
    assert code == 204
    code, resp = api.handle("/api/v1/query", {"query": ["count_over_time(m[10m])"], "time": ["600"]})
    # 11 points minus the 5 at t=0..240s
    assert resp["data"]["result"][0]["value"][1] == "6"

    code, resp = api.handle(
        "/api/v1/admin/tsdb/delete_series", {"match[]": []}
    )
    assert code == 400


def test_parse_query_and_status(api):
    code, resp = api.handle(
        "/api/v1/parse_query", {"query": ["sum by (job) (rate(m[5m]))"]}
    )
    assert code == 200
    ast = resp["data"]
    assert ast["type"] == "AggregateExpr"
    inner = ast["expr"]
    assert inner["type"] == "Call" and inner["func"] == "rate"
    json.dumps(ast)  # must be JSON-serializable end-to-end

    code, resp = api.handle("/api/v1/parse_query", {"query": ["sum("]})
    assert code == 400

    api.flags = {"storage.tsdb.retention.time": "15d"}
    code, resp = api.handle("/api/v1/status/flags", {})
    assert code == 200 and resp["data"]["storage.tsdb.retention.time"] == "15d"

    api.config_yaml = "global:\n  scrape_interval: 15s\n"
    code, resp = api.handle("/api/v1/status/config", {})
    assert code == 200 and "scrape_interval" in resp["data"]["yaml"]

    code, resp = api.handle("/api/v1/status/runtimeinfo", {})
    assert code == 200 and resp["data"]["reloadConfigSuccess"] is True


def test_query_stats_param(api):
    # stats=<non-empty> adds a stats.timings object to data
    # (util/stats/query_stats.go:97)
    code, resp = api.handle(
        "/api/v1/query", {"query": ["m"], "time": ["600"], "stats": ["true"]}
    )
    assert code == 200
    t = resp["data"]["stats"]["timings"]
    assert set(t) == {
        "evalTotalTime", "resultSortTime", "queryPreparationTime",
        "innerEvalTime", "execQueueTime", "execTotalTime",
    }
    assert t["evalTotalTime"] >= t["queryPreparationTime"] >= 0
    # absent without the param
    code, resp = api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    assert "stats" not in resp["data"]
    code, resp = api.handle(
        "/api/v1/query_range",
        {"query": ["m"], "start": ["0"], "end": ["300"], "step": ["60"],
         "stats": ["all"]},
    )
    assert code == 200 and "timings" in resp["data"]["stats"]


def test_snapshot_endpoint(api, spark, tmp_path):
    # unconfigured → error (api.go snapshot requires admin storage)
    code, resp = api.handle("/api/v1/admin/tsdb/snapshot", {})
    assert code == 500
    api.snapshot_dir = str(tmp_path)
    code, resp = api.handle("/api/v1/admin/tsdb/snapshot", {})
    assert code == 200
    name = resp["data"]["name"]
    snap = spark.read.parquet(str(tmp_path / name))
    assert snap.count() == 22  # full samples view persisted
    assert {"sig", "labels", "t", "value"} <= set(snap.columns)


def test_labels_scoping_and_limit(api):
    # match[] scopes label names to matching series (api.go:818 labelNames)
    code, resp = api.handle("/api/v1/labels", {"match[]": ['m{job="a"}']})
    assert code == 200 and resp["data"] == ["__name__", "job"]
    # time-scoped label values: nothing before t=0 → after end=-1ms, empty
    code, resp = api.handle(
        "/api/v1/label/job/values", {"end": ["-1"]}
    )
    assert code == 200 and resp["data"] == []
    # limit truncates with a warning (api.go:890)
    code, resp = api.handle("/api/v1/label/job/values", {"limit": ["1"]})
    assert code == 200 and resp["data"] == ["a"]
    assert resp["warnings"] == ["results truncated due to limit"]
    code, resp = api.handle(
        "/api/v1/series", {"match[]": ["m"], "limit": ["1"]}
    )
    assert code == 200 and len(resp["data"]) == 1 and "warnings" in resp
    # negative limit rejected
    code, resp = api.handle("/api/v1/labels", {"limit": ["-1"]})
    assert code == 400


def test_features_endpoint(api):
    code, resp = api.handle("/api/v1/features", {})
    assert code == 200
    data = resp["data"]
    assert data["promql_functions"]["rate"] is True
    assert data["promql_functions"]["histogram_quantile"] is True
    assert data["promql_operators"]["sum"] is True
    assert data["promql"]["fill"] is True and data["promql"]["anchored"] is True


def test_scrape_pools_and_blocks(api, spark, tmp_path):
    from prometheus_spark.sources.scrape import ScrapeManager, ScrapeTarget

    code, resp = api.handle("/api/v1/scrape_pools", {})
    assert code == 200 and resp["data"] == {"scrapePools": []}
    api.scrape_manager = ScrapeManager(
        str(tmp_path / "spool"),
        [ScrapeTarget("http://a:1/m", {"job": "jb"}),
         ScrapeTarget("http://b:1/m", {"job": "ja"})],
    )
    code, resp = api.handle("/api/v1/scrape_pools", {})
    assert resp["data"] == {"scrapePools": ["ja", "jb"]}

    code, resp = api.handle("/api/v1/status/tsdb/blocks", {})
    assert resp["data"] == {"blocks": []}
    from prometheus_spark.storage import samples_from_rows, write_samples

    write_samples(
        samples_from_rows(spark, [({"__name__": "m"}, 0, 1.0)]),
        str(tmp_path / "blocks"),
    )
    api.blocks_dir = str(tmp_path / "blocks")
    code, resp = api.handle("/api/v1/status/tsdb/blocks", {})
    assert resp["data"]["blocks"] == [
        {"ulid": "t_bucket=0", "minTime": 0, "maxTime": 7_200_000}
    ]


def test_instant_matrix_result(api):
    # top-level matrix selector in an instant query → resultType matrix
    # of raw samples (api.go / engine.go Matrix-typed instant query)
    code, resp = api.handle(
        "/api/v1/query", {"query": ["m[2m]"], "time": ["180"]}
    )
    assert code == 200, resp
    data = resp["data"]
    assert data["resultType"] == "matrix"
    by_job = {s["metric"]["job"]: s["values"] for s in data["result"]}
    # (60s,180s] window → samples at 120s and 180s, raw timestamps
    assert by_job["a"] == [[120, "2"], [180, "3"]]
    assert by_job["b"] == [[120, "4"], [180, "6"]]


def test_active_query_tracker(api, tmp_path):
    from prometheus_spark.web.querylog import ActiveQueryTracker

    tr = ActiveQueryTracker(str(tmp_path / "data"), max_concurrent=4)
    assert tr.unfinished == []
    slot = tr.insert("sum(m)")
    active = tr.active()
    assert [e["query"] for e in active] == ["sum(m)"]
    tr.delete(slot)
    assert tr.active() == []
    # queries active during a "crash" surface on the next start
    tr.insert("rate(m[5m])")
    tr.close()
    tr2 = ActiveQueryTracker(str(tmp_path / "data"), max_concurrent=4)
    assert [e["query"] for e in tr2.unfinished] == ["rate(m[5m])"]
    tr2.close()


def test_query_tracked_through_api(api, tmp_path):
    from prometheus_spark.web.querylog import ActiveQueryTracker

    api.query_tracker = ActiveQueryTracker(str(tmp_path / "d2"))
    code, _ = api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    assert code == 200
    assert api.query_tracker.active() == []  # slot released
    code, _ = api.handle("/api/v1/query", {"query": ["m{"], "time": ["600"]})
    assert code == 400
    assert api.query_tracker.active() == []  # released on error too
    api.query_tracker.close()


def test_openapi_yaml(api):
    import yaml

    code, resp = api.handle("/api/v1/openapi.yaml", {})
    assert code == 200
    spec = yaml.safe_load(resp["__text__"])
    assert spec["openapi"].startswith("3.")
    assert "/api/v1/query" in spec["paths"]
    assert "/api/v1/search/metric_names" in spec["paths"]


def test_query_tracker_byte_budget(tmp_path):
    """The slot limit is BYTES of encoded JSON: a query full of quotes/
    backslashes/non-ASCII (which expand when escaped) must still fit in
    one ENTRY_SIZE slot and not spill into its neighbour."""
    import json as _json

    from prometheus_spark.web.querylog import ENTRY_SIZE, ActiveQueryTracker

    t = ActiveQueryTracker(str(tmp_path), max_concurrent=2)
    nasty = '"\\' * 600 + "€" * 200  # escapes blow up the encoding
    off1 = t.insert(nasty)
    off2 = t.insert("second")  # neighbouring slot must be intact
    active = t.active()
    assert any(e["query"] == "second" for e in active)
    blob = bytes(t._mm[off1:off1 + ENTRY_SIZE])
    entry = blob.rstrip(b"\x00")
    assert len(entry) <= ENTRY_SIZE
    assert _json.loads(entry[:-1])  # minus trailing comma → valid JSON
    t.delete(off1)
    t.delete(off2)
    t.close()


def test_lifecycle_endpoints(api):
    """/-/healthy and /-/ready always answer; /-/reload and /-/quit are
    403 until lifecycle is enabled, then reload invokes the hook
    (web.go lifecycle routes; --web.enable-lifecycle gating)."""
    import threading
    import urllib.error
    import urllib.request

    srv = api.server()
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/-/healthy") as r:
            assert r.status == 200 and b"Healthy" in r.read()
        with urllib.request.urlopen(f"{base}/-/ready") as r:
            assert r.status == 200 and b"Ready" in r.read()
        req = urllib.request.Request(f"{base}/-/reload", data=b"", method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("reload must be 403 when lifecycle disabled")
        except urllib.error.HTTPError as e:
            assert e.code == 403
        calls = []
        api.lifecycle_enabled = True
        api.reload_fn = lambda: calls.append(1)
        req = urllib.request.Request(f"{base}/-/reload", data=b"", method="POST")
        assert urllib.request.urlopen(req).status == 200
        assert calls == [1]
    finally:
        srv.shutdown()


def test_main_server_mounts_write_and_otlp(spark, tmp_path):
    """The main API server ingests remote-write (v1+v2 negotiated) and
    OTLP on the reference's paths when receivers are attached
    (api.go:483-484) — one server, not three."""
    import threading
    import urllib.request

    from prometheus_spark.sources.otlp import OTLPReceiver
    from prometheus_spark.sources.remote_write import (
        V2_CONTENT_TYPE,
        RemoteWriteReceiver,
        encode_write_request_v2,
        spool_to_samples,
    )
    from prometheus_spark.web.api import PromAPI

    api = PromAPI(None)
    api.remote_write_receiver = RemoteWriteReceiver(str(tmp_path / "spool"))
    api.otlp_receiver = OTLPReceiver(str(tmp_path / "spool"))
    srv = api.server()
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = encode_write_request_v2(
            [({"__name__": "mounted", "job": "x"}, 1000, 1.0)]
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/write", data=body,
            headers={"Content-Type": V2_CONTENT_TYPE}, method="POST",
        )
        resp = urllib.request.urlopen(req)
        assert resp.status == 204
        assert resp.headers["X-Prometheus-Remote-Write-Samples-Written"] == "1"

        # minimal OTLP gauge body
        import struct

        from prometheus_spark.sources.remote_write import _ld, _write_varint

        def fix64(fno, v):
            return _write_varint(fno << 3 | 1) + struct.pack("<Q", v)

        def df64(fno, v):
            return _write_varint(fno << 3 | 1) + struct.pack("<d", v)

        dp = fix64(3, 1_000_000_000) + df64(4, 2.5)
        gauge = _ld(1, b"g") + _ld(5, _ld(1, dp))
        rm = _ld(1, b"") + _ld(2, _ld(2, gauge))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/otlp/v1/metrics", data=_ld(1, rm),
            headers={"Content-Type": "application/x-protobuf"}, method="POST",
        )
        assert urllib.request.urlopen(req).status == 200
    finally:
        srv.shutdown()

    names = {
        r["name"]
        for r in spool_to_samples(spark, str(tmp_path / "spool")).collect()
    }
    assert "mounted" in names and "g" in names


def test_query_concurrency_gate(api):
    """The --query.max-concurrency gate: with every slot held, a query
    waits up to queue_timeout_s and then fails 503/timeout (engine.go
    exec concurrency gate + ErrQueryTimeout); releasing a slot lets
    queries through again."""
    api.max_concurrency = 1
    import threading as _t

    api._query_gate = _t.BoundedSemaphore(1)
    api.queue_timeout_s = 0.2
    assert api._query_gate.acquire()  # hold the only slot
    try:
        code, resp = api.handle(
            "/api/v1/query", {"query": ["m"], "time": ["600"]}
        )
        assert code == 503
        assert resp["errorType"] == "timeout"
        assert "query queue" in resp["error"]
    finally:
        api._query_gate.release()
    code, resp = api.handle("/api/v1/query", {"query": ["m"], "time": ["600"]})
    assert code == 200
    # the successful query released its slot (no leak)
    assert api._query_gate.acquire(timeout=1.0)
    api._query_gate.release()


def test_federate_protobuf_native_histograms(spark):
    """Protobuf federation (federate.go negotiation path) serves native
    histograms; the body round-trips through our own protobuf scrape
    parser and the text path still excludes histogram series."""
    from prometheus_spark.sources.federate import federate, federate_protobuf
    from prometheus_spark.sources.protobuf_scrape import parse_protobuf_scrape
    from prometheus_spark.storage import samples_from_rows

    hist = {
        "schema": 0, "zero_threshold": 1e-128, "zero_count": 1.0,
        "count": 4.0, "sum": 9.5,
        "pos_spans": [{"offset": 0, "length": 2}], "pos_buckets": [1.0, 3.0],
        "neg_spans": [], "neg_buckets": [], "custom_values": [],
        "counter_reset_hint": 0,
    }
    gauge_hist = dict(hist, counter_reset_hint=3)
    samples = samples_from_rows(
        spark,
        [
            ({"__name__": "m", "i": "1"}, 1000, 2.5),
            ({"__name__": "h", "i": "1"}, 2000, hist),
            ({"__name__": "h", "i": "1"}, 3000, hist),  # newer wins
            ({"__name__": "hg", "i": "2"}, 2500, gauge_hist),
        ],
    )
    body = federate_protobuf(samples, [], 10_000)
    rows, meta = parse_protobuf_scrape(body)
    by_name = {r[0]["__name__"]: r for r in rows}
    assert by_name["m"][2] == 2.5
    h = by_name["h"][2]
    assert isinstance(h, dict) and h["count"] == 4.0 and h["pos_buckets"] == [1.0, 3.0]
    assert by_name["h"][1] == 3000  # latest sample per series
    assert meta["h"]["type"] == "histogram"
    assert meta["hg"]["type"] == "gaugehistogram"
    assert meta["m"]["type"] == "unknown"

    # text federation drops native-histogram series (non-protobuf format)
    lines = [r["line"] for r in federate(samples, [], 10_000).collect()]
    assert any(line.startswith("m{") for line in lines)
    assert not any(line.startswith("h{") for line in lines)


def test_rules_endpoint_filters_and_alert_state(spark):
    """api.go:1633 rules query filters (type, rule_name[], rule_group[],
    exclude_alerts) + per-rule alert state from the engine's maps."""
    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.streaming import (
        AlertingRule,
        RecordingRule,
        RuleGroup,
        RulesEngine,
    )
    from prometheus_spark.web.api import PromAPI

    M = 60_000
    rows = [({"__name__": "m"}, i * M, float(i * 100)) for i in range(11)]
    eng = RulesEngine(spark, samples_from_rows(spark, rows))
    groups = [
        RuleGroup("g1", M, [
            RecordingRule("rec:m", "sum(m)"),
            AlertingRule("Hot", "m > 50", annotations={"d": "hot"}),
        ], limit=5),
        RuleGroup("g2", M, [RecordingRule("other", "sum(m)")]),
    ]
    eng.eval_tick(groups[0], 10 * M)  # arms the Hot alert (firing)
    api = PromAPI(engine=None, rule_groups=groups, rules_engine=eng)

    code, resp = api.handle("/api/v1/rules", {})
    assert code == 200
    g1 = resp["data"]["groups"][0]
    assert g1["limit"] == 5
    hot = next(r for r in g1["rules"] if r["type"] == "alerting")
    assert hot["state"] == "firing"
    assert hot["alerts"][0]["state"] == "firing"
    assert hot["annotations"] == {"d": "hot"}

    code, resp = api.handle("/api/v1/rules", {"type": ["record"]})
    assert all(
        r["type"] == "recording"
        for grp in resp["data"]["groups"] for r in grp["rules"]
    )
    code, resp = api.handle("/api/v1/rules", {"rule_group[]": ["g2"]})
    assert [grp["name"] for grp in resp["data"]["groups"]] == ["g2"]
    code, resp = api.handle("/api/v1/rules", {"rule_name[]": ["Hot"]})
    got = [r["name"] for grp in resp["data"]["groups"] for r in grp["rules"]]
    assert got == ["Hot"]
    code, resp = api.handle(
        "/api/v1/rules", {"exclude_alerts": ["true"]}
    )
    hot = next(
        r for grp in resp["data"]["groups"] for r in grp["rules"]
        if r["name"] == "Hot"
    )
    assert "alerts" not in hot and hot["state"] == "firing"
    code, _ = api.handle("/api/v1/rules", {"type": ["bogus"]})
    assert code == 400


def test_rules_endpoint_pagination_and_match(spark):
    """api.go:1807 pagination (group_limit + sha256 group_next_token)
    plus match[]/file[] filters."""
    import hashlib

    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.streaming import RecordingRule, RuleGroup, RulesEngine
    from prometheus_spark.web.api import PromAPI

    M = 60_000
    eng = RulesEngine(
        spark, samples_from_rows(spark, [({"__name__": "m"}, 0, 1.0)])
    )
    groups = [
        RuleGroup(
            f"g{i}", M,
            [RecordingRule(f"r{i}", "sum(m)", labels={"team": f"t{i % 2}"})],
            file=f"f{i % 2}.yml",
        )
        for i in range(5)
    ]
    api = PromAPI(engine=None, rule_groups=groups, rules_engine=eng)

    # page 1: 2 groups + continuation token of the 3rd
    code, resp = api.handle("/api/v1/rules", {"group_limit": ["2"]})
    assert code == 200
    page1 = resp["data"]["groups"]
    assert [g["name"] for g in page1] == ["g0", "g1"]
    token = resp["data"]["groupNextToken"]
    assert token == hashlib.sha256(b"f0.yml;g2").hexdigest()
    # page 2 resumes AT the token's group
    code, resp = api.handle(
        "/api/v1/rules",
        {"group_limit": ["2"], "group_next_token": [token]},
    )
    assert [g["name"] for g in resp["data"]["groups"]] == ["g2", "g3"]
    # last page has no token
    token2 = resp["data"]["groupNextToken"]
    code, resp = api.handle(
        "/api/v1/rules",
        {"group_limit": ["2"], "group_next_token": [token2]},
    )
    assert [g["name"] for g in resp["data"]["groups"]] == ["g4"]
    assert "groupNextToken" not in resp["data"]

    # token without limit / bogus token / bad limit → 400
    assert api.handle("/api/v1/rules", {"group_next_token": [token]})[0] == 400
    assert api.handle(
        "/api/v1/rules", {"group_limit": ["2"], "group_next_token": ["zz"]}
    )[0] == 400
    assert api.handle("/api/v1/rules", {"group_limit": ["0"]})[0] == 400

    # match[]: only rules whose labels satisfy a matcher set survive;
    # groups left empty are dropped entirely
    code, resp = api.handle("/api/v1/rules", {"match[]": ['{team="t1"}']})
    names = [g["name"] for g in resp["data"]["groups"]]
    assert names == ["g1", "g3"]
    # file[] filter
    code, resp = api.handle("/api/v1/rules", {"file[]": ["f1.yml"]})
    assert [g["name"] for g in resp["data"]["groups"]] == ["g1", "g3"]
    assert all(g["file"] == "f1.yml" for g in resp["data"]["groups"])


def test_per_step_stats(spark):
    """stats=all + per_step_stats (promql-per-step-stats flag): per-step
    queryable-sample counts alongside the timing stats
    (util/stats/query_stats.go QuerySamples)."""
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.web.api import PromAPI

    M = 60_000
    rows = []
    for i in range(11):
        rows.append(({"__name__": "m", "k": "a"}, i * M, float(i)))
        rows.append(({"__name__": "m", "k": "b"}, i * M, float(i * 2)))
    eng = PromQLEngine(spark, samples_from_rows(spark, rows))
    api = PromAPI(eng, per_step_stats=True)

    # range query: 2 series × one point per step (lookback) → n=2 each
    code, resp = api.handle(
        "/api/v1/query_range",
        {"query": ["m"], "start": ["300"], "end": ["600"],
         "step": ["60"], "stats": ["all"]},
    )
    assert code == 200
    s = resp["data"]["stats"]["samples"]
    assert s["totalQueryableSamples"] == 2 * 6
    # evaluator-memory peak: evalSeries accumulates every selected sample
    # (engine.go:1873) — 2 series × 6 steps
    assert s["peakSamples"] == 12
    assert s["totalQueryableSamplesPerStep"][0] == [300.0, 2]
    assert s["samplesRead"] == 2 * 6
    assert len(s["samplesReadPerStep"]) == 6

    # matrix selector counts every window sample: rate(m[5m]) at t=600
    # → window (300,600] = 5 sample times × 2 series = 10
    code, resp = api.handle(
        "/api/v1/query",
        {"query": ["rate(m[5m])"], "time": ["600"], "stats": ["all"]},
    )
    s = resp["data"]["stats"]["samples"]
    assert s["totalQueryableSamples"] == 10
    assert s["totalQueryableSamplesPerStep"] == [[600.0, 10]]

    # without the feature flag, stats=all returns timings only
    api2 = PromAPI(eng)
    code, resp = api2.handle(
        "/api/v1/query", {"query": ["m"], "time": ["600"], "stats": ["all"]}
    )
    assert "samples" not in resp["data"]["stats"]


def test_exclude_alerts_parsebool_and_hist_weighting(spark):
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.streaming import AlertingRule, RuleGroup, RulesEngine
    from prometheus_spark.web.api import PromAPI

    M = 60_000
    eng_r = RulesEngine(
        spark, samples_from_rows(spark, [({"__name__": "m"}, 0, 1.0)])
    )
    g = RuleGroup("g", M, [AlertingRule("A", "m > 0")])
    api = PromAPI(engine=None, rule_groups=[g], rules_engine=eng_r)
    # strconv.ParseBool variants accepted; invalid → 400
    for v in ("1", "t", "TRUE", "True"):
        code, resp = api.handle("/api/v1/rules", {"exclude_alerts": [v]})
        assert code == 200
        assert "alerts" not in resp["data"]["groups"][0]["rules"][0]
    assert api.handle("/api/v1/rules", {"exclude_alerts": ["bogus"]})[0] == 400

    # native histograms weigh Size()/16 in per-step stats, not 1
    h = {"schema": 0, "zero_threshold": 0.001, "zero_count": 1.0,
         "count": 5.0, "sum": 10.0,
         "pos_spans": [{"offset": 0, "length": 2}],
         "pos_buckets": [2.0, 2.0], "neg_spans": [], "neg_buckets": [],
         "custom_values": [], "counter_reset_hint": 0}
    eng = PromQLEngine(
        spark, samples_from_rows(spark, [({"__name__": "nh"}, 600_000, h)])
    )
    from prometheus_spark.engine.stats import query_samples_stats

    s = query_samples_stats(eng, "nh", 600_000, 600_000, 1)
    # Size = 168 + 8*1 span + 8*2 buckets = 192 → 192//16 = 12
    assert s["totalQueryableSamples"] == 12
