"""Notifier delivery semantics (reference notifier/ package).

Pure driver-side — no SparkSession needed except for the rules-engine
integration test at the bottom.
"""

import json

from prometheus_spark.sources.relabel import RelabelConfig, process_labels
from prometheus_spark.streaming.notifier import (
    Alert,
    NotifierManager,
    send_alerts,
    _rfc3339,
)


def _capture():
    posts = []

    def post_fn(url, body):
        posts.append((url, json.loads(body.decode())))
        return 200

    return posts, post_fn


def test_process_labels_actions():
    # replace with group expansion (relabel.go:311)
    cfg = RelabelConfig(
        action="replace", source_labels=["job"], regex="(.+)",
        target_label="svc", replacement="x-${1}",
    )
    assert process_labels({"job": "api"}, [cfg])["svc"] == "x-api"
    # keep/drop
    keep = RelabelConfig(action="keep", source_labels=["env"], regex="prod")
    assert process_labels({"env": "prod"}, [keep]) == {"env": "prod"}
    assert process_labels({"env": "dev"}, [keep]) is None
    # labeldrop
    ld = RelabelConfig(action="labeldrop", regex="tmp_.*")
    assert process_labels({"a": "1", "tmp_x": "2"}, [ld]) == {"a": "1"}
    # hashmod is deterministic and bounded
    hm = RelabelConfig(action="hashmod", source_labels=["a"],
                       target_label="shard", modulus=7)
    out = process_labels({"a": "abc"}, [hm])
    assert 0 <= int(out["shard"]) < 7
    # lowercase
    lc = RelabelConfig(action="lowercase", source_labels=["a"],
                       target_label="a")
    assert process_labels({"a": "ABC"}, [lc])["a"] == "abc"


def test_send_applies_external_labels_and_relabel():
    posts, post_fn = _capture()
    nm = NotifierManager(
        ["http://am1:9093"],
        external_labels={"cluster": "c1", "alertname": "never-wins"},
        relabel_configs=[
            RelabelConfig(action="drop", source_labels=["severity"],
                          regex="debug")
        ],
        post_fn=post_fn,
    )
    nm.send(
        Alert({"alertname": "Up", "severity": "page"}, {"d": "x"},
              1000, None),
        Alert({"alertname": "Noisy", "severity": "debug"}, {}, 1000, None),
    )
    nm.flush()
    assert len(posts) == 1
    url, body = posts[0]
    assert url == "http://am1:9093/api/v2/alerts"
    assert len(body) == 1  # debug alert relabel-dropped
    lbls = body[0]["labels"]
    # external label fills unset, never overrides (alert.go:76-81)
    assert lbls["cluster"] == "c1" and lbls["alertname"] == "Up"
    assert body[0]["startsAt"] == "1970-01-01T00:00:01.000Z"


def test_queue_eviction_and_batching():
    posts, post_fn = _capture()
    nm = NotifierManager(
        ["http://am:9093"], queue_capacity=5, max_batch_size=2,
        post_fn=post_fn,
    )
    alerts = [Alert({"alertname": f"a{i}"}) for i in range(8)]
    nm.send(*alerts)
    loop = nm.loops[0]
    assert loop.queue_len() == 5  # oldest 3 evicted (sendloop.go:94-99)
    assert loop.dropped == 3
    nm.flush()
    assert loop.queue_len() == 0
    assert [len(b) for _, b in posts] == [2, 2, 1]  # max_batch_size honored
    # newest survived
    names = [a["labels"]["alertname"] for _, b in posts for a in b]
    assert names == ["a3", "a4", "a5", "a6", "a7"]


def test_alertmanager_set_relabel_drops_am():
    nm = NotifierManager(
        ["http://am1:9093", "http://am2:9093"],
        alertmanager_relabel=[
            RelabelConfig(action="drop", source_labels=["__address__"],
                          regex="am2.*")
        ],
        post_fn=lambda u, b: 200,
    )
    assert nm.alertmanagers() == ["http://am1:9093/api/v2/alerts"]
    assert nm.dropped_alertmanagers() == ["http://am2:9093"]


def test_send_alerts_resend_gate():
    posts, post_fn = _capture()
    nm = NotifierManager(["http://am:9093"], post_fn=post_fn)
    rows = [
        ("Hot", {"alertname": "Hot", "id": "1"}, {}, "firing", 500, 2.0),
        ("Hot", {"alertname": "Hot", "id": "2"}, {}, "pending", 900, 1.0),
    ]
    ls = send_alerts(nm, rows, ts_ms=1_000, interval_ms=10_000,
                     resend_delay_ms=60_000)
    nm.flush()
    assert len(posts) == 1 and len(posts[0][1]) == 1  # pending not sent
    a = posts[0][1][0]
    assert a["labels"]["id"] == "1"
    # firing EndsAt = ts + 4*max(interval, resend) (alerting.go:625)
    assert a["endsAt"] == _rfc3339(1_000 + 4 * 60_000)
    # within resend delay → suppressed
    ls = send_alerts(nm, rows[:1], ts_ms=30_000, interval_ms=10_000,
                     resend_delay_ms=60_000, last_sent=ls)
    nm.flush()
    assert len(posts) == 1
    # resolved always goes out, EndsAt = now (manager.go:485-489)
    rows_res = [("Hot", {"alertname": "Hot", "id": "1"}, {}, "resolved",
                 500, 2.0)]
    send_alerts(nm, rows_res, ts_ms=31_000, interval_ms=10_000,
                resend_delay_ms=60_000, last_sent=ls)
    nm.flush()
    assert len(posts) == 2
    assert posts[1][1][0]["endsAt"] == _rfc3339(31_000)


def test_http_error_counts():
    nm = NotifierManager(["http://am:9093"],
                         post_fn=lambda u, b: 503)
    nm.send(Alert({"alertname": "x"}))
    nm.flush()
    assert nm.loops[0].errors == 1 and nm.loops[0].sent == 0


def test_api_alertmanagers_endpoint():
    from prometheus_spark.web.api import PromAPI

    api = PromAPI(engine=None)
    api.notifier = NotifierManager(["http://am:9093"],
                                   post_fn=lambda u, b: 200)
    status, resp = api.handle("/api/v1/alertmanagers", {})
    assert status == 200
    assert resp["data"]["activeAlertmanagers"] == [
        {"url": "http://am:9093/api/v2/alerts"}
    ]


def test_self_metrics_endpoint():
    from prometheus_spark.web.api import PromAPI

    api = PromAPI(engine=None)
    api.handle("/api/v1/features", {})
    api.handle("/api/v1/features", {})
    api.handle("/api/v1/search/label_values", {})  # 400 -> error counter
    code, resp = api.handle("/api/v1/status/self_metrics", {})
    assert code == 200
    fams = {f["name"]: f for f in resp["data"]}
    reqs = {m["label"][0]["value"]: m["counter"]["value"]
            for m in fams["promspark_http_requests_total"]["metric"]}
    assert reqs["/api/v1/features"] == 2.0
    errs = {m["label"][0]["value"]: m["counter"]["value"]
            for m in fams["promspark_http_errors_total"]["metric"]}
    assert errs["/api/v1/search/label_values"] == 1.0
    # name filter
    code, resp = api.handle(
        "/api/v1/status/self_metrics",
        {"metric_name_pattern": ["promspark_http_errors.*"]},
    )
    assert [f["name"] for f in resp["data"]] == ["promspark_http_errors_total"]


def test_notification_center_and_sse():
    import threading
    import urllib.request

    from prometheus_spark.web.api import PromAPI
    from prometheus_spark.web.notifications import NotificationCenter

    api = PromAPI(engine=None)
    nc = NotificationCenter(max_subscribers=2)
    api.notification_center = nc
    nc.add("config reloaded")
    code, resp = api.handle("/api/v1/notifications", {})
    assert [n["text"] for n in resp["data"]["notifications"]] == [
        "config reloaded"
    ]
    nc.delete("config reloaded")
    code, resp = api.handle("/api/v1/notifications", {})
    assert resp["data"]["notifications"] == []

    # live SSE over real HTTP: pre-seeded actives arrive as events
    nc.add("wal replay in progress")
    srv = api.server(port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    resp = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/api/v1/notifications/live", timeout=10
    )
    assert resp.headers["Content-Type"] == "text/event-stream"
    line = resp.readline().decode()
    assert line.startswith("data: ")
    import json as _json

    n = _json.loads(line[len("data: "):])
    assert n["text"] == "wal replay in progress" and n["active"] is True
    resp.close()
    srv.shutdown()


def test_notification_subscriber_cap():
    from prometheus_spark.web.notifications import NotificationCenter

    nc = NotificationCenter(max_subscribers=1)
    s1 = nc.subscribe()
    assert s1 is not None
    assert nc.subscribe() is None  # cap reached -> SSE responds 204
    s1[1]()  # unsubscribe frees the slot
    assert nc.subscribe() is not None


def test_unresolved_alert_omits_endsat():
    """An alert with no end time must NOT serialize a concrete past
    endsAt (the epoch reads as already-resolved to Alertmanager); the
    reference sends Go's zero time — omitting the field is equivalent."""
    from prometheus_spark.streaming.notifier import Alert

    firing = Alert({"alertname": "A"}, starts_at_ms=1_000)
    assert "endsAt" not in firing.to_v2()
    resolved = Alert({"alertname": "A"}, starts_at_ms=1_000, ends_at_ms=2_000)
    assert resolved.to_v2()["endsAt"].startswith("1970-01-01T00:00:02")


def test_per_alertmanager_set_relabel_scoping():
    """Each alertmanagers entry's relabel_configs apply only to that
    entry's targets — set 1's drop-everything rule must not drop set 2."""
    from prometheus_spark.sources.relabel import RelabelConfig
    from prometheus_spark.streaming.notifier import NotifierManager

    drop_all = [RelabelConfig(action="drop", source_labels=["__address__"],
                              regex=".*")]
    nm = NotifierManager(
        [],
        alertmanager_sets=[
            (["http://am1:9093"], drop_all),
            (["http://am2:9093"], []),
        ],
    )
    assert nm.alertmanagers() == ["http://am2:9093/api/v2/alerts"]
    assert nm.dropped_alertmanagers() == ["http://am1:9093"]
