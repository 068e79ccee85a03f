"""Native-histogram scrape protections — mirrors scrape/target_test.go
TestBucketLimitAppender / TestMaxSchemaAppender and scrape_test.go's
pickSchema table."""

import pytest

from prometheus_spark.sources.hist_limits import (
    BucketLimitError,
    apply_bucket_limit,
    apply_hist_limits,
    apply_max_schema,
    pick_schema,
)

# target_test.go:570 `example` — deltas [3,0,0] → absolute [3,3,3]
EXAMPLE = {
    "schema": 0,
    "zero_threshold": 0.001,
    "zero_count": 3.0,
    "count": 21.0,
    "sum": 33.0,
    "pos_spans": [{"offset": 0, "length": 3}],
    "pos_buckets": [3.0, 3.0, 3.0],
    "neg_spans": [{"offset": 0, "length": 3}],
    "neg_buckets": [3.0, 3.0, 3.0],
    "custom_values": [],
    "counter_reset_hint": 0,
}

# target_test.go:585 `bigGap`
BIG_GAP = {
    "schema": 0,
    "zero_threshold": 0.001,
    "zero_count": 3.0,
    "count": 21.0,
    "sum": 33.0,
    "pos_spans": [{"offset": 1, "length": 1}, {"offset": 2, "length": 1}],
    "pos_buckets": [1.0, 1.0],
    "neg_spans": [],
    "neg_buckets": [],
    "custom_values": [],
    "counter_reset_hint": 0,
}

# target_test.go:600 `customBuckets` (NHCB)
CUSTOM = {
    "schema": -53,
    "zero_threshold": 0.0,
    "zero_count": 0.0,
    "count": 9.0,
    "sum": 33.0,
    "pos_spans": [{"offset": 0, "length": 3}],
    "pos_buckets": [3.0, 3.0, 3.0],
    "neg_spans": [],
    "neg_buckets": [],
    "custom_values": [1.0, 2.0, 3.0],
    "counter_reset_hint": 0,
}


def _nbuckets(h):
    return len(h["pos_buckets"]) + len(h["neg_buckets"])


def test_bucket_limit_cases():
    # (hist, limit, expect_error, expect_buckets, expect_schema) —
    # the exact target_test.go:616-654 table
    cases = [
        (EXAMPLE, 3, True, None, None),
        (EXAMPLE, 4, False, 4, -1),
        (EXAMPLE, 10, False, 6, 0),
        (BIG_GAP, 1, False, 1, -2),
        (CUSTOM, 2, True, None, None),
        (CUSTOM, 3, False, 3, -53),
    ]
    for hist, limit, err, nb, schema in cases:
        if err:
            with pytest.raises(BucketLimitError):
                apply_bucket_limit(dict(hist), limit)
        else:
            out = apply_bucket_limit(dict(hist), limit)
            assert _nbuckets(out) == nb
            assert out["schema"] == schema
            # counts survive the merge
            assert sum(out["pos_buckets"]) == sum(hist["pos_buckets"])


def test_bucket_limit_merge_values():
    out = apply_bucket_limit(dict(EXAMPLE), 4)
    # indexes {0,1,2} → schema -1 → {0:3, 1:3+3}
    assert out["pos_buckets"] == [3.0, 6.0]
    assert out["pos_spans"] == [{"offset": 0, "length": 2}]


def test_bucket_limit_zero_means_unlimited():
    assert apply_bucket_limit(EXAMPLE, 0) is EXAMPLE


def test_max_schema_cases():
    # target_test.go:749-771 table
    assert apply_max_schema(dict(EXAMPLE), -1)["schema"] == -1
    assert apply_max_schema(dict(EXAMPLE), 0)["schema"] == 0
    assert apply_max_schema(dict(CUSTOM), -1)["schema"] == -53
    # cap at EXP_SCHEMA_MAX disables the wrapper entirely
    assert apply_max_schema(EXAMPLE, 8) is EXAMPLE


def test_pick_schema():
    # scrape_test.go TestPickSchema-style: factor → schema
    assert pick_schema(0) == 8  # unset → default 1.00271 → max resolution
    assert pick_schema(1.00271) == 8
    assert pick_schema(1.1) == 2
    assert pick_schema(2.0) == 0
    assert pick_schema(4.0) == -1
    assert pick_schema(256.0) == -3
    assert pick_schema(65536.0) == -4  # clamped at min


def test_compose_max_schema_then_bucket_limit():
    # schema cap applies first (appenderWithLimits wraps bucketLimit
    # inside maxSchema), then the bucket limit sees the reduced layout
    out = apply_hist_limits(dict(EXAMPLE), 4, -1)
    assert out["schema"] == -1 and _nbuckets(out) == 4


def test_scrape_fails_on_bucket_limit(tmp_path, spark):
    """End-to-end: a protobuf target exposing an over-limit native
    histogram fails the whole scrape (up=0), like sample_limit
    (scrape.go:1885)."""
    import http.server
    import threading

    from prometheus_spark.sources.federate import (
        _encode_client_histogram,
        _pb_ld,
        _pb_uvarint,
        _pb_vint,
    )
    from prometheus_spark.sources.remote_write import spool_to_samples
    from prometheus_spark.sources.scrape import (
        ScrapeLimits,
        ScrapeManager,
        ScrapeTarget,
    )

    # one MetricFamily "lat" of type HISTOGRAM carrying EXAMPLE natively
    metric = _pb_ld(7, _encode_client_histogram(EXAMPLE))
    fam = _pb_ld(1, b"lat") + _pb_vint(3, 4) + _pb_ld(4, metric)
    body = _pb_uvarint(len(fam)) + fam

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header(
                "Content-Type",
                "application/vnd.google.protobuf; "
                "proto=io.prometheus.client.MetricFamily; encoding=delimited",
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/metrics"
    try:
        # limit 3 → irreducible → scrape fails
        mgr = ScrapeManager(
            str(tmp_path / "s1"),
            [ScrapeTarget(url, limits=ScrapeLimits(native_histogram_bucket_limit=3))],
        )
        mgr.scrape_once(now_ms=0)
        rows = {
            r["name"]: r
            for r in spool_to_samples(spark, str(tmp_path / "s1")).collect()
        }
        assert rows["up"]["value"] == 0.0

        # limit 4 → resolution-reduced to schema -1, scrape succeeds
        mgr2 = ScrapeManager(
            str(tmp_path / "s2"),
            [ScrapeTarget(url, limits=ScrapeLimits(native_histogram_bucket_limit=4))],
        )
        mgr2.scrape_once(now_ms=0)
        rows2 = {
            r["name"]: r
            for r in spool_to_samples(spark, str(tmp_path / "s2")).collect()
        }
        assert rows2["up"]["value"] == 1.0
        h = rows2["lat"]["hist"]
        assert h["schema"] == -1
        assert list(h["pos_buckets"]) == [3.0, 6.0]
    finally:
        srv.shutdown()


def test_config_roundtrip_native_histogram_knobs(tmp_path):
    from prometheus_spark.config import load_config

    p = tmp_path / "prom.yml"
    p.write_text(
        """
scrape_configs:
  - job_name: caped
    native_histogram_bucket_limit: 160
    native_histogram_min_bucket_factor: 1.1
    static_configs:
      - targets: ['localhost:9100']
"""
    )
    cfg = load_config(str(p))
    sc = cfg.scrape_jobs[0]
    assert sc.native_histogram_bucket_limit == 160
    assert sc.native_histogram_min_bucket_factor == 1.1

    from prometheus_spark.sources.discovery import _job_limits

    lims = _job_limits(sc)
    assert lims is not None
    assert lims.native_histogram_bucket_limit == 160
    assert pick_schema(lims.native_histogram_min_bucket_factor) == 2
