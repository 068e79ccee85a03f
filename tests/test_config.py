"""prometheus.yml loading + server assembly (config/config.go parity)."""

import textwrap

import pytest

from prometheus_spark.config import build_server, load_config


@pytest.fixture()
def config_dir(tmp_path):
    (tmp_path / "alerts.yml").write_text(textwrap.dedent("""
        groups:
          - name: node
            interval: 30s
            rules:
              - record: job:up:sum
                expr: sum by (job) (up)
              - alert: InstanceDown
                expr: up == 0
                for: 5m
                labels: {severity: page}
                annotations: {summary: "{{ $labels.instance }} down"}
    """))
    (tmp_path / "prometheus.yml").write_text(textwrap.dedent("""
        global:
          scrape_interval: 15s
          evaluation_interval: 30s
          external_labels:
            cluster: c1
        rule_files:
          - "*.yml"
        scrape_configs:
          - job_name: node
            metrics_path: /custom
            static_configs:
              - targets: ["host-a:9100", "host-b:9100"]
                labels: {env: prod}
            relabel_configs:
              - action: drop
                source_labels: [__address__]
                regex: "host-b.*"
            metric_relabel_configs:
              - action: drop
                source_labels: [__name__]
                regex: "go_.*"
          - job_name: api
            scrape_interval: 1m
            static_configs:
              - targets: ["api:8080"]
        alerting:
          alertmanagers:
            - static_configs:
                - targets: ["am1:9093"]
        remote_write:
          - url: http://downstream/api/v1/write
    """))
    return tmp_path


def test_load_config(config_dir):
    cfg = load_config(str(config_dir / "prometheus.yml"))
    assert cfg.scrape_interval_ms == 15_000
    assert cfg.evaluation_interval_ms == 30_000
    assert cfg.external_labels == {"cluster": "c1"}
    assert len(cfg.scrape_jobs) == 2
    node = cfg.scrape_jobs[0]
    assert node.targets == [
        "http://host-a:9100/custom", "http://host-b:9100/custom"
    ]
    assert node.labels == {"env": "prod"}
    assert node.scrape_interval_ms == 15_000  # inherits global
    assert cfg.scrape_jobs[1].scrape_interval_ms == 60_000  # override
    # rule_files glob resolved relative to the config file — matches
    # alerts.yml AND prometheus.yml itself; only genuine rule files load
    assert any(p.endswith("alerts.yml") for p in cfg.rule_files)
    assert cfg.alertmanager_urls == ["http://am1:9093"]
    assert cfg.remote_write_urls == ["http://downstream/api/v1/write"]


def test_duplicate_job_name_rejected(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text(
        "scrape_configs:\n"
        "  - job_name: x\n"
        "  - job_name: x\n"
    )
    with pytest.raises(ValueError, match="multiple scrape configs"):
        load_config(str(p))


def test_build_server(spark, config_dir, tmp_path):
    # keep only the genuine rule file for assembly
    (config_dir / "prometheus.yml").write_text(
        (config_dir / "prometheus.yml").read_text().replace('"*.yml"', '"alerts.yml"')
    )
    cfg = load_config(str(config_dir / "prometheus.yml"))
    from prometheus_spark.storage import samples_from_rows

    samples = samples_from_rows(
        spark, [({"__name__": "up", "job": "node"}, 0, 1.0)]
    )
    srv = build_server(
        spark, cfg, samples=samples, spool_dir=str(tmp_path / "spool")
    )
    # target relabeling dropped host-b; job label injected
    urls = [t.url for t in srv["scrape_manager"].targets]
    assert urls == ["http://host-a:9100/custom", "http://api:8080/metrics"]
    assert srv["scrape_manager"].targets[0].labels["job"] == "node"
    assert srv["scrape_manager"].targets[0].labels["env"] == "prod"
    # metric relabeling is job-scoped
    mr = srv["scrape_manager"].metric_relabel
    assert mr({"__name__": "go_gc_duration", "job": "node"}) is None
    assert mr({"__name__": "up", "job": "node"}) is not None
    assert mr({"__name__": "go_gc_duration", "job": "api"}) is not None
    # rule groups loaded
    assert [g.name for g in srv["rule_groups"]] == ["node"]
    assert len(srv["rule_groups"][0].rules) == 2
    # notifier carries external labels + AM urls
    assert srv["notifier"].external_labels == {"cluster": "c1"}
    assert srv["notifier"].alertmanagers() == [
        "http://am1:9093/api/v2/alerts"
    ]
    # API serves the config back and the rules
    code, resp = srv["api"].handle("/api/v1/status/config", {})
    assert code == 200 and "scrape_configs" in resp["data"]["yaml"]
    code, resp = srv["api"].handle("/api/v1/rules", {})
    assert code == 200 and resp["data"]["groups"][0]["name"] == "node"
    # engine answers queries over the provided samples
    code, resp = srv["api"].handle(
        "/api/v1/query", {"query": ["up"], "time": ["60"]}
    )
    assert code == 200 and len(resp["data"]["result"]) == 1


def test_relabel_steps_endpoint(spark, config_dir, tmp_path):
    import json

    (config_dir / "prometheus.yml").write_text(
        (config_dir / "prometheus.yml").read_text().replace('"*.yml"', '"alerts.yml"')
    )
    cfg = load_config(str(config_dir / "prometheus.yml"))
    srv = build_server(spark, cfg, spool_dir=str(tmp_path / "spool2"))
    api = srv["api"]
    code, resp = api.handle(
        "/api/v1/targets/relabel_steps",
        {"scrapePool": ["node"],
         "labels": [json.dumps({"__address__": "host-b:9100", "env": "prod"})]},
    )
    assert code == 200
    steps = resp["data"]["steps"]
    assert len(steps) == 1
    assert steps[0]["keep"] is False  # host-b dropped by the drop rule
    assert steps[0]["rule"]["action"] == "drop"
    # surviving target keeps labels through the step
    code, resp = api.handle(
        "/api/v1/targets/relabel_steps",
        {"scrapePool": ["node"],
         "labels": [json.dumps({"__address__": "host-a:9100", "env": "prod"})]},
    )
    assert resp["data"]["steps"][0]["keep"] is True
    assert resp["data"]["steps"][0]["output"]["env"] == "prod"
    # unknown pool errors
    code, _ = api.handle(
        "/api/v1/targets/relabel_steps",
        {"scrapePool": ["nope"], "labels": ["{}"]},
    )
    assert code == 400


def test_scrape_config_files_includes(tmp_path):
    from prometheus_spark.config import load_config

    (tmp_path / "jobs").mkdir()
    (tmp_path / "jobs" / "a.yml").write_text(
        "scrape_configs:\n  - job_name: inc_a\n"
        "    static_configs: [{targets: ['a:1']}]\n"
    )
    (tmp_path / "jobs" / "b.yml").write_text(
        "scrape_configs:\n  - job_name: inc_b\n"
        "    static_configs: [{targets: ['b:1']}]\n"
    )
    p = tmp_path / "prom.yml"
    p.write_text(
        """
scrape_config_files:
  - jobs/*.yml
scrape_configs:
  - job_name: inline
    static_configs: [{targets: ['c:1']}]
"""
    )
    cfg = load_config(str(p))
    assert [j.job_name for j in cfg.scrape_jobs] == ["inline", "inc_a", "inc_b"]

    # duplicate job names across include boundaries must error
    (tmp_path / "jobs" / "dup.yml").write_text(
        "scrape_configs:\n  - job_name: inline\n"
        "    static_configs: [{targets: ['d:1']}]\n"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple scrape configs"):
        load_config(str(p))

    # non-scrape_configs fields in an include are rejected
    (tmp_path / "jobs" / "dup.yml").write_text("global: {}\n")
    with _pytest.raises(ValueError, match="invalid field"):
        load_config(str(p))


def test_scrape_native_histograms_flips_protocol_default(tmp_path):
    from prometheus_spark.config import load_config
    from prometheus_spark.sources.discovery import populate_targets, TargetGroup

    p = tmp_path / "prom.yml"
    p.write_text(
        """
scrape_configs:
  - job_name: nh
    scrape_native_histograms: true
    static_configs: [{targets: ['a:1']}]
  - job_name: plain
    static_configs: [{targets: ['a:1']}]
"""
    )
    cfg = load_config(str(p))
    jobs = {j.job_name: j for j in cfg.scrape_jobs}
    assert jobs["nh"].scrape_native_histograms is True

    grp = TargetGroup(targets=["a:1"], labels={})
    (nh_tgt,) = populate_targets(jobs["nh"], [grp])
    (plain_tgt,) = populate_targets(jobs["plain"], [grp])
    assert nh_tgt.scrape_protocols[0] == "PrometheusProto"
    assert plain_tgt.scrape_protocols[0] == "OpenMetricsText1.0.0"


def test_convert_classic_histograms_to_nhcb_in_server(tmp_path, spark):
    from prometheus_spark.config import build_server, load_config
    from prometheus_spark.storage import samples_from_rows

    p = tmp_path / "prom.yml"
    p.write_text(
        """
scrape_configs:
  - job_name: folded
    convert_classic_histograms_to_nhcb: true
    static_configs: [{targets: ['a:1']}]
  - job_name: plain
    static_configs: [{targets: ['b:1']}]
"""
    )
    cfg = load_config(str(p))
    rows = []
    for job in ("folded", "plain"):
        for le, c in (("1", 1.0), ("2", 3.0), ("+Inf", 4.0)):
            rows.append(
                ({"__name__": "lat_bucket", "le": le, "job": job}, 0, c)
            )
        rows.append(({"__name__": "lat_sum", "job": job}, 0, 5.0))
        rows.append(({"__name__": "lat_count", "job": job}, 0, 4.0))
    samples = samples_from_rows(spark, rows)
    srv = build_server(spark, cfg, samples=samples, spool_dir=str(tmp_path / "sp"))
    eng = srv["engine"]
    out = {
        (r["labels"]["job"], r["name"]): r
        for r in eng.samples.collect()
    }
    # the flagged job's classic series folded into one NHCB row
    assert ("folded", "lat") in out
    assert out[("folded", "lat")]["hist"] is not None
    assert ("folded", "lat_bucket") not in out
    # the plain job keeps its classic series
    assert ("plain", "lat_bucket") in out
    assert ("plain", "lat") not in out


def test_storage_section_parsed(tmp_path):
    """storage.tsdb.out_of_order_time_window and
    storage.exemplars.max_exemplars (config.go StorageConfig) surface on
    the loaded config — the OOO window feeds streaming.with_ooo_window."""
    import textwrap

    from prometheus_spark.config import load_config

    p = tmp_path / "prometheus.yml"
    p.write_text(textwrap.dedent("""
        storage:
          tsdb:
            out_of_order_time_window: 10m
          exemplars:
            max_exemplars: 5000
    """))
    cfg = load_config(str(p))
    assert cfg.ooo_time_window_ms == 600_000
    assert cfg.max_exemplars == 5000
    # defaults when absent
    p2 = tmp_path / "empty.yml"
    p2.write_text("{}")
    cfg2 = load_config(str(p2))
    assert cfg2.ooo_time_window_ms == 0 and cfg2.max_exemplars == 100_000


def test_generate_checksum_covers_rule_files(tmp_path):
    from prometheus_spark.config import generate_checksum

    rules = tmp_path / "rules.yml"
    rules.write_text("groups: []\n")
    cfg = tmp_path / "prom.yml"
    cfg.write_text(f"rule_files: ['{rules}']\n")
    c1 = generate_checksum(str(cfg))
    assert c1 == generate_checksum(str(cfg))  # stable
    rules.write_text("groups: [{name: g, rules: []}]\n")
    assert generate_checksum(str(cfg)) != c1  # rule-file edit flips it


def test_config_watcher_reloads_on_change(tmp_path):
    from prometheus_spark.config import ConfigWatcher

    cfg = tmp_path / "prom.yml"
    cfg.write_text("global: {}\n")
    fired = []
    w = ConfigWatcher(str(cfg), lambda: fired.append(1), interval_s=1)
    assert not w.check_once()  # baseline
    assert not w.check_once()  # unchanged
    cfg.write_text("global: {scrape_interval: 30s}\n")
    assert w.check_once()
    assert fired == [1]
    # failing reload retries: checksum not advanced
    cfg.write_text("global: {scrape_interval: 15s}\n")
    boom = ConfigWatcher(str(cfg), lambda: 1 / 0, interval_s=1)
    boom.check_once()
    cfg.write_text("global: {scrape_interval: 10s}\n")
    assert not boom.check_once()
    assert boom.last_error is not None
    ok = []
    boom.reload_fn = lambda: ok.append(1)
    assert boom.check_once()  # retried on next poll after failure


def test_config_watcher_survives_malformed_yaml(tmp_path):
    """Regression (code review): a half-written config mid-edit raises
    yaml errors, not OSError — the watcher must survive and retry."""
    from prometheus_spark.config import ConfigWatcher

    cfg = tmp_path / "prom.yml"
    cfg.write_text("global: {}\n")
    fired = []
    w = ConfigWatcher(str(cfg), lambda: fired.append(1), interval_s=1)
    w.check_once()  # baseline
    cfg.write_text("global: [unclosed\n")  # malformed mid-save
    assert not w.check_once()
    assert w.last_error is not None
    cfg.write_text("global: {scrape_interval: 30s}\n")  # save completes
    assert w.check_once() and fired == [1]


def test_build_server_feature_flags(spark, tmp_path):
    """--enable-feature pass-through (cmd/prometheus/main.go:230):
    known flags wire the r8 features; unknown flags fail startup."""
    import pytest as _pytest

    from prometheus_spark.config import build_server, load_config

    p = tmp_path / "prom.yml"
    p.write_text("global: {}\nscrape_configs: []\n")
    cfg = load_config(str(p))
    parts = build_server(
        spark, cfg, spool_dir=str(tmp_path / "spool"),
        feature_flags=[
            "created-timestamp-zero-ingestion", "st-synthesis",
            "type-and-unit-labels", "promql-per-step-stats",
            "concurrent-rule-eval",
        ],
    )
    mgr = parts["scrape_manager"]
    assert mgr.enable_st_zero_ingestion and mgr.synthesize_st_enabled
    assert mgr.enable_type_and_unit_labels
    assert parts["api"].per_step_stats
    assert parts["api"].flags["enable-feature"] == (
        "concurrent-rule-eval,created-timestamp-zero-ingestion,"
        "promql-per-step-stats,st-synthesis,type-and-unit-labels"
    )
    with _pytest.raises(ValueError, match="unknown feature"):
        build_server(spark, cfg, spool_dir=str(tmp_path / "s2"),
                     feature_flags=["bogus-flag"])


def test_tracing_config(tmp_path):
    """config.go:1223 TracingConfig: grpc default, endpoint required,
    client-type/compression/header validation."""
    from prometheus_spark.config import load_config

    p = tmp_path / "t.yml"
    p.write_text(
        "tracing:\n  endpoint: localhost:4317\n"
        "  sampling_fraction: 0.5\n  compression: gzip\n"
        "  headers:\n    X-Scope-OrgID: tenant1\n  timeout: 20s\n"
    )
    cfg = load_config(str(p))
    assert cfg.tracing["client_type"] == "grpc"  # default
    assert cfg.tracing["endpoint"] == "localhost:4317"
    assert cfg.tracing["sampling_fraction"] == 0.5
    assert cfg.tracing["timeout_ms"] == 20_000

    import pytest as _pytest

    for body, msg in [
        ("tracing:\n  client_type: http\n  sampling_fraction: 1\n",
         "endpoint must be set"),
        ("tracing:\n  endpoint: e\n  client_type: udp\n",
         "client type"),
        ("tracing:\n  endpoint: e\n  compression: zstd\n",
         "compression"),
        ("tracing:\n  endpoint: e\n  headers:\n    authorization: x\n",
         "authorization"),
        ("tracing:\n  endpoint: e\n  headers:\n    User-Agent: x\n",
         "reserved"),
    ]:
        p.write_text(body)
        with _pytest.raises(ValueError, match=msg):
            load_config(str(p))
