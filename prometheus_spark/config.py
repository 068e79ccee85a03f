"""prometheus.yml configuration loading and server assembly.

Mirrors the reference config surface (config/config.go: GlobalConfig
defaults at config.go:173, ScrapeConfig fields at config.go:776+,
AlertingConfig at config.go:1274, relabel config lists) so a user of the
reference can point this engine at their existing ``prometheus.yml`` and
get the same scrape targets, rule groups, relabeling, external labels,
and alertmanager wiring — assembled onto Spark-native components
(ScrapeManager, RulesEngine, NotifierManager, PromAPI).
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass, field
from typing import Optional

import yaml

from prometheus_spark.parser.lexer import parse_duration_ms
from prometheus_spark.sources.relabel import RelabelConfig

# config.go:173 DefaultGlobalConfig
DEFAULT_SCRAPE_INTERVAL_MS = 60_000
DEFAULT_SCRAPE_TIMEOUT_MS = 10_000
DEFAULT_EVAL_INTERVAL_MS = 60_000


def _dur_ms(v, default: int) -> int:
    if v is None:
        return default
    if isinstance(v, (int, float)):
        return int(v * 1000)  # bare numbers are seconds in the reference
    return parse_duration_ms(str(v))


def _auth_header(sc: dict) -> Optional[str]:
    """Precompute the Authorization header from a scrape/HTTP-client
    config section: ``basic_auth`` (username + password/password_file),
    ``authorization`` (type + credentials/credentials_file), or the
    legacy ``bearer_token``/``bearer_token_file`` (config.go
    HTTPClientConfig.Validate precedence — at most one may be set)."""
    import base64

    def _read(path):
        with open(path) as f:
            return f.read().strip()

    ba = sc.get("basic_auth")
    if ba:
        pw = ba.get("password", "")
        if not pw and ba.get("password_file"):
            pw = _read(ba["password_file"])
        tok = base64.b64encode(
            f"{ba.get('username', '')}:{pw}".encode()
        ).decode()
        return f"Basic {tok}"
    auth = sc.get("authorization")
    if auth:
        cred = auth.get("credentials", "")
        if not cred and auth.get("credentials_file"):
            cred = _read(auth["credentials_file"])
        return f"{auth.get('type', 'Bearer')} {cred}"
    if sc.get("bearer_token"):
        return f"Bearer {sc['bearer_token']}"
    if sc.get("bearer_token_file"):
        return f"Bearer {_read(sc['bearer_token_file'])}"
    return None


_SIZE_UNITS = {
    "B": 1, "KB": 1000, "MB": 1000**2, "GB": 1000**3, "TB": 1000**4,
    "KIB": 1024, "MIB": 1024**2, "GIB": 1024**3, "TIB": 1024**4,
}


def _size_bytes(v) -> int:
    """common/config.Size: '512MB', '64KiB', or a plain byte count."""
    if v is None:
        return 0
    if isinstance(v, (int, float)):
        return int(v)
    s = str(v).strip()
    for unit in sorted(_SIZE_UNITS, key=len, reverse=True):
        if s.upper().endswith(unit):
            return int(float(s[: -len(unit)]) * _SIZE_UNITS[unit])
    return int(float(s))


def _validation_scheme(v) -> str:
    """config.go:645: anything but utf8/legacy falls back to the
    default (utf8)."""
    s = str(v or "").strip().lower()
    return s if s in ("utf8", "legacy") else "utf8"


def _escaping_scheme(v) -> str:
    """config.go:164: an invalid metric_name_escaping_scheme is a
    LOAD-TIME error — otherwise every scrape would silently fail with
    up=0 and nothing pointing at the config typo."""
    s = str(v or "").strip()
    if s and s not in ("allow-utf-8", "underscores", "dots", "values"):
        raise ValueError(f"invalid metric name escaping scheme {s!r}")
    return s


def _relabels(raw: Optional[list]) -> list[RelabelConfig]:
    out = []
    for rc in raw or []:
        out.append(
            RelabelConfig(
                action=rc.get("action", "replace"),
                source_labels=list(rc.get("source_labels", [])),
                separator=rc.get("separator", ";"),
                regex=str(rc.get("regex", "(.*)")),
                target_label=rc.get("target_label", ""),
                replacement=str(rc.get("replacement", "$1")),
                modulus=int(rc.get("modulus", 0)),
            )
        )
    return out


@dataclass
class ScrapeJobConfig:
    job_name: str
    targets: list[str]  # resolved URLs (pre-relabel; kept for inspection)
    labels: dict = field(default_factory=dict)
    scrape_interval_ms: int = DEFAULT_SCRAPE_INTERVAL_MS
    scrape_timeout_ms: int = DEFAULT_SCRAPE_TIMEOUT_MS
    honor_labels: bool = False
    honor_timestamps: bool = True
    scrape_protocols: tuple = ()  # () = reference default order
    auth_header: Optional[str] = None  # precomputed Authorization value
    # native-histogram knobs (config.go:532-536); the first flips the
    # default protocol order to proto-first, the other two steer the
    # downstream frame assembly (sources/nhcb.classic_to_nhcb)
    scrape_native_histograms: bool = False
    convert_classic_histograms_to_nhcb: bool = False
    always_scrape_classic_histograms: bool = False
    enable_compression: bool = True
    follow_redirects: bool = True
    fallback_scrape_protocol: str = ""  # blank-Content-Type substitute
    track_timestamps_staleness: bool = False
    keep_dropped_targets: int = 0  # relabel-dropped kept for /targets
    relabel_configs: list = field(default_factory=list)
    metric_relabel_configs: list = field(default_factory=list)
    # scrape protections (config.go ScrapeConfig; 0 = unlimited)
    sample_limit: int = 0
    label_limit: int = 0
    label_name_length_limit: int = 0
    label_value_length_limit: int = 0
    body_size_limit: int = 0  # bytes
    target_limit: int = 0
    # native-histogram scrape protections (config.go:823-832)
    native_histogram_bucket_limit: int = 0
    native_histogram_min_bucket_factor: float = 0.0
    # name validation/escaping + failure logging (config.go:500,526,530)
    metric_name_validation_scheme: str = "utf8"
    metric_name_escaping_scheme: str = ""
    scrape_failure_log_file: str = ""
    # raw scrape_config fields needed to re-derive the URL AFTER target
    # relabeling (scrape/target.go PopulateLabels: __scheme__,
    # __metrics_path__, __param_* are relabel-visible and -mutable)
    scheme: str = "http"
    metrics_path: str = "/metrics"
    params: dict = field(default_factory=dict)
    raw_targets: list = field(default_factory=list)  # host:port strings
    # per-group static configs + service discovery (raw config dicts)
    static_groups: list = field(default_factory=list)  # {"targets", "labels"}
    file_sd: list = field(default_factory=list)  # {"files", "refresh_interval"}
    http_sd: list = field(default_factory=list)  # {"url", "refresh_interval"}
    dns_sd: list = field(default_factory=list)  # {"names", "type", "port"}
    consul_sd: list = field(default_factory=list)  # {"server", "services", ...}
    kubernetes_sd: list = field(default_factory=list)  # {"api_server", "role", ...}
    ec2_sd: list = field(default_factory=list)  # {"region", "port", ...}
    azure_sd: list = field(default_factory=list)  # {"subscription_id", ...}
    gce_sd: list = field(default_factory=list)  # {"project", "zone", ...}
    digitalocean_sd: list = field(default_factory=list)  # {"port", ...}
    hetzner_sd: list = field(default_factory=list)  # {"role", "port", ...}
    linode_sd: list = field(default_factory=list)  # {"port", ...}
    vultr_sd: list = field(default_factory=list)  # {"port", ...}
    nomad_sd: list = field(default_factory=list)  # {"server", ...}
    eureka_sd: list = field(default_factory=list)  # {"server", ...}
    scaleway_sd: list = field(default_factory=list)  # {"project_id", ...}
    marathon_sd: list = field(default_factory=list)  # {"servers", ...}
    puppetdb_sd: list = field(default_factory=list)  # {"url", "query", ...}
    openstack_sd: list = field(default_factory=list)  # {"role", "region", ...}
    dockerswarm_sd: list = field(default_factory=list)  # {"host", "role", ...}
    docker_sd: list = field(default_factory=list)  # {"host", "port", ...}
    lightsail_sd: list = field(default_factory=list)  # {"region", ...}
    triton_sd: list = field(default_factory=list)  # {"endpoint", ...}
    ovhcloud_sd: list = field(default_factory=list)  # {"service", ...}
    ionos_sd: list = field(default_factory=list)  # {"datacenter_id", ...}
    stackit_sd: list = field(default_factory=list)  # {"project", ...}
    uyuni_sd: list = field(default_factory=list)  # {"server", ...}
    outscale_sd: list = field(default_factory=list)  # {"region", ...}
    serverset_sd: list = field(default_factory=list)  # {"servers", "paths"}
    nerve_sd: list = field(default_factory=list)  # {"servers", "paths"}
    kuma_sd: list = field(default_factory=list)  # {"server", ...}
    oci_sd: list = field(default_factory=list)  # {"region", "tenancy", ...}


@dataclass
class AlertmanagerSet:
    """One ``alertmanagers`` entry: its targets plus ITS OWN relabel
    list — the reference scopes relabeling per alertmanager set
    (discovery + relabel per AlertmanagerConfig, notifier/manager.go),
    never globally across entries."""

    urls: list = field(default_factory=list)
    relabel_configs: list = field(default_factory=list)


@dataclass
class PromConfig:
    scrape_interval_ms: int = DEFAULT_SCRAPE_INTERVAL_MS
    scrape_timeout_ms: int = DEFAULT_SCRAPE_TIMEOUT_MS
    evaluation_interval_ms: int = DEFAULT_EVAL_INTERVAL_MS
    # global rule_query_offset (config.go:496): per-group query_offset
    # overrides it
    rule_query_offset_ms: int = 0
    external_labels: dict = field(default_factory=dict)
    scrape_jobs: list = field(default_factory=list)
    rule_files: list = field(default_factory=list)  # resolved paths
    alertmanager_urls: list = field(default_factory=list)
    alert_relabel_configs: list = field(default_factory=list)
    alertmanager_relabel_configs: list = field(default_factory=list)
    alertmanager_sets: list = field(default_factory=list)  # AlertmanagerSet
    remote_write_urls: list = field(default_factory=list)
    remote_writes: list = field(default_factory=list)  # RemoteWriteConfig
    remote_reads: list = field(default_factory=list)  # RemoteReadConfig
    otlp: dict = field(default_factory=dict)  # config.go OTLPConfig knobs
    # tracing: section (config.go:1223 TracingConfig) — validated and
    # surfaced; span export itself is delegated to Spark's own listener
    # infrastructure rather than an in-process OTel SDK
    tracing: dict = field(default_factory=dict)
    # storage: section (config.go StorageConfig): tsdb.out_of_order_time_window
    # feeds streaming.with_ooo_window; exemplars.max_exemplars the store cap
    ooo_time_window_ms: int = 0
    max_exemplars: int = 100_000
    extra_scrape_metrics: bool = False  # global extra report series
    raw_yaml: str = ""


@dataclass
class RemoteReadConfig:
    """One ``remote_read`` entry (config.go RemoteReadConfig): endpoint,
    client auth/headers, the read_recent switch, and required_matchers
    (queries lacking these equality matchers skip the endpoint)."""

    url: str
    name: str = ""
    remote_timeout_s: float = 60.0
    headers: dict = field(default_factory=dict)
    auth_header: Optional[str] = None
    read_recent: bool = False
    required_matchers: dict = field(default_factory=dict)
    filter_external_labels: bool = True


@dataclass
class RemoteWriteConfig:
    """One ``remote_write`` entry (config.go RemoteWriteConfig +
    QueueConfig defaults, config.go DefaultQueueConfig): endpoint,
    client auth/headers, write relabeling, payload gates, and the
    queue tuning our sharded sender honors."""

    url: str
    name: str = ""
    remote_timeout_s: float = 30.0
    headers: dict = field(default_factory=dict)
    auth_header: Optional[str] = None
    write_relabel_configs: list = field(default_factory=list)
    send_exemplars: bool = False
    send_native_histograms: bool = False
    v2: bool = False  # protobuf_message io.prometheus.write.v2.Request
    # QueueConfig (DefaultQueueConfig: MaxSamplesPerSend 2000,
    # MinBackoff 30ms, MaxBackoff 5s, MaxRetries via sample age)
    max_samples_per_send: int = 2000
    min_backoff_s: float = 0.03
    max_backoff_s: float = 5.0
    retries: int = 3


# headers the tracing/remote clients may not override
# (config.go:48 reservedHeaders)
_RESERVED_HEADERS = {
    "host", "content-encoding", "content-length", "content-type",
    "user-agent", "connection", "keep-alive", "proxy-authenticate",
    "proxy-authorization", "www-authenticate", "accept-encoding",
    "x-prometheus-remote-write-version", "x-prometheus-remote-read-version",
}


def _parse_tracing(t: dict) -> dict:
    """config.go:1240 TracingConfig.UnmarshalYAML: grpc default client,
    endpoint required, http|grpc client types, gzip-only compression,
    no authorization / reserved headers."""
    out = {
        "client_type": str(t.get("client_type", "grpc")),
        "endpoint": str(t.get("endpoint", "") or ""),
        "sampling_fraction": float(t.get("sampling_fraction", 0.0)),
        "insecure": bool(t.get("insecure", False)),
        "headers": dict(t.get("headers") or {}),
        "compression": str(t.get("compression", "") or ""),
        "timeout_ms": _dur_ms(t.get("timeout"), 10_000),
        "tls_config": dict(t.get("tls_config") or {}),
    }
    if out["client_type"] not in ("http", "grpc"):
        raise ValueError(
            "expected tracing client type to be to be http or grpc, "
            f"but got {out['client_type']}"
        )
    for header in out["headers"]:
        if header.lower() == "authorization":
            raise ValueError(
                "custom authorization header configuration is not yet supported"
            )
        if header.lower() in _RESERVED_HEADERS:
            raise ValueError(
                f"{header} is a reserved header. It must not be changed"
            )
    if not out["endpoint"]:
        raise ValueError("tracing endpoint must be set")
    if out["compression"] not in ("", "gzip"):
        raise ValueError(
            f"invalid compression type {out['compression']} provided, "
            "valid options: gzip"
        )
    return out


def load_config(path: str) -> PromConfig:
    """Parse a prometheus.yml (config.go Load/UnmarshalYAML semantics:
    global defaults flow into per-job unset fields; rule_files support
    globs relative to the config file)."""
    with open(path) as f:
        raw = f.read()
    doc = yaml.safe_load(raw) or {}
    if not isinstance(doc, dict):
        raise ValueError("invalid config: top level must be a mapping")
    g = doc.get("global") or {}
    cfg = PromConfig(
        scrape_interval_ms=_dur_ms(
            g.get("scrape_interval"), DEFAULT_SCRAPE_INTERVAL_MS
        ),
        scrape_timeout_ms=_dur_ms(
            g.get("scrape_timeout"), DEFAULT_SCRAPE_TIMEOUT_MS
        ),
        rule_query_offset_ms=_dur_ms(g.get("rule_query_offset"), 0),
        evaluation_interval_ms=_dur_ms(
            g.get("evaluation_interval"), DEFAULT_EVAL_INTERVAL_MS
        ),
        external_labels=dict(g.get("external_labels") or {}),
        raw_yaml=raw,
    )

    base = os.path.dirname(os.path.abspath(path))
    for pat in doc.get("rule_files") or []:
        pat = pat if os.path.isabs(pat) else os.path.join(base, pat)
        cfg.rule_files.extend(sorted(_glob.glob(pat)))

    # scrape_config_files: glob-included YAML files, each a document
    # with its own scrape_configs list (config.go ScrapeConfigFiles /
    # GetScrapeConfigs — included jobs join the inline ones and job
    # names must be globally unique)
    all_scrape_configs = list(doc.get("scrape_configs") or [])
    for pat in doc.get("scrape_config_files") or []:
        pat = pat if os.path.isabs(pat) else os.path.join(base, pat)
        for inc in sorted(_glob.glob(pat)):
            with open(inc) as f:
                sub = yaml.safe_load(f.read()) or {}
            if not isinstance(sub, dict):
                raise ValueError(
                    f"invalid scrape config file {inc}: must be a mapping"
                )
            extra = set(sub) - {"scrape_configs"}
            if extra:  # config.go: only scrape_configs allowed in includes
                raise ValueError(
                    f"invalid field(s) {sorted(extra)} in scrape config "
                    f"file {inc}"
                )
            all_scrape_configs.extend(sub.get("scrape_configs") or [])

    seen_jobs = set()
    for sc in all_scrape_configs:
        job = sc.get("job_name")
        if not job:
            raise ValueError("scrape config missing job_name")
        if job in seen_jobs:  # config.go: job names must be unique
            raise ValueError(f"found multiple scrape configs with job name {job!r}")
        seen_jobs.add(job)
        scheme = sc.get("scheme", "http")
        path_ = sc.get("metrics_path", "/metrics")
        targets: list[str] = []
        raw_targets: list[str] = []
        labels: dict = {}
        static_groups: list[dict] = []
        for static in sc.get("static_configs") or []:
            grp_targets = [str(t) for t in static.get("targets") or []]
            for tgt in grp_targets:
                targets.append(f"{scheme}://{tgt}{path_}")
                raw_targets.append(tgt)
            labels.update(static.get("labels") or {})
            static_groups.append(
                {"targets": grp_targets, "labels": dict(static.get("labels") or {})}
            )
        file_sd = [
            {
                "files": [
                    p if os.path.isabs(p) else os.path.join(base, p)
                    for p in (fs.get("files") or [])
                ],
                "refresh_interval_ms": _dur_ms(fs.get("refresh_interval"), 300_000),
            }
            for fs in sc.get("file_sd_configs") or []
        ]
        http_sd = [
            {
                "url": hs.get("url", ""),
                "refresh_interval_ms": _dur_ms(hs.get("refresh_interval"), 60_000),
            }
            for hs in sc.get("http_sd_configs") or []
        ]
        dns_sd = [
            {
                "names": list(ds.get("names") or []),
                "type": ds.get("type", "SRV"),
                "port": int(ds.get("port", 0)),
                "refresh_interval_ms": _dur_ms(ds.get("refresh_interval"), 30_000),
            }
            for ds in sc.get("dns_sd_configs") or []
        ]
        consul_sd = [
            {
                "server": cs.get("server", "localhost:8500"),
                "services": list(cs.get("services") or []),
                "tags": list(cs.get("tags") or []),
                "datacenter": cs.get("datacenter", ""),
                "scheme": cs.get("scheme", "http"),
                "tag_separator": cs.get("tag_separator", ","),
                "refresh_interval_ms": _dur_ms(cs.get("refresh_interval"), 30_000),
            }
            for cs in sc.get("consul_sd_configs") or []
        ]
        kubernetes_sd = [
            {
                "api_server": ks.get("api_server", ""),
                "role": ks.get("role", "pod"),
                "namespaces": list(
                    (ks.get("namespaces") or {}).get("names") or []
                ),
                "bearer_token": (
                    (ks.get("authorization") or {}).get("credentials", "")
                ),
                "refresh_interval_ms": _dur_ms(ks.get("refresh_interval"), 30_000),
                # incremental watch (informer) mode; list-on-refresh
                # when disabled
                "watch": bool(ks.get("watch", False)),
            }
            for ks in sc.get("kubernetes_sd_configs") or []
        ]
        ec2_sd = [
            {
                "region": es.get("region", ""),
                "access_key": es.get("access_key", ""),
                "secret_key": es.get("secret_key", ""),
                "port": int(es.get("port", 80)),
                "endpoint": es.get("endpoint", ""),
                "refresh_interval_ms": _dur_ms(es.get("refresh_interval"), 60_000),
                "filters": [
                    {"name": f.get("name", ""),
                     "values": list(f.get("values") or [])}
                    for f in es.get("filters") or []
                ],
            }
            for es in sc.get("ec2_sd_configs") or []
        ]
        azure_sd = [
            {
                "subscription_id": az.get("subscription_id", ""),
                "tenant_id": az.get("tenant_id", ""),
                "client_id": az.get("client_id", ""),
                "client_secret": az.get("client_secret", ""),
                "port": int(az.get("port", 80)),
                "resource_group": az.get("resource_group", ""),
                "refresh_interval_ms": _dur_ms(az.get("refresh_interval"), 300_000),
            }
            for az in sc.get("azure_sd_configs") or []
        ]
        gce_sd = [
            {
                "project": gs.get("project", ""),
                "zone": gs.get("zone", ""),
                "port": int(gs.get("port", 80)),
                "filter": gs.get("filter", ""),
                "tag_separator": gs.get("tag_separator", ","),
                "refresh_interval_ms": _dur_ms(gs.get("refresh_interval"), 60_000),
            }
            for gs in sc.get("gce_sd_configs") or []
        ]
        digitalocean_sd = [
            {
                "port": int(ds.get("port", 80)),
                "refresh_interval_ms": _dur_ms(ds.get("refresh_interval"), 60_000),
            }
            for ds in sc.get("digitalocean_sd_configs") or []
        ]
        hetzner_sd = [
            {
                "role": hz.get("role", "hcloud"),
                "port": int(hz.get("port", 80)),
                "refresh_interval_ms": _dur_ms(hz.get("refresh_interval"), 60_000),
            }
            for hz in sc.get("hetzner_sd_configs") or []
        ]
        linode_sd = [
            {
                "port": int(ls.get("port", 80)),
                "tag_separator": ls.get("tag_separator", ","),
                "refresh_interval_ms": _dur_ms(ls.get("refresh_interval"), 60_000),
            }
            for ls in sc.get("linode_sd_configs") or []
        ]
        vultr_sd = [
            {
                "port": int(vs.get("port", 80)),
                "refresh_interval_ms": _dur_ms(vs.get("refresh_interval"), 60_000),
            }
            for vs in sc.get("vultr_sd_configs") or []
        ]
        nomad_sd = [
            {
                "server": ns.get("server", "http://localhost:4646"),
                "namespace": ns.get("namespace", "default"),
                "region": ns.get("region", "global"),
                "tag_separator": ns.get("tag_separator", ","),
                "refresh_interval_ms": _dur_ms(ns.get("refresh_interval"), 60_000),
            }
            for ns in sc.get("nomad_sd_configs") or []
        ]
        eureka_sd = [
            {
                "server": eu.get("server", ""),
                "refresh_interval_ms": _dur_ms(eu.get("refresh_interval"), 30_000),
            }
            for eu in sc.get("eureka_sd_configs") or []
        ]
        scaleway_sd = [
            {
                "project_id": sw.get("project_id", ""),
                "zone": sw.get("zone", "fr-par-1"),
                "port": int(sw.get("port", 80)),
                "refresh_interval_ms": _dur_ms(sw.get("refresh_interval"), 60_000),
            }
            for sw in sc.get("scaleway_sd_configs") or []
        ]
        marathon_sd = [
            {
                "servers": list(ms.get("servers") or []),
                "auth_token": ms.get("auth_token", ""),
                "refresh_interval_ms": _dur_ms(ms.get("refresh_interval"), 30_000),
            }
            for ms in sc.get("marathon_sd_configs") or []
        ]
        puppetdb_sd = [
            {
                "url": ps.get("url", ""),
                "query": ps.get("query", ""),
                "port": int(ps.get("port", 80)),
                "include_parameters": bool(ps.get("include_parameters", False)),
                "refresh_interval_ms": _dur_ms(ps.get("refresh_interval"), 60_000),
            }
            for ps in sc.get("puppetdb_sd_configs") or []
        ]
        openstack_sd = [
            {
                "role": os_.get("role", "instance"),
                "region": os_.get("region", ""),
                "identity_endpoint": os_.get("identity_endpoint", ""),
                "username": os_.get("username", ""),
                "password": os_.get("password", ""),
                "project_name": os_.get("project_name", ""),
                "domain_name": os_.get("domain_name", "Default"),
                "all_tenants": bool(os_.get("all_tenants", False)),
                "port": int(os_.get("port", 80)),
                "refresh_interval_ms": _dur_ms(os_.get("refresh_interval"), 60_000),
            }
            for os_ in sc.get("openstack_sd_configs") or []
        ]
        dockerswarm_sd = [
            {
                "host": dw.get("host", ""),
                "role": dw.get("role", "tasks"),
                "port": int(dw.get("port", 80)),
                "refresh_interval_ms": _dur_ms(dw.get("refresh_interval"), 60_000),
            }
            for dw in sc.get("dockerswarm_sd_configs") or []
        ]
        docker_sd = [
            {
                "host": dk.get("host", ""),
                "port": int(dk.get("port", 80)),
                "host_networking_host": dk.get("host_networking_host", "localhost"),
                "match_first_network": bool(dk.get("match_first_network", True)),
                "refresh_interval_ms": _dur_ms(dk.get("refresh_interval"), 60_000),
            }
            for dk in sc.get("docker_sd_configs") or []
        ]
        lightsail_sd = [
            {
                "region": lg.get("region", ""),
                "access_key": lg.get("access_key", ""),
                "secret_key": lg.get("secret_key", ""),
                "port": int(lg.get("port", 80)),
                "endpoint": lg.get("endpoint", ""),
                "refresh_interval_ms": _dur_ms(lg.get("refresh_interval"), 60_000),
            }
            for lg in sc.get("lightsail_sd_configs") or []
        ]
        triton_sd = [
            {
                "endpoint": tr.get("endpoint", ""),
                "dns_suffix": tr.get("dns_suffix", "triton.zone"),
                "role": tr.get("role", "container"),
                "port": int(tr.get("port", 9163)),
                "version": int(tr.get("version", 1)),
                "groups": list(tr.get("groups") or []),
                "refresh_interval_ms": _dur_ms(tr.get("refresh_interval"), 60_000),
            }
            for tr in sc.get("triton_sd_configs") or []
        ]
        ovhcloud_sd = [
            {
                "application_key": ov.get("application_key", ""),
                "application_secret": ov.get("application_secret", ""),
                "consumer_key": ov.get("consumer_key", ""),
                "service": ov.get("service", "vps"),
                "endpoint": ov.get("endpoint", "https://eu.api.ovh.com/1.0"),
                "refresh_interval_ms": _dur_ms(ov.get("refresh_interval"), 60_000),
            }
            for ov in sc.get("ovhcloud_sd_configs") or []
        ]
        ionos_sd = [
            {
                "datacenter_id": io.get("datacenter_id", ""),
                "port": int(io.get("port", 80)),
                "refresh_interval_ms": _dur_ms(io.get("refresh_interval"), 60_000),
            }
            for io in sc.get("ionos_sd_configs") or []
        ]
        stackit_sd = [
            {
                "project": st.get("project", ""),
                "port": int(st.get("port", 80)),
                "region": st.get("region", "eu01"),
                "endpoint": st.get("endpoint", ""),
                "refresh_interval_ms": _dur_ms(st.get("refresh_interval"), 60_000),
            }
            for st in sc.get("stackit_sd_configs") or []
        ]
        uyuni_sd = [
            {
                "server": uy.get("server", ""),
                "username": uy.get("username", ""),
                "password": uy.get("password", ""),
                "entitlement": uy.get("entitlement", "monitoring_entitled"),
                "separator": uy.get("separator", ","),
                "refresh_interval_ms": _dur_ms(uy.get("refresh_interval"), 60_000),
            }
            for uy in sc.get("uyuni_sd_configs") or []
        ]
        outscale_sd = [
            {
                "region": ot.get("region", ""),
                "access_key": ot.get("access_key", ""),
                "secret_key": ot.get("secret_key", ""),
                "port": int(ot.get("port", 80)),
                "endpoint": ot.get("endpoint", ""),
                "refresh_interval_ms": _dur_ms(ot.get("refresh_interval"), 60_000),
            }
            for ot in sc.get("outscale_sd_configs") or []
        ]
        serverset_sd = [
            {
                "servers": list(zs.get("servers") or []),
                "paths": list(zs.get("paths") or []),
                "timeout_s": float(zs.get("timeout", 10)),
            }
            for zs in sc.get("serverset_sd_configs") or []
        ]
        nerve_sd = [
            {
                "servers": list(zs.get("servers") or []),
                "paths": list(zs.get("paths") or []),
                "timeout_s": float(zs.get("timeout", 10)),
            }
            for zs in sc.get("nerve_sd_configs") or []
        ]
        kuma_sd = [
            {
                "server": km.get("server", ""),
                "client_id": km.get("client_id", "prometheus_spark"),
                "refresh_interval_ms": _dur_ms(km.get("refresh_interval"), 15_000),
            }
            for km in sc.get("kuma_sd_configs") or []
        ]
        oci_sd = [
            {
                "region": oc.get("region", ""),
                "tenancy": oc.get("tenancy", ""),
                "user": oc.get("user", ""),
                "fingerprint": oc.get("fingerprint", ""),
                "private_key_pem": oc.get("private_key", ""),
                "compartments": list(oc.get("compartments") or []),
                "port": int(oc.get("port", 9100)),
                "refresh_interval_ms": _dur_ms(oc.get("refresh_interval"), 60_000),
            }
            for oc in sc.get("oci_sd_configs") or []
        ]
        cfg.scrape_jobs.append(
            ScrapeJobConfig(
                job_name=job,
                targets=targets,
                labels=labels,
                scrape_interval_ms=_dur_ms(
                    sc.get("scrape_interval"), cfg.scrape_interval_ms
                ),
                scrape_timeout_ms=_dur_ms(
                    sc.get("scrape_timeout"), cfg.scrape_timeout_ms
                ),
                honor_labels=bool(sc.get("honor_labels", False)),
                honor_timestamps=bool(sc.get("honor_timestamps", True)),
                scrape_protocols=tuple(sc.get("scrape_protocols") or ()),
                auth_header=_auth_header(sc),
                scrape_native_histograms=bool(
                    sc.get("scrape_native_histograms", False)
                ),
                convert_classic_histograms_to_nhcb=bool(
                    sc.get("convert_classic_histograms_to_nhcb", False)
                ),
                always_scrape_classic_histograms=bool(
                    sc.get("always_scrape_classic_histograms", False)
                ),
                enable_compression=bool(sc.get("enable_compression", True)),
                follow_redirects=bool(sc.get("follow_redirects", True)),
                fallback_scrape_protocol=str(
                    sc.get("fallback_scrape_protocol", "") or ""
                ),
                track_timestamps_staleness=bool(
                    sc.get("track_timestamps_staleness", False)
                ),
                keep_dropped_targets=int(sc.get("keep_dropped_targets", 0)),
                relabel_configs=_relabels(sc.get("relabel_configs")),
                metric_relabel_configs=_relabels(
                    sc.get("metric_relabel_configs")
                ),
                sample_limit=int(sc.get("sample_limit", 0)),
                label_limit=int(sc.get("label_limit", 0)),
                label_name_length_limit=int(
                    sc.get("label_name_length_limit", 0)
                ),
                label_value_length_limit=int(
                    sc.get("label_value_length_limit", 0)
                ),
                body_size_limit=_size_bytes(sc.get("body_size_limit", 0)),
                target_limit=int(sc.get("target_limit", 0)),
                native_histogram_bucket_limit=int(
                    sc.get("native_histogram_bucket_limit", 0)
                ),
                native_histogram_min_bucket_factor=float(
                    sc.get("native_histogram_min_bucket_factor", 0.0)
                ),
                metric_name_validation_scheme=_validation_scheme(
                    sc.get(
                        "metric_name_validation_scheme",
                        g.get("metric_name_validation_scheme", "utf8"),
                    )
                ),
                metric_name_escaping_scheme=_escaping_scheme(
                    sc.get(
                        "metric_name_escaping_scheme",
                        g.get("metric_name_escaping_scheme", ""),
                    )
                ),
                scrape_failure_log_file=str(
                    sc.get(
                        "scrape_failure_log_file",
                        g.get("scrape_failure_log_file", ""),
                    )
                    or ""
                ),
                scheme=scheme,
                metrics_path=path_,
                params=dict(sc.get("params") or {}),
                raw_targets=raw_targets,
                static_groups=static_groups,
                file_sd=file_sd,
                http_sd=http_sd,
                dns_sd=dns_sd,
                consul_sd=consul_sd,
                kubernetes_sd=kubernetes_sd,
                ec2_sd=ec2_sd,
                azure_sd=azure_sd,
                gce_sd=gce_sd,
                digitalocean_sd=digitalocean_sd,
                hetzner_sd=hetzner_sd,
                linode_sd=linode_sd,
                vultr_sd=vultr_sd,
                nomad_sd=nomad_sd,
                eureka_sd=eureka_sd,
                scaleway_sd=scaleway_sd,
                marathon_sd=marathon_sd,
                puppetdb_sd=puppetdb_sd,
                openstack_sd=openstack_sd,
                dockerswarm_sd=dockerswarm_sd,
                docker_sd=docker_sd,
                lightsail_sd=lightsail_sd,
                triton_sd=triton_sd,
                ovhcloud_sd=ovhcloud_sd,
                ionos_sd=ionos_sd,
                stackit_sd=stackit_sd,
                uyuni_sd=uyuni_sd,
                outscale_sd=outscale_sd,
                serverset_sd=serverset_sd,
                nerve_sd=nerve_sd,
                kuma_sd=kuma_sd,
                oci_sd=oci_sd,
            )
        )

    alerting = doc.get("alerting") or {}
    cfg.alert_relabel_configs = _relabels(
        alerting.get("alert_relabel_configs")
    )
    for am in alerting.get("alertmanagers") or []:
        scheme = am.get("scheme", "http")
        path_prefix = am.get("path_prefix", "")
        # relabel_configs are scoped PER alertmanagers entry (the
        # reference's AlertmanagerConfig each carries its own list) —
        # one entry's rules never apply to another entry's targets
        am_relabels = _relabels(am.get("relabel_configs"))
        am_urls = []
        for static in am.get("static_configs") or []:
            for tgt in static.get("targets") or []:
                am_urls.append(f"{scheme}://{tgt}{path_prefix}")
        cfg.alertmanager_urls.extend(am_urls)
        cfg.alertmanager_sets.append(AlertmanagerSet(am_urls, am_relabels))
        if am_relabels:  # legacy flat field, kept for inspection
            cfg.alertmanager_relabel_configs = am_relabels

    for rw in doc.get("remote_write") or []:
        if not rw.get("url"):
            continue
        cfg.remote_write_urls.append(rw["url"])
        qc = rw.get("queue_config") or {}
        cfg.remote_writes.append(
            RemoteWriteConfig(
                url=rw["url"],
                name=rw.get("name", ""),
                remote_timeout_s=_dur_ms(rw.get("remote_timeout"), 30_000)
                / 1000.0,
                headers=dict(rw.get("headers") or {}),
                auth_header=_auth_header(rw),
                write_relabel_configs=_relabels(
                    rw.get("write_relabel_configs")
                ),
                send_exemplars=bool(rw.get("send_exemplars", False)),
                send_native_histograms=bool(
                    rw.get("send_native_histograms", False)
                ),
                v2=str(rw.get("protobuf_message", "")).endswith(
                    "write.v2.Request"
                ),
                max_samples_per_send=int(
                    qc.get("max_samples_per_send", 2000)
                ),
                min_backoff_s=_dur_ms(qc.get("min_backoff"), 30) / 1000.0,
                max_backoff_s=_dur_ms(qc.get("max_backoff"), 5_000) / 1000.0,
            )
        )

    for rr in doc.get("remote_read") or []:
        if not rr.get("url"):
            continue
        cfg.remote_reads.append(
            RemoteReadConfig(
                url=rr["url"],
                name=rr.get("name", ""),
                remote_timeout_s=_dur_ms(rr.get("remote_timeout"), 60_000)
                / 1000.0,
                headers=dict(rr.get("headers") or {}),
                auth_header=_auth_header(rr),
                read_recent=bool(rr.get("read_recent", False)),
                required_matchers=dict(rr.get("required_matchers") or {}),
                filter_external_labels=bool(
                    rr.get("filter_external_labels", True)
                ),
            )
        )

    if isinstance(doc.get("otlp"), dict):
        cfg.otlp = dict(doc["otlp"])

    if isinstance(doc.get("tracing"), dict):
        cfg.tracing = _parse_tracing(doc["tracing"])

    g = doc.get("global") or {}
    if g.get("extra_scrape_metrics") is not None:
        cfg.extra_scrape_metrics = bool(g["extra_scrape_metrics"])

    storage = doc.get("storage") or {}
    tsdb = storage.get("tsdb") or {}
    if tsdb.get("out_of_order_time_window") is not None:
        cfg.ooo_time_window_ms = _dur_ms(tsdb["out_of_order_time_window"], 0)
    ex = storage.get("exemplars") or {}
    if ex.get("max_exemplars") is not None:
        cfg.max_exemplars = int(ex["max_exemplars"])
    return cfg


def build_server(
    spark,
    cfg: PromConfig,
    samples=None,
    spool_dir: str = "/tmp/prom_spool",
    concurrent_rule_eval: bool = False,
    max_concurrent_evals: int = 4,
    feature_flags: Optional[list] = None,
):
    """Assemble the runtime from a loaded config: scrape manager (one
    target list across jobs, per-job labels + metric relabeling), rule
    groups from rule_files, notifier, and the /api/v1 surface — the
    same wiring cmd/prometheus/main.go performs on the reference.

    ``concurrent_rule_eval`` / ``max_concurrent_evals`` mirror the
    reference's ``--enable-feature=concurrent-rule-eval`` and
    ``--rules.max-concurrent-evals`` flags (rules/manager.go:176-181);
    the semaphore is engine-global, i.e. shared across groups.

    ``feature_flags`` mirrors ``--enable-feature`` (cmd/prometheus/
    main.go:230-330) for the flags this engine implements:
    ``created-timestamp-zero-ingestion``, ``st-synthesis``,
    ``type-and-unit-labels``, ``concurrent-rule-eval``,
    ``promql-per-step-stats``.  Unknown flags raise, like the
    reference's fatal startup error.

    Returns a dict of components; callers drive the tick/scrape loops
    (or call .start() on each) so tests and notebooks stay in control of
    time.
    """
    from prometheus_spark.sources.discovery import (
        AzureDiscovery,
        ConsulDiscovery,
        DigitalOceanDiscovery,
        DockerDiscovery,
        DockerSwarmDiscovery,
        EC2Discovery,
        EurekaDiscovery,
        GCEDiscovery,
        HetznerDiscovery,
        LinodeDiscovery,
        MarathonDiscovery,
        NomadDiscovery,
        PuppetDBDiscovery,
        ScalewayDiscovery,
        StackitDiscovery,
        TritonDiscovery,
        UyuniDiscovery,
        ZookeeperDiscovery,
        VultrDiscovery,
        KubernetesDiscovery,
        KumaDiscovery,
        LightsailDiscovery,
        DiscoveryManager,
        DNSDiscovery,
        FileDiscovery,
        HTTPDiscovery,
        IonosDiscovery,
        StaticDiscovery,
        TargetGroup,
    )
    from prometheus_spark.sources.relabel import process_labels
    from prometheus_spark.sources.scrape import ScrapeManager
    from prometheus_spark.streaming.notifier import NotifierManager
    from prometheus_spark.streaming.rulefmt import load_rule_file
    from prometheus_spark.web.api import PromAPI

    # targets flow through the discovery layer even for static configs:
    # one PopulateLabels path (relabel → URL re-derivation from
    # post-relabel __address__/__scheme__/__metrics_path__/__param_*)
    discovery = DiscoveryManager()
    metric_relabel_by_job: dict[str, list] = {}
    for jobcfg in cfg.scrape_jobs:
        metric_relabel_by_job[jobcfg.job_name] = jobcfg.metric_relabel_configs
        providers: list = []
        if jobcfg.static_groups:
            providers.append(
                StaticDiscovery(
                    [
                        TargetGroup(g["targets"], g["labels"])
                        for g in jobcfg.static_groups
                    ]
                )
            )
        for fs in jobcfg.file_sd:
            providers.append(
                FileDiscovery(fs["files"], fs["refresh_interval_ms"])
            )
        for hs in jobcfg.http_sd:
            providers.append(
                HTTPDiscovery(hs["url"], hs["refresh_interval_ms"])
            )
        for ds in jobcfg.dns_sd:
            providers.append(
                DNSDiscovery(
                    ds["names"], ds["type"], ds["port"],
                    ds["refresh_interval_ms"],
                )
            )
        for cs in jobcfg.consul_sd:
            providers.append(
                ConsulDiscovery(
                    cs["server"], cs["services"], cs["tags"],
                    cs["datacenter"], cs["scheme"], cs["tag_separator"],
                    cs["refresh_interval_ms"],
                )
            )
        for ks in jobcfg.kubernetes_sd:
            providers.append(
                KubernetesDiscovery(
                    ks["api_server"], ks["role"], ks["namespaces"],
                    ks["bearer_token"], ks["refresh_interval_ms"],
                    watch=ks["watch"],
                )
            )
        for es in jobcfg.ec2_sd:
            providers.append(
                EC2Discovery(
                    es["region"], es["access_key"], es["secret_key"],
                    es["port"], es["endpoint"], es["refresh_interval_ms"],
                    filters=es["filters"],
                )
            )
        for az in jobcfg.azure_sd:
            providers.append(
                AzureDiscovery(
                    az["subscription_id"], az["tenant_id"],
                    az["client_id"], az["client_secret"], az["port"],
                    az["resource_group"],
                    refresh_interval_ms=az["refresh_interval_ms"],
                )
            )
        for gs in jobcfg.gce_sd:
            providers.append(
                GCEDiscovery(
                    gs["project"], gs["zone"], gs["port"], gs["filter"],
                    gs["tag_separator"],
                    refresh_interval_ms=gs["refresh_interval_ms"],
                )
            )
        for ds in jobcfg.digitalocean_sd:
            providers.append(
                DigitalOceanDiscovery(
                    port=ds["port"],
                    refresh_interval_ms=ds["refresh_interval_ms"],
                )
            )
        for hz in jobcfg.hetzner_sd:
            providers.append(
                HetznerDiscovery(
                    role=hz["role"], port=hz["port"],
                    refresh_interval_ms=hz["refresh_interval_ms"],
                )
            )
        for ls in jobcfg.linode_sd:
            providers.append(
                LinodeDiscovery(
                    port=ls["port"], tag_separator=ls["tag_separator"],
                    refresh_interval_ms=ls["refresh_interval_ms"],
                )
            )
        for vs in jobcfg.vultr_sd:
            providers.append(
                VultrDiscovery(
                    port=vs["port"],
                    refresh_interval_ms=vs["refresh_interval_ms"],
                )
            )
        for ns in jobcfg.nomad_sd:
            providers.append(
                NomadDiscovery(
                    ns["server"], ns["namespace"], ns["region"],
                    ns["tag_separator"],
                    refresh_interval_ms=ns["refresh_interval_ms"],
                )
            )
        for eu in jobcfg.eureka_sd:
            providers.append(
                EurekaDiscovery(
                    eu["server"],
                    refresh_interval_ms=eu["refresh_interval_ms"],
                )
            )
        for sw in jobcfg.scaleway_sd:
            providers.append(
                ScalewayDiscovery(
                    sw["project_id"], sw["zone"], port=sw["port"],
                    refresh_interval_ms=sw["refresh_interval_ms"],
                )
            )
        for ms in jobcfg.marathon_sd:
            providers.append(
                MarathonDiscovery(
                    ms["servers"], ms["auth_token"],
                    refresh_interval_ms=ms["refresh_interval_ms"],
                )
            )
        for ps in jobcfg.puppetdb_sd:
            providers.append(
                PuppetDBDiscovery(
                    ps["url"], ps["query"], ps["port"],
                    ps["include_parameters"],
                    refresh_interval_ms=ps["refresh_interval_ms"],
                )
            )
        for os_ in jobcfg.openstack_sd:
            providers.append(
                OpenStackDiscovery(
                    os_["role"], os_["region"], os_["identity_endpoint"],
                    os_["username"], os_["password"], os_["project_name"],
                    os_["domain_name"], os_["all_tenants"], os_["port"],
                    refresh_interval_ms=os_["refresh_interval_ms"],
                )
            )
        for dw in jobcfg.dockerswarm_sd:
            providers.append(
                DockerSwarmDiscovery(
                    dw["host"], dw["role"], dw["port"],
                    refresh_interval_ms=dw["refresh_interval_ms"],
                )
            )
        for dk in jobcfg.docker_sd:
            providers.append(
                DockerDiscovery(
                    dk["host"], dk["port"], dk["host_networking_host"],
                    dk["match_first_network"],
                    refresh_interval_ms=dk["refresh_interval_ms"],
                )
            )
        for lg in jobcfg.lightsail_sd:
            providers.append(
                LightsailDiscovery(
                    lg["region"], lg["access_key"], lg["secret_key"],
                    lg["port"], lg["endpoint"],
                    refresh_interval_ms=lg["refresh_interval_ms"],
                )
            )
        for tr in jobcfg.triton_sd:
            providers.append(
                TritonDiscovery(
                    tr["endpoint"], tr["dns_suffix"], tr["role"],
                    tr["port"], tr["version"], tr["groups"],
                    refresh_interval_ms=tr["refresh_interval_ms"],
                )
            )
        for ov in jobcfg.ovhcloud_sd:
            providers.append(
                OVHcloudDiscovery(
                    ov["application_key"], ov["application_secret"],
                    ov["consumer_key"], ov["service"], ov["endpoint"],
                    refresh_interval_ms=ov["refresh_interval_ms"],
                )
            )
        for io in jobcfg.ionos_sd:
            providers.append(
                IonosDiscovery(
                    io["datacenter_id"], port=io["port"],
                    refresh_interval_ms=io["refresh_interval_ms"],
                )
            )
        for st in jobcfg.stackit_sd:
            providers.append(
                StackitDiscovery(
                    st["project"], port=st["port"], region=st["region"],
                    endpoint=st["endpoint"],
                    refresh_interval_ms=st["refresh_interval_ms"],
                )
            )
        for uy in jobcfg.uyuni_sd:
            providers.append(
                UyuniDiscovery(
                    uy["server"], uy["username"], uy["password"],
                    uy["entitlement"], uy["separator"],
                    refresh_interval_ms=uy["refresh_interval_ms"],
                )
            )
        for ot in jobcfg.outscale_sd:
            providers.append(
                OutscaleDiscovery(
                    ot["region"], ot["access_key"], ot["secret_key"],
                    ot["port"], ot["endpoint"],
                    refresh_interval_ms=ot["refresh_interval_ms"],
                )
            )
        for zs in jobcfg.serverset_sd:
            providers.append(
                ZookeeperDiscovery(
                    zs["servers"], zs["paths"], "serverset",
                    timeout_s=zs["timeout_s"],
                )
            )
        for zs in jobcfg.nerve_sd:
            providers.append(
                ZookeeperDiscovery(
                    zs["servers"], zs["paths"], "nerve",
                    timeout_s=zs["timeout_s"],
                )
            )
        for km in jobcfg.kuma_sd:
            providers.append(
                KumaDiscovery(
                    km["server"], km["client_id"],
                    refresh_interval_ms=km["refresh_interval_ms"],
                )
            )
        for oc in jobcfg.oci_sd:
            providers.append(
                OCIDiscovery(
                    oc["region"], oc["tenancy"], oc["user"],
                    oc["fingerprint"], oc["private_key_pem"],
                    oc["compartments"], oc["port"],
                    refresh_interval_ms=oc["refresh_interval_ms"],
                )
            )
        discovery.register(jobcfg, providers)

    def metric_relabel(labels: dict):
        job = labels.get("job", "")
        return process_labels(labels, metric_relabel_by_job.get(job, []))

    known_flags = {
        "created-timestamp-zero-ingestion",
        "st-synthesis",
        "type-and-unit-labels",
        "concurrent-rule-eval",
        "promql-per-step-stats",
        "extra-scrape-metrics",
        "otlp-deltatocumulative",
        "otlp-native-delta-ingestion",
    }
    flags = set(feature_flags or ())
    unknown = flags - known_flags
    if unknown:
        raise ValueError(f"unknown feature flag(s): {sorted(unknown)}")
    if "concurrent-rule-eval" in flags:
        concurrent_rule_eval = True

    scrape_mgr = ScrapeManager(
        spool_dir, discovery.targets(), metric_relabel=metric_relabel,
        timeout_s=cfg.scrape_timeout_ms / 1000.0,
        extra_scrape_metrics=(
            cfg.extra_scrape_metrics or "extra-scrape-metrics" in flags
        ),
        enable_st_zero_ingestion="created-timestamp-zero-ingestion" in flags,
        synthesize_st_enabled="st-synthesis" in flags,
        enable_type_and_unit_labels="type-and-unit-labels" in flags,
    )

    rule_groups = []
    for rf in cfg.rule_files:
        rule_groups.extend(load_rule_file(rf))

    notifier = NotifierManager(
        cfg.alertmanager_urls,
        external_labels=cfg.external_labels,
        relabel_configs=cfg.alert_relabel_configs,
        alertmanager_sets=[
            (s.urls, s.relabel_configs) for s in cfg.alertmanager_sets
        ]
        or None,
    )

    engine = None
    rules_engine = None
    if samples is not None:
        from prometheus_spark.engine import PromQLEngine
        from prometheus_spark.streaming.rules import RulesEngine

        # convert_classic_histograms_to_nhcb (config.go:534): fold the
        # flagged jobs' classic bucket series into native-histogram-
        # with-custom-buckets rows before the engine sees them; jobs
        # without the flag keep their classic series untouched.
        nhcb_jobs = {
            j.job_name
            for j in cfg.scrape_jobs
            if getattr(j, "convert_classic_histograms_to_nhcb", False)
        }
        if nhcb_jobs:
            from pyspark.sql import functions as F

            from prometheus_spark.sources.nhcb import classic_to_nhcb

            from prometheus_spark.model.schema import HISTOGRAM_TYPE

            if "hist" not in samples.columns:
                samples = samples.withColumn(
                    "hist", F.lit(None).cast(HISTOGRAM_TYPE)
                )
            in_scope = F.element_at("labels", "job").isin(*nhcb_jobs)
            keep = any(
                getattr(j, "always_scrape_classic_histograms", False)
                for j in cfg.scrape_jobs
                if j.job_name in nhcb_jobs
            )
            # allowMissingColumns: the fold emits the canonical 7-column
            # frame; extra columns on the input (e.g. ``st`` created
            # timestamps) come back NULL on folded rows
            samples = classic_to_nhcb(
                samples.filter(in_scope), keep_classic=keep
            ).unionByName(samples.filter(~in_scope), allowMissingColumns=True)

        engine = PromQLEngine(spark, samples)
        rules_engine = RulesEngine(
            spark,
            samples,
            concurrent_eval=concurrent_rule_eval,
            max_concurrent=max_concurrent_evals,
            default_rule_query_offset_ms=cfg.rule_query_offset_ms,
        )

    api = PromAPI(
        engine,
        rule_groups=rule_groups,
        rules_engine=rules_engine,
        scrape_manager=scrape_mgr,
        per_step_stats="promql-per-step-stats" in flags,
    )
    api.config_yaml = cfg.raw_yaml
    # reference serveFlags returns a flag-name → string-value map
    api.flags = {"enable-feature": ",".join(sorted(flags))}
    api.notifier = notifier
    api.discovery = discovery  # /targets droppedTargets source
    # push-ingest receivers share the scrape spool; the main server then
    # serves /api/v1/write and /api/v1/otlp/v1/metrics out of the box
    from prometheus_spark.sources.otlp import OTLPReceiver
    from prometheus_spark.sources.remote_write import RemoteWriteReceiver

    api.remote_write_receiver = RemoteWriteReceiver(spool_dir)
    api.otlp_receiver = OTLPReceiver(
        spool_dir,
        otlp_config=cfg.otlp,
        convert_delta="otlp-deltatocumulative" in flags,
        native_delta="otlp-native-delta-ingestion" in flags,
        enable_type_and_unit_labels="type-and-unit-labels" in flags,
    )
    # scrape + push exemplars share spool_dir/_exemplars; re-read per
    # query so /api/v1/query_exemplars sees fresh scrapes
    api.exemplars_fn = lambda: scrape_mgr.exemplars_df(spark)
    # /api/v1/targets/relabel_steps debug surface
    api.relabel_configs_by_pool = {
        j.job_name: j.relabel_configs for j in cfg.scrape_jobs
    }
    # tracing manager: install/replace the span provider from the
    # config's tracing section (cmd/prometheus/main.go wires
    # tracing.Manager into the reloaders list; tracing.go:71 ApplyConfig)
    from prometheus_spark.tracing import Manager as TracingManager

    tracing_mgr = TracingManager()
    # Always apply — an empty/removed tracing: section must DEINSTALL a
    # provider left live by a previous build (tracing.go ApplyConfig
    # shuts down on empty config; reloads go through a fresh Manager
    # here, and Manager.stop() tears down the global either way).
    try:
        tracing_mgr.apply_config(cfg.tracing)
    except RuntimeError as exc:
        # grpc exporter needs the optional opentelemetry dependency;
        # run without tracing rather than failing startup
        import logging

        logging.getLogger(__name__).warning("tracing disabled: %s", exc)

    return {
        "config": cfg,
        "discovery": discovery,
        "scrape_manager": scrape_mgr,
        "rule_groups": rule_groups,
        "notifier": notifier,
        "engine": engine,
        "rules_engine": rules_engine,
        "api": api,
        "tracing": tracing_mgr,
    }


def generate_checksum(config_path: str) -> str:
    """config/reload.go:33 GenerateChecksum: sha256 over the main YAML
    plus every referenced rule file and scrape-config file (prefix-
    tagged, NUL-separated, glob-expanded) — changes to ANY of them flip
    the checksum, so auto-reload catches rule-file edits too."""
    import glob as _glob
    import hashlib
    import os as _os

    h = hashlib.sha256()
    with open(config_path, "rb") as f:
        content = f.read()
    h.update(content)
    doc = yaml.safe_load(content.decode()) or {}
    base = _os.path.dirname(_os.path.abspath(config_path))

    def joined(patterns):
        return [
            p if _os.path.isabs(p) else _os.path.join(base, p)
            for p in patterns or []
        ]

    files = {
        "r": joined(doc.get("rule_files")),
        "s": joined(doc.get("scrape_config_files")),
    }
    for prefix in ("r", "s"):
        for pattern in files[prefix]:
            for path in sorted(_glob.glob(pattern)):
                h.update((prefix + "\x00" + path + "\x00").encode())
                with open(path, "rb") as f:
                    h.update(f.read())
                h.update(b"\x00")
    return h.hexdigest()


class ConfigWatcher:
    """--config.auto-reload (cmd/prometheus/main.go:419,1360): poll the
    config checksum every ``interval_s`` and call ``reload_fn()`` when
    it changes.  The reload callback owns the actual re-assembly (e.g.
    load_config + build_server swap, or the /-/reload handler);
    callback failures are recorded and never kill the watcher."""

    def __init__(self, config_path: str, reload_fn, interval_s: float = 30.0):
        import threading as _threading

        self.config_path = config_path
        self.reload_fn = reload_fn
        self.interval_s = max(1.0, interval_s)  # main.go:685 floor of 1s
        self.checksum = None
        self.reloads = 0
        self.last_error = None
        self._stop = _threading.Event()
        self._thread = None

    def check_once(self) -> bool:
        """One poll; returns True when a reload fired."""
        try:
            current = generate_checksum(self.config_path)
        except Exception as e:  # noqa: BLE001 — half-written YAML during a
            # non-atomic editor save raises yaml/decode errors, not just
            # OSError; the watcher must survive ALL of them and retry
            self.last_error = e
            return False
        if self.checksum is None:
            self.checksum = current
            return False
        if current == self.checksum:
            return False
        try:
            self.reload_fn()
            self.reloads += 1
            self.checksum = current
            return True
        except Exception as e:  # noqa: BLE001 — keep watching
            self.last_error = e
            # checksum NOT advanced: a failed reload retries next poll
            return False

    def start(self):
        import threading as _threading

        def loop():
            while not self._stop.is_set():
                try:
                    self.check_once()
                except Exception as e:  # noqa: BLE001 — belt and braces:
                    # the poll thread must never die
                    self.last_error = e
                self._stop.wait(self.interval_s)

        self._thread = _threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self._thread

    def stop(self):
        self._stop.set()
