"""Service discovery: static, file-based, and HTTP target providers.

Reference surfaces re-derived here (behavior, not code):
- discovery/file/file.go:184 — ``Discovery.refresh``: glob patterns over
  JSON/YAML files, each file a list of target groups
  ``[{"targets": [...], "labels": {...}}]``; every group gets a
  ``__meta_filepath`` label; a file that fails to parse keeps its last
  good target set.
- discovery/http/http.go:57 — ``Discovery.Refresh``: GET a URL that
  returns the same JSON shape; groups get ``__meta_url``; fetch failure
  keeps the previous set.
- scrape/target.go ``PopulateLabels`` — the relabel-visible pre-scrape
  label set (``__address__``, ``__scheme__``, ``__metrics_path__``,
  ``__param_*``) and the post-relabel URL re-derivation, ``instance``
  defaulting, and meta-label stripping.

The providers are driver-side by design (they move *target lists*, never
samples); everything downstream of the scrape body stays distributed.
"""

from __future__ import annotations

import glob as _glob
import json
import re
import threading
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Optional
from urllib.parse import urlencode

from prometheus_spark.sources.relabel import process_labels
from prometheus_spark.sources.scrape import (
    DEFAULT_SCRAPE_PROTOCOLS,
    PROTO_FIRST_SCRAPE_PROTOCOLS,
    ScrapeTarget,
)


@dataclass
class TargetGroup:
    """discovery/targetgroup/targetgroup.go Group — a set of addresses
    sharing one label overlay."""

    targets: list = field(default_factory=list)  # "host:port" strings
    labels: dict = field(default_factory=dict)


class StaticDiscovery:
    """static_configs: the degenerate provider — a fixed group list."""

    def __init__(self, groups: list[TargetGroup]):
        self._groups = list(groups)

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        return self._groups


def _parse_sd_doc(doc) -> list[TargetGroup]:
    """Both file and HTTP SD share the wire shape: a JSON/YAML list of
    ``{"targets": [...], "labels": {...}}`` (file.go readFile,
    http.go Refresh)."""
    if doc is None:
        return []
    if not isinstance(doc, list):
        raise ValueError("SD document must be a list of target groups")
    groups = []
    for g in doc:
        if not isinstance(g, dict):
            raise ValueError("SD target group must be a mapping")
        groups.append(
            TargetGroup(
                targets=[str(t) for t in g.get("targets") or []],
                labels={str(k): str(v) for k, v in (g.get("labels") or {}).items()},
            )
        )
    return groups


class FileDiscovery:
    """file_sd_configs provider (discovery/file/file.go:184).

    Polls the glob patterns on ``refresh()``; per-pattern interval
    gating lives in DiscoveryManager.  A file that disappears drops its
    groups; a file that fails to PARSE keeps its last good groups
    (file.go keeps stale content on read error)."""

    def __init__(self, files: list[str], refresh_interval_ms: int = 300_000):
        self.files = list(files)
        self.refresh_interval_ms = refresh_interval_ms
        self._last_good: dict[str, list[TargetGroup]] = {}

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        seen: set[str] = set()
        for pat in self.files:
            for path in sorted(_glob.glob(pat)):
                seen.add(path)
                try:
                    with open(path) as f:
                        raw = f.read()
                    if path.endswith((".yml", ".yaml")):
                        import yaml

                        doc = yaml.safe_load(raw)
                    else:
                        doc = json.loads(raw)
                    file_groups = _parse_sd_doc(doc)
                    self._last_good[path] = file_groups
                except Exception:
                    file_groups = self._last_good.get(path, [])
                for g in file_groups:
                    groups.append(
                        TargetGroup(
                            targets=list(g.targets),
                            labels={**g.labels, "__meta_filepath": path},
                        )
                    )
        # vanished files drop out of the set entirely (file.go cleanup)
        for path in list(self._last_good):
            if path not in seen:
                del self._last_good[path]
        return groups


class HTTPDiscovery:
    """http_sd_configs provider (discovery/http/http.go:57)."""

    def __init__(
        self,
        url: str,
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        self.url = url
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        req = urllib.request.Request(
            url, headers={"Accept": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            doc = json.loads(self._fetch(self.url).decode())
            groups = _parse_sd_doc(doc)
            self._last_good = groups
        except Exception:
            groups = self._last_good  # keep previous set on failure
        return [
            TargetGroup(
                targets=list(g.targets),
                labels={**g.labels, "__meta_url": self.url},
            )
            for g in groups
        ]


# ---------------------------------------------------------------------------
# Consul SD (discovery/consul/consul.go) — the Consul HTTP API is plain
# JSON over HTTP, so no SDK is needed: /v1/catalog/services enumerates
# services; /v1/health/service/<name> lists instances with health.


def _sanitize_label_name(name: str) -> str:
    import re as _re

    return _re.sub(r"[^a-zA-Z0-9_]", "_", name)


class ConsulDiscovery:
    """consul_sd_configs provider.  Per instance, the reference's
    ``__meta_consul_*`` labels (consul.go:43-70, :540-580): address =
    service address when set else node address, joined with the service
    port; tags joined AND surrounded by ``tag_separator`` so relabel
    regexes need not consider position."""

    def __init__(
        self,
        server: str = "localhost:8500",
        services: Optional[list[str]] = None,
        tags: Optional[list[str]] = None,
        datacenter: str = "",
        scheme: str = "http",
        tag_separator: str = ",",
        refresh_interval_ms: int = 30_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        self.base = f"{scheme}://{server.rstrip('/')}"
        self.services = list(services or [])
        self.tags = list(tags or [])
        self.datacenter = datacenter
        self.tag_separator = tag_separator
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        with urllib.request.urlopen(url, timeout=self.timeout_s) as resp:
            return resp.read()

    def _get_json(self, path: str):
        url = self.base + path
        if self.datacenter:
            sep = "&" if "?" in url else "?"
            url = f"{url}{sep}dc={urllib.parse.quote(self.datacenter)}"
        return json.loads(self._fetch(url).decode())

    def _service_groups(self, name: str) -> list[TargetGroup]:
        instances = self._get_json(
            f"/v1/health/service/{urllib.parse.quote(name)}"
        )
        groups: list[TargetGroup] = []
        for inst in instances or []:
            node = inst.get("Node") or {}
            svc = inst.get("Service") or {}
            checks = inst.get("Checks") or []
            svc_tags = svc.get("Tags") or []
            if self.tags and not set(self.tags) <= set(svc_tags):
                continue  # all configured tags must be present (consul.go)
            sep = self.tag_separator
            tags = sep + sep.join(svc_tags) + sep
            svc_addr = svc.get("Address") or ""
            node_addr = node.get("Address") or ""
            port = svc.get("Port") or 0
            host = svc_addr if svc_addr else node_addr
            addr = f"[{host}]:{port}" if ":" in host else f"{host}:{port}"
            # worst status across checks = AggregatedStatus
            order = {"passing": 0, "warning": 1, "critical": 2}
            health = "passing"
            for c in checks:
                s = c.get("Status", "passing")
                if order.get(s, 0) > order.get(health, 0):
                    health = s
            labels = {
                "__meta_consul_address": node_addr,
                "__meta_consul_node": node.get("Node") or "",
                "__meta_consul_service": svc.get("Service") or name,
                "__meta_consul_service_id": svc.get("ID") or "",
                "__meta_consul_service_address": svc_addr,
                "__meta_consul_service_port": str(port),
                "__meta_consul_tags": tags,
                "__meta_consul_health": health,
                "__meta_consul_dc": node.get("Datacenter") or self.datacenter,
            }
            for k, v in (node.get("Meta") or {}).items():
                labels[
                    "__meta_consul_metadata_" + _sanitize_label_name(k)
                ] = str(v)
            for k, v in (svc.get("Meta") or {}).items():
                labels[
                    "__meta_consul_service_metadata_" + _sanitize_label_name(k)
                ] = str(v)
            for k, v in (node.get("TaggedAddresses") or {}).items():
                labels[
                    "__meta_consul_tagged_address_" + _sanitize_label_name(k)
                ] = str(v)
            groups.append(TargetGroup([addr], labels))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            names = self.services
            if not names:  # watch every service (catalog/services keys)
                names = sorted(self._get_json("/v1/catalog/services") or {})
            out: list[TargetGroup] = []
            for name in names:
                out.extend(self._service_groups(name))
            self._last_good = out
        except Exception:
            out = self._last_good  # keep previous set on failure
        return out


# ---------------------------------------------------------------------------
# EC2 SD (discovery/aws/ec2.go) — DescribeInstances over the EC2 Query
# API, signed with stdlib SigV4 (hmac/sha256); XML parsed with
# xml.etree.  No AWS SDK required.


def _sigv4_headers(
    method: str,
    host: str,
    path: str,
    query: str,
    body: bytes,
    region: str,
    service: str,
    access_key: str,
    secret_key: str,
    amz_date: str,
    content_type: str = "",
) -> dict:
    """AWS Signature Version 4 (public spec): canonical request →
    string-to-sign → HMAC chain → Authorization header.  Verified in
    tests against the published AWS doc example vector."""
    import hashlib
    import hmac

    datestamp = amz_date[:8]
    payload_hash = hashlib.sha256(body).hexdigest()
    if content_type:
        canonical_headers = (
            f"content-type:{content_type}\nhost:{host}\n"
            f"x-amz-date:{amz_date}\n"
        )
        signed_headers = "content-type;host;x-amz-date"
    else:
        canonical_headers = f"host:{host}\nx-amz-date:{amz_date}\n"
        signed_headers = "host;x-amz-date"
    canonical_request = "\n".join(
        [method, path, query, canonical_headers, signed_headers, payload_hash]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )

    def hm(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = hm(("AWS4" + secret_key).encode(), datestamp)
    k = hm(k, region)
    k = hm(k, service)
    k = hm(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    return {
        "X-Amz-Date": amz_date,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"
        ),
    }


class EC2Discovery:
    """ec2_sd_configs provider (discovery/aws/ec2.go:46-80): one target
    per running instance at ``private_ip:port`` with the reference's
    ``__meta_ec2_*`` labels (instance id/type/state, AZ, VPC, subnet,
    public/private addresses, Name tags as ``_tag_<k>``)."""

    def __init__(
        self,
        region: str,
        access_key: str = "",
        secret_key: str = "",
        port: int = 80,
        endpoint: str = "",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str, dict], bytes]] = None,
        filters: Optional[list[dict]] = None,
    ):
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.port = port
        self.endpoint = endpoint or f"https://ec2.{region}.amazonaws.com"
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_post
        # ec2.go:94 Filters — [{"name": ..., "values": [...]}], encoded
        # as the query API's Filter.N.Name / Filter.N.Value.M params
        self.filters = list(filters or [])
        self._last_good: list[TargetGroup] = []

    def _http_post(self, url: str, headers: dict) -> bytes:
        req = urllib.request.Request(url, headers=headers, method="GET")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _describe(self, next_token: str = "") -> bytes:
        params = {
            "Action": "DescribeInstances",
            "Version": "2016-11-15",
        }
        for i, f in enumerate(self.filters, start=1):
            params[f"Filter.{i}.Name"] = f.get("name", "")
            for j, v in enumerate(f.get("values") or [], start=1):
                params[f"Filter.{i}.Value.{j}"] = v
        if next_token:
            params["NextToken"] = next_token
        query = urllib.parse.urlencode(sorted(params.items()))
        host = urllib.parse.urlparse(self.endpoint).netloc
        amz_date = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        headers = _sigv4_headers(
            "GET", host, "/", query, b"", self.region, "ec2",
            self.access_key, self.secret_key, amz_date,
        )
        return self._fetch(f"{self.endpoint}/?{query}", headers)

    def _parse(self, xml_bytes: bytes) -> tuple[list[TargetGroup], str]:
        import xml.etree.ElementTree as ET

        root = ET.fromstring(xml_bytes)
        # strip the response namespace for readable traversal
        def strip(el):
            el.tag = el.tag.split("}")[-1]
            for c in el:
                strip(c)
        strip(root)

        def text(el, path: str) -> str:
            found = el.find(path)
            return (found.text or "") if found is not None else ""

        groups: list[TargetGroup] = []
        # ownerId lives on the *reservation*, not the instance
        # (discovery/aws/ec2.go:362 uses r.OwnerId for every instance in r)
        for reservation in root.findall("reservationSet/item"):
            owner_id = text(reservation, "ownerId")
            for item in reservation.findall("instancesSet/item"):
                private_ip = text(item, "privateIpAddress")
                if not private_ip:
                    continue
                labels = {
                    "__meta_ec2_instance_id": text(item, "instanceId"),
                    "__meta_ec2_instance_type": text(item, "instanceType"),
                    "__meta_ec2_instance_state":
                        text(item, "instanceState/name"),
                    "__meta_ec2_ami": text(item, "imageId"),
                    "__meta_ec2_architecture": text(item, "architecture"),
                    "__meta_ec2_availability_zone":
                        text(item, "placement/availabilityZone"),
                    "__meta_ec2_owner_id": owner_id,
                    # inst.Platform (ec2.go:381) — "windows" or absent
                    "__meta_ec2_platform": text(item, "platform"),
                    "__meta_ec2_private_ip": private_ip,
                    "__meta_ec2_private_dns_name":
                        text(item, "privateDnsName"),
                    "__meta_ec2_public_ip": text(item, "ipAddress"),
                    "__meta_ec2_public_dns_name": text(item, "dnsName"),
                    "__meta_ec2_vpc_id": text(item, "vpcId"),
                    "__meta_ec2_subnet_id": text(item, "subnetId"),
                    "__meta_ec2_region": self.region,
                }
                for tag in item.findall("tagSet/item"):
                    k = text(tag, "key")
                    if k:
                        labels[
                            "__meta_ec2_tag_" + _sanitize_label_name(k)
                        ] = text(tag, "value")
                groups.append(
                    TargetGroup([f"{private_ip}:{self.port}"], labels)
                )
        nt = root.find("nextToken")
        return groups, ((nt.text or "") if nt is not None else "")

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            # DescribeInstancesPaginator (ec2.go:336): follow NextToken
            # until the last page
            out: list[TargetGroup] = []
            token = ""
            while True:
                groups, token = self._parse(self._describe(token))
                out.extend(groups)
                if not token:
                    break
            self._last_good = out
        except Exception:
            out = self._last_good  # keep previous set on failure
        return out


class GCEDiscovery:
    """gce_sd_configs provider (discovery/gce/gce.go:37-50,181-247): one
    target per instance at ``networkIP:port`` with the reference's
    ``__meta_gce_*`` labels (project/zone/instance id+name+status/
    machine type/network/subnetwork/private+public IP/tags/metadata_*/
    label_*/interface_ipv4_<nic>).

    Plain REST list-on-refresh against the public Compute API
    (``GET .../projects/{p}/zones/{z}/instances``), paginated via
    ``nextPageToken`` — no SDK.  Auth is a bearer token; by default it
    is read from the GCE metadata server (the workload-identity path),
    or inject ``token_fn``/``fetch_fn``."""

    def __init__(
        self,
        project: str,
        zone: str,
        port: int = 80,
        filter: str = "",
        tag_separator: str = ",",
        endpoint: str = "https://compute.googleapis.com",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
        token_fn: Optional[Callable[[], str]] = None,
    ):
        self.project = project
        self.zone = zone
        self.port = port
        self.filter = filter
        self.tag_separator = tag_separator
        self.endpoint = endpoint.rstrip("/")
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._token_fn = token_fn
        self._last_good: list[TargetGroup] = []

    def _metadata_token(self) -> str:
        req = urllib.request.Request(
            "http://metadata.google.internal/computeMetadata/v1/"
            "instance/service-accounts/default/token",
            headers={"Metadata-Flavor": "Google"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read())["access_token"]

    def _http_get(self, url: str) -> bytes:
        token = self._token_fn() if self._token_fn else self._metadata_token()
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {token}"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _list_url(self, page_token: str = "") -> str:
        base = (
            f"{self.endpoint}/compute/v1/projects/{self.project}"
            f"/zones/{self.zone}/instances"
        )
        q = {}
        if self.filter:
            q["filter"] = self.filter
        if page_token:
            q["pageToken"] = page_token
        return base + ("?" + urllib.parse.urlencode(q) if q else "")

    def _instance_labels(self, inst: dict) -> Optional[dict]:
        ifaces = inst.get("networkInterfaces") or []
        if not ifaces:
            return None  # gce.go:188 skips interface-less instances
        pri = ifaces[0]
        labels = {
            "__meta_gce_project": self.project,
            "__meta_gce_zone": inst.get("zone", ""),
            "__meta_gce_instance_id": str(inst.get("id", "")),
            "__meta_gce_instance_name": inst.get("name", ""),
            "__meta_gce_instance_status": inst.get("status", ""),
            "__meta_gce_machine_type": inst.get("machineType", ""),
            "__meta_gce_network": pri.get("network", ""),
            "__meta_gce_subnetwork": pri.get("subnetwork", ""),
            "__meta_gce_private_ip": pri.get("networkIP", ""),
        }
        for iface in ifaces:
            labels[
                "__meta_gce_interface_ipv4_"
                + _sanitize_label_name(iface.get("name", ""))
            ] = iface.get("networkIP", "")
        tags = (inst.get("tags") or {}).get("items") or []
        if tags:
            # separator-surrounded so relabel regexes ignore position
            # (gce.go:216-218)
            labels["__meta_gce_tags"] = (
                self.tag_separator
                + self.tag_separator.join(tags)
                + self.tag_separator
            )
        for item in (inst.get("metadata") or {}).get("items") or []:
            if item.get("value") is None:
                continue
            labels[
                "__meta_gce_metadata_" + _sanitize_label_name(item["key"])
            ] = item["value"]
        for k, v in (inst.get("labels") or {}).items():
            labels["__meta_gce_label_" + _sanitize_label_name(k)] = v
        acs = pri.get("accessConfigs") or []
        if acs and acs[0].get("type") == "ONE_TO_ONE_NAT":
            labels["__meta_gce_public_ip"] = acs[0].get("natIP", "")
        return labels

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            groups: list[TargetGroup] = []
            page = ""
            while True:
                doc = json.loads(self._fetch(self._list_url(page)))
                for inst in doc.get("items") or []:
                    labels = self._instance_labels(inst)
                    if labels is None:
                        continue
                    addr = f'{labels["__meta_gce_private_ip"]}:{self.port}'
                    groups.append(TargetGroup([addr], labels))
                page = doc.get("nextPageToken", "")
                if not page:
                    break
            self._last_good = groups
        except Exception:
            groups = self._last_good
        return groups


class _BearerListDiscovery:
    """Shared plumbing for token-authenticated JSON list APIs
    (DigitalOcean/Hetzner/Linode): GET with a bearer token, page-aware
    ``_get_json``, last-good-on-failure refresh."""

    def __init__(
        self,
        token: str,
        port: int,
        endpoint: str,
        refresh_interval_ms: int,
        timeout_s: float,
        fetch_fn: Optional[Callable[[str], bytes]],
    ):
        self.token = token
        self.port = port
        self.endpoint = endpoint.rstrip("/")
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {self.token}"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _get_json(self, url: str) -> dict:
        return json.loads(self._fetch(url))

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = self._groups()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out

    def _groups(self) -> list[TargetGroup]:  # pragma: no cover - abstract
        raise NotImplementedError


def _wrap_list(items: list[str], sep: str = ",") -> str:
    """Separator-surrounded list — the reference wraps tag/feature lists
    so relabel regexes need not consider positions."""
    return sep + sep.join(items) + sep


class DigitalOceanDiscovery(_BearerListDiscovery):
    """digitalocean_sd_configs provider
    (discovery/digitalocean/digitalocean.go:44-56,205-265): one target
    per droplet at ``public_ipv4:port`` with the ``__meta_digitalocean_*``
    labels; droplets without a v4 network are skipped; features/tags are
    separator-wrapped.  Pages via the API's ``links.pages.next``."""

    def __init__(
        self,
        token: str = "",
        port: int = 80,
        endpoint: str = "https://api.digitalocean.com",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        super().__init__(
            token, port, endpoint, refresh_interval_ms, timeout_s, fetch_fn
        )

    def _groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        url = f"{self.endpoint}/v2/droplets?per_page=200"
        while url:
            doc = self._get_json(url)
            for d in doc.get("droplets") or []:
                nets = (d.get("networks") or {}).get("v4") or []
                if not nets:
                    continue
                pub4 = next(
                    (n["ip_address"] for n in nets if n.get("type") == "public"), ""
                )
                priv4 = next(
                    (n["ip_address"] for n in nets if n.get("type") == "private"), ""
                )
                v6 = (d.get("networks") or {}).get("v6") or []
                pub6 = next(
                    (n["ip_address"] for n in v6 if n.get("type") == "public"), ""
                )
                image = d.get("image") or {}
                labels = {
                    "__meta_digitalocean_droplet_id": str(d.get("id", "")),
                    "__meta_digitalocean_droplet_name": d.get("name", ""),
                    "__meta_digitalocean_image": image.get("slug", "") or "",
                    "__meta_digitalocean_image_name": image.get("name", ""),
                    "__meta_digitalocean_private_ipv4": priv4,
                    "__meta_digitalocean_public_ipv4": pub4,
                    "__meta_digitalocean_public_ipv6": pub6,
                    "__meta_digitalocean_region":
                        (d.get("region") or {}).get("slug", ""),
                    "__meta_digitalocean_size": d.get("size_slug", ""),
                    "__meta_digitalocean_status": d.get("status", ""),
                    "__meta_digitalocean_vpc": d.get("vpc_uuid", ""),
                }
                if d.get("features"):
                    labels["__meta_digitalocean_features"] = _wrap_list(
                        d["features"]
                    )
                if d.get("tags"):
                    labels["__meta_digitalocean_tags"] = _wrap_list(d["tags"])
                groups.append(TargetGroup([f"{pub4}:{self.port}"], labels))
            url = (
                ((doc.get("links") or {}).get("pages") or {}).get("next", "")
            )
        return groups


class HetznerDiscovery(_BearerListDiscovery):
    """hetzner_sd_configs provider, hcloud role
    (discovery/hetzner/hcloud.go:95-145): one target per server at
    ``public_ipv4:port`` with ``__meta_hetzner_*`` +
    ``__meta_hetzner_hcloud_*`` labels (server id/name/status, location
    + network zone, server type/cores/cpu type/memory/disk, image,
    label_/labelpresent_, per-network private IPs).  Pages via
    ``meta.pagination.next_page``."""

    def __init__(
        self,
        token: str = "",
        role: str = "hcloud",
        port: int = 80,
        endpoint: str = "https://api.hetzner.cloud",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        if role != "hcloud":
            raise ValueError(
                f"hetzner role {role!r} not supported (robot needs basic-auth"
                " webservice credentials; hcloud covers the cloud API)"
            )
        super().__init__(
            token, port, endpoint, refresh_interval_ms, timeout_s, fetch_fn
        )
        self.role = role

    def _paged(self, path: str, key: str) -> list[dict]:
        out: list[dict] = []
        page = 1
        while page:
            doc = self._get_json(
                f"{self.endpoint}{path}?page={page}&per_page=50"
            )
            out += doc.get(key) or []
            page = (
                ((doc.get("meta") or {}).get("pagination") or {}).get(
                    "next_page"
                )
                or 0
            )
        return out

    def _groups(self) -> list[TargetGroup]:
        networks = {
            n["id"]: n.get("name", "")
            for n in self._paged("/v1/networks", "networks")
        }
        groups: list[TargetGroup] = []
        for s in self._paged("/v1/servers", "servers"):
            pub = s.get("public_net") or {}
            ipv4 = (pub.get("ipv4") or {}).get("ip", "")
            st = s.get("server_type") or {}
            loc = (s.get("datacenter") or {}).get("location") or {}
            labels = {
                "__meta_hetzner_role": "hcloud",
                "__meta_hetzner_server_id": str(s.get("id", "")),
                "__meta_hetzner_server_name": s.get("name", ""),
                "__meta_hetzner_server_status": s.get("status", ""),
                "__meta_hetzner_public_ipv4": ipv4,
                "__meta_hetzner_public_ipv6_network":
                    (pub.get("ipv6") or {}).get("ip", ""),
                "__meta_hetzner_hcloud_location": loc.get("name", ""),
                "__meta_hetzner_hcloud_location_network_zone":
                    loc.get("network_zone", ""),
                "__meta_hetzner_hcloud_datacenter_location": loc.get("name", ""),
                "__meta_hetzner_hcloud_datacenter_location_network_zone":
                    loc.get("network_zone", ""),
                "__meta_hetzner_hcloud_server_type": st.get("name", ""),
                "__meta_hetzner_hcloud_cpu_cores": str(st.get("cores", "")),
                "__meta_hetzner_hcloud_cpu_type": st.get("cpu_type", ""),
                "__meta_hetzner_hcloud_memory_size_gb":
                    str(int(st.get("memory", 0))),
                "__meta_hetzner_hcloud_disk_size_gb": str(st.get("disk", "")),
            }
            img = s.get("image") or {}
            if img:
                labels["__meta_hetzner_hcloud_image_name"] = img.get("name", "")
                labels["__meta_hetzner_hcloud_image_description"] = img.get(
                    "description", ""
                )
                labels["__meta_hetzner_hcloud_image_os_version"] = img.get(
                    "os_version", ""
                )
                labels["__meta_hetzner_hcloud_image_os_flavor"] = img.get(
                    "os_flavor", ""
                )
            for pn in s.get("private_net") or []:
                name = networks.get(pn.get("network"))
                if name:
                    labels[
                        "__meta_hetzner_hcloud_private_ipv4_"
                        + _sanitize_label_name(name)
                    ] = pn.get("ip", "")
            for k, v in (s.get("labels") or {}).items():
                sk = _sanitize_label_name(k)
                labels[f"__meta_hetzner_hcloud_label_{sk}"] = v
                labels[f"__meta_hetzner_hcloud_labelpresent_{sk}"] = "true"
            groups.append(TargetGroup([f"{ipv4}:{self.port}"], labels))
        return groups


class LinodeDiscovery(_BearerListDiscovery):
    """linode_sd_configs provider (discovery/linode/linode.go:38-61,
    280-385): one target per instance at ``public_ipv4:port`` with the
    ``__meta_linode_*`` labels — first public/private v4 (extras into
    the separator-wrapped ``extra_ips``), RDNS from the networking ips
    listing, specs in bytes (MB<<20), backups enabled/disabled, wrapped
    tags.  Pages via the API's ``page``/``pages`` envelope."""

    def __init__(
        self,
        token: str = "",
        port: int = 80,
        tag_separator: str = ",",
        endpoint: str = "https://api.linode.com",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        super().__init__(
            token, port, endpoint, refresh_interval_ms, timeout_s, fetch_fn
        )
        self.tag_separator = tag_separator

    def _paged(self, path: str, key: str = "data") -> list[dict]:
        out: list[dict] = []
        page = 1
        while True:
            doc = self._get_json(f"{self.endpoint}{path}?page={page}")
            out += doc.get(key) or []
            if page >= int(doc.get("pages", 1)):
                return out
            page += 1

    def _groups(self) -> list[TargetGroup]:
        # one networking listing covers every instance's RDNS + public
        # flag (linode.go fetches detailed IPs per page the same way)
        ip_info = {
            ip.get("address"): ip
            for ip in self._paged("/v4/networking/ips")
        }
        groups: list[TargetGroup] = []
        for inst in self._paged("/v4/linode/instances"):
            pub4 = priv4 = ""
            extra: list[str] = []
            for addr in inst.get("ipv4") or []:
                info = ip_info.get(addr) or {}
                public = info.get("public", not addr.startswith("192.168."))
                if public and not pub4:
                    pub4 = addr
                elif not public and not priv4:
                    priv4 = addr
                else:
                    extra.append(addr)
            slaac = (inst.get("ipv6") or "").split("/")[0]
            specs = inst.get("specs") or {}

            def rdns(a: str) -> str:
                v = (ip_info.get(a) or {}).get("rdns")
                return v if v and v != "null" else ""

            labels = {
                "__meta_linode_instance_id": str(inst.get("id", "")),
                "__meta_linode_instance_label": inst.get("label", ""),
                "__meta_linode_image": inst.get("image", "") or "",
                "__meta_linode_private_ipv4": priv4,
                "__meta_linode_public_ipv4": pub4,
                "__meta_linode_public_ipv6": slaac,
                "__meta_linode_private_ipv4_rdns": rdns(priv4),
                "__meta_linode_public_ipv4_rdns": rdns(pub4),
                "__meta_linode_public_ipv6_rdns": rdns(slaac),
                "__meta_linode_region": inst.get("region", ""),
                "__meta_linode_type": inst.get("type", ""),
                "__meta_linode_status": inst.get("status", ""),
                "__meta_linode_group": inst.get("group", ""),
                "__meta_linode_gpus": str(specs.get("gpus", 0)),
                "__meta_linode_hypervisor": inst.get("hypervisor", ""),
                "__meta_linode_backups": (
                    "enabled"
                    if (inst.get("backups") or {}).get("enabled")
                    else "disabled"
                ),
                "__meta_linode_specs_disk_bytes":
                    str(int(specs.get("disk", 0)) << 20),
                "__meta_linode_specs_memory_bytes":
                    str(int(specs.get("memory", 0)) << 20),
                "__meta_linode_specs_vcpus": str(specs.get("vcpus", 0)),
                "__meta_linode_specs_transfer_bytes":
                    str(int(specs.get("transfer", 0)) << 20),
            }
            if inst.get("tags"):
                labels["__meta_linode_tags"] = _wrap_list(
                    inst["tags"], self.tag_separator
                )
            if extra:
                labels["__meta_linode_extra_ips"] = _wrap_list(
                    extra, self.tag_separator
                )
            groups.append(TargetGroup([f"{pub4}:{self.port}"], labels))
        return groups


class VultrDiscovery(_BearerListDiscovery):
    """vultr_sd_configs provider (discovery/vultr/vultr.go:38-57,
    148-199): one target per instance at ``main_ip:port`` with the
    ``__meta_vultr_instance_*`` labels; features/tags separator-wrapped.
    Pages via the v2 API's ``meta.links.next`` cursor."""

    def __init__(
        self,
        token: str = "",
        port: int = 80,
        endpoint: str = "https://api.vultr.com",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        super().__init__(
            token, port, endpoint, refresh_interval_ms, timeout_s, fetch_fn
        )

    def _groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        cursor = ""
        while True:
            url = f"{self.endpoint}/v2/instances?per_page=100"
            if cursor:
                url += f"&cursor={urllib.parse.quote(cursor)}"
            doc = self._get_json(url)
            for inst in doc.get("instances") or []:
                labels = {
                    "__meta_vultr_instance_id": str(inst.get("id", "")),
                    "__meta_vultr_instance_label": inst.get("label", ""),
                    "__meta_vultr_instance_os": inst.get("os", ""),
                    "__meta_vultr_instance_os_id": str(inst.get("os_id", "")),
                    "__meta_vultr_instance_region": inst.get("region", ""),
                    "__meta_vultr_instance_plan": inst.get("plan", ""),
                    "__meta_vultr_instance_vcpu_count":
                        str(inst.get("vcpu_count", "")),
                    "__meta_vultr_instance_ram_mb": str(inst.get("ram", "")),
                    "__meta_vultr_instance_allowed_bandwidth_gb":
                        str(inst.get("allowed_bandwidth", "")),
                    "__meta_vultr_instance_disk_gb": str(inst.get("disk", "")),
                    "__meta_vultr_instance_main_ip": inst.get("main_ip", ""),
                    "__meta_vultr_instance_main_ipv6":
                        inst.get("v6_main_ip", ""),
                    "__meta_vultr_instance_internal_ip":
                        inst.get("internal_ip", ""),
                    "__meta_vultr_instance_hostname": inst.get("hostname", ""),
                    "__meta_vultr_instance_server_status":
                        inst.get("server_status", ""),
                }
                if inst.get("features"):
                    labels["__meta_vultr_instance_features"] = _wrap_list(
                        inst["features"]
                    )
                if inst.get("tags"):
                    labels["__meta_vultr_instance_tags"] = _wrap_list(
                        inst["tags"]
                    )
                groups.append(
                    TargetGroup([f'{inst.get("main_ip", "")}:{self.port}'], labels)
                )
            cursor = ((doc.get("meta") or {}).get("links") or {}).get(
                "next", ""
            )
            if not cursor:
                return groups


class NomadDiscovery(_BearerListDiscovery):
    """nomad_sd_configs provider (discovery/nomad/nomad.go:37-48,
    170-215): list service stubs (``/v1/services``), then one target per
    registered instance at ``address:port`` with the ``__meta_nomad_*``
    labels; tags separator-wrapped."""

    def __init__(
        self,
        server: str = "http://localhost:4646",
        namespace: str = "default",
        region: str = "global",
        tag_separator: str = ",",
        port: int = 80,  # unused (nomad services carry their port)
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        super().__init__(
            "", port, server, refresh_interval_ms, timeout_s, fetch_fn
        )
        self.namespace = namespace
        self.region = region
        self.tag_separator = tag_separator

    def _url(self, path: str) -> str:
        q = urlencode({"namespace": self.namespace, "region": self.region})
        return f"{self.endpoint}{path}?{q}"

    def _groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        for stub in self._get_json(self._url("/v1/services")) or []:
            for svc in stub.get("Services") or []:
                name = svc.get("ServiceName", "")
                if not name:
                    continue
                for inst in self._get_json(
                    self._url(f"/v1/service/{urllib.parse.quote(name)}")
                ) or []:
                    addr = inst.get("Address", "")
                    port = inst.get("Port", 0)
                    labels = {
                        "__meta_nomad_address": addr,
                        "__meta_nomad_dc": inst.get("Datacenter", ""),
                        "__meta_nomad_node_id": inst.get("NodeID", ""),
                        "__meta_nomad_namespace": inst.get("Namespace", ""),
                        "__meta_nomad_service": inst.get("ServiceName", ""),
                        "__meta_nomad_service_address": addr,
                        "__meta_nomad_service_id": inst.get("ID", ""),
                        "__meta_nomad_service_port": str(port),
                    }
                    if inst.get("Tags"):
                        labels["__meta_nomad_tags"] = _wrap_list(
                            inst["Tags"], self.tag_separator
                        )
                    groups.append(TargetGroup([f"{addr}:{port}"], labels))
        return groups


class ScalewayDiscovery(_BearerListDiscovery):
    """scaleway_sd_configs provider, instance role
    (discovery/scaleway/instance.go:36-59,120-240): one target per
    server with the ``__meta_scaleway_instance_*`` labels; address
    preference private IP > public IP > IPv6; servers with no address
    are skipped; wrapped tags and public address lists.  Pages via the
    API's ``page`` param until a short page."""

    def __init__(
        self,
        project_id: str = "",
        zone: str = "fr-par-1",
        secret_key: str = "",
        port: int = 80,
        endpoint: str = "https://api.scaleway.com",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        super().__init__(
            secret_key, port, endpoint, refresh_interval_ms, timeout_s, fetch_fn
        )
        self.project_id = project_id
        self.zone = zone

    def _http_get(self, url: str) -> bytes:  # Scaleway uses a header token
        req = urllib.request.Request(
            url, headers={"X-Auth-Token": self.token}
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        page = 1
        per_page = 50
        while True:
            q = {"page": page, "per_page": per_page}
            if self.project_id:
                q["project"] = self.project_id
            doc = self._get_json(
                f"{self.endpoint}/instance/v1/zones/{self.zone}/servers?"
                + urlencode(q)
            )
            servers = doc.get("servers") or []
            for s in servers:
                image = s.get("image") or {}
                sg = s.get("security_group") or {}
                labels = {
                    "__meta_scaleway_instance_id": s.get("id", ""),
                    "__meta_scaleway_instance_name": s.get("name", ""),
                    "__meta_scaleway_instance_boot_type": s.get("boot_type", ""),
                    "__meta_scaleway_instance_hostname": s.get("hostname", ""),
                    "__meta_scaleway_instance_image_arch": image.get("arch", ""),
                    "__meta_scaleway_instance_image_id": image.get("id", ""),
                    "__meta_scaleway_instance_image_name": image.get("name", ""),
                    "__meta_scaleway_instance_organization_id":
                        s.get("organization", ""),
                    "__meta_scaleway_instance_project_id": s.get("project", ""),
                    "__meta_scaleway_instance_security_group_id": sg.get("id", ""),
                    "__meta_scaleway_instance_security_group_name":
                        sg.get("name", ""),
                    "__meta_scaleway_instance_status": s.get("state", ""),
                    "__meta_scaleway_instance_type":
                        s.get("commercial_type", ""),
                    "__meta_scaleway_instance_zone": s.get("zone", self.zone),
                    "__meta_scaleway_instance_region":
                        "-".join(s.get("zone", self.zone).split("-")[:2]),
                }
                if s.get("tags"):
                    labels["__meta_scaleway_instance_tags"] = _wrap_list(
                        s["tags"]
                    )
                v4s = [
                    ip["address"]
                    for ip in s.get("public_ips") or []
                    if ip.get("family") == "inet" and ip.get("address")
                ]
                v6s = [
                    ip["address"]
                    for ip in s.get("public_ips") or []
                    if ip.get("family") == "inet6" and ip.get("address")
                ]
                if v4s:
                    labels[
                        "__meta_scaleway_instance_public_ipv4_addresses"
                    ] = _wrap_list(v4s)
                if v6s:
                    labels[
                        "__meta_scaleway_instance_public_ipv6_addresses"
                    ] = _wrap_list(v6s)
                addr = ""
                if (s.get("ipv6") or {}).get("address"):
                    labels["__meta_scaleway_instance_public_ipv6"] = s["ipv6"][
                        "address"
                    ]
                    addr = s["ipv6"]["address"]
                pub = s.get("public_ip") or {}
                if pub.get("address"):
                    if pub.get("family") != "inet6":
                        labels["__meta_scaleway_instance_public_ipv4"] = pub[
                            "address"
                        ]
                    addr = pub["address"]
                if s.get("private_ip"):
                    labels["__meta_scaleway_instance_private_ipv4"] = s[
                        "private_ip"
                    ]
                    addr = s["private_ip"]
                if not addr:
                    continue  # instance.go:230 address-less servers skipped
                host = f"[{addr}]" if ":" in addr else addr
                groups.append(TargetGroup([f"{host}:{self.port}"], labels))
            if len(servers) < per_page:
                return groups
            page += 1


class DockerSwarmDiscovery:
    """dockerswarm_sd_configs provider, roles ``nodes``/``services``/
    ``tasks`` (discovery/moby/nodes.go:30-85, services.go:32-160,
    tasks.go:32-160, network.go:35-56) over the plain Docker Engine
    HTTP API (`/nodes`, `/services`, `/tasks`, `/networks`).

    nodes: one target per node at ``status.addr:port``.
    services: one target per (service, virtual IP, TCP published port)
    — or ``vip:port`` when the service exposes no TCP port.
    tasks: published ports from the task's PortStatus, then each
    network attachment address × the service's TCP ports (or the
    configured port when none) — with service + node + network labels
    folded in, exactly the reference's precedence."""

    def __init__(
        self,
        host: str,
        role: str = "tasks",
        port: int = 80,
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        if role not in ("nodes", "services", "tasks"):
            raise ValueError(f"dockerswarm_sd role {role!r} not supported")
        self.host = host.rstrip("/")
        self.role = role
        self.port = port
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        req = urllib.request.Request(url)
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _get(self, path: str) -> list:
        return json.loads(self._fetch(self.host + path)) or []

    # -- shared label builders ------------------------------------------
    @staticmethod
    def _node_labels(n: dict) -> dict:
        spec = n.get("Spec") or {}
        desc = n.get("Description") or {}
        plat = desc.get("Platform") or {}
        status = n.get("Status") or {}
        out = {
            "__meta_dockerswarm_node_id": n.get("ID", ""),
            "__meta_dockerswarm_node_role": spec.get("Role", ""),
            "__meta_dockerswarm_node_availability": spec.get("Availability", ""),
            "__meta_dockerswarm_node_hostname": desc.get("Hostname", ""),
            "__meta_dockerswarm_node_platform_architecture":
                plat.get("Architecture", ""),
            "__meta_dockerswarm_node_platform_os": plat.get("OS", ""),
            "__meta_dockerswarm_node_status": status.get("State", ""),
            "__meta_dockerswarm_node_address": status.get("Addr", ""),
        }
        for k, v in (spec.get("Labels") or {}).items():
            out["__meta_dockerswarm_node_label_" + _sanitize_label_name(k)] = v
        return out

    @staticmethod
    def _service_mode(s: dict) -> str:
        mode = (s.get("Spec") or {}).get("Mode") or {}
        if "Replicated" in mode:
            return "replicated"
        if "Global" in mode:
            return "global"
        return ""

    @classmethod
    def _service_labels(cls, s: dict) -> dict:
        spec = s.get("Spec") or {}
        out = {
            "__meta_dockerswarm_service_id": s.get("ID", ""),
            "__meta_dockerswarm_service_name": spec.get("Name", ""),
            "__meta_dockerswarm_service_mode": cls._service_mode(s),
        }
        cspec = (spec.get("TaskTemplate") or {}).get("ContainerSpec")
        if cspec:
            out["__meta_dockerswarm_service_task_container_hostname"] = (
                cspec.get("Hostname", "") or ""
            )
            out["__meta_dockerswarm_service_task_container_image"] = (
                cspec.get("Image", "") or ""
            )
        if s.get("UpdateStatus"):
            out["__meta_dockerswarm_service_updating_status"] = s[
                "UpdateStatus"
            ].get("State", "")
        for k, v in (spec.get("Labels") or {}).items():
            out["__meta_dockerswarm_service_label_" + _sanitize_label_name(k)] = v
        return out

    def _network_labels(self) -> dict:
        out = {}
        for net in self._get("/networks"):
            nid = net.get("Id", "")
            labels = {
                "__meta_dockerswarm_network_id": nid,
                "__meta_dockerswarm_network_name": net.get("Name", ""),
                "__meta_dockerswarm_network_scope": net.get("Scope", ""),
                "__meta_dockerswarm_network_internal":
                    "true" if net.get("Internal") else "false",
                "__meta_dockerswarm_network_ingress":
                    "true" if net.get("Ingress") else "false",
            }
            for k, v in (net.get("Labels") or {}).items():
                labels[
                    "__meta_dockerswarm_network_label_" + _sanitize_label_name(k)
                ] = v
            out[nid] = labels
        return out

    @staticmethod
    def _vip_ip(cidr: str) -> str:
        return cidr.split("/")[0]

    # -- roles -----------------------------------------------------------
    def _nodes_groups(self) -> list[TargetGroup]:
        groups = []
        for n in self._get("/nodes"):
            labels = self._node_labels(n)
            mgr = n.get("ManagerStatus")
            if mgr:
                labels["__meta_dockerswarm_node_manager_leader"] = (
                    "true" if mgr.get("Leader") else "false"
                )
                labels["__meta_dockerswarm_node_manager_reachability"] = mgr.get(
                    "Reachability", ""
                )
                labels["__meta_dockerswarm_node_manager_address"] = mgr.get(
                    "Addr", ""
                )
            desc = n.get("Description") or {}
            labels["__meta_dockerswarm_node_engine_version"] = (
                (desc.get("Engine") or {}).get("EngineVersion", "")
            )
            addr = (n.get("Status") or {}).get("Addr", "")
            groups.append(TargetGroup([f"{addr}:{self.port}"], labels))
        return groups

    def _services_groups(self) -> list[TargetGroup]:
        networks = self._network_labels()
        groups = []
        for s in self._get("/services"):
            common = self._service_labels(s)
            endpoint = s.get("Endpoint") or {}
            ports = [
                p for p in endpoint.get("Ports") or []
                if p.get("Protocol") == "tcp"
            ]
            for vip in endpoint.get("VirtualIPs") or []:
                ip = self._vip_ip(vip.get("Addr", ""))
                netl = networks.get(vip.get("NetworkID", ""), {})
                if ports:
                    for p in ports:
                        groups.append(TargetGroup(
                            [f'{ip}:{p.get("PublishedPort", 0)}'],
                            {
                                **common, **netl,
                                "__meta_dockerswarm_service_endpoint_port_name":
                                    p.get("Name", "") or "",
                                "__meta_dockerswarm_service_endpoint_port_publish_mode":
                                    p.get("PublishMode", ""),
                            },
                        ))
                else:
                    groups.append(
                        TargetGroup([f"{ip}:{self.port}"], {**common, **netl})
                    )
        return groups

    def _tasks_groups(self) -> list[TargetGroup]:
        networks = self._network_labels()
        services = {s.get("ID", ""): s for s in self._get("/services")}
        nodes = {n.get("ID", ""): self._node_labels(n) for n in self._get("/nodes")}
        groups = []
        for t in self._get("/tasks"):
            status = t.get("Status") or {}
            common = {
                "__meta_dockerswarm_task_id": t.get("ID", ""),
                "__meta_dockerswarm_task_desired_state":
                    t.get("DesiredState", ""),
                "__meta_dockerswarm_task_state": status.get("State", ""),
                "__meta_dockerswarm_task_slot": str(t.get("Slot", 0)),
            }
            if status.get("ContainerStatus"):
                common["__meta_dockerswarm_task_container_id"] = status[
                    "ContainerStatus"
                ].get("ContainerID", "")
            for k, v in (
                ((t.get("Spec") or {}).get("ContainerSpec") or {}).get("Labels")
                or {}
            ).items():
                common[
                    "__meta_dockerswarm_container_label_" + _sanitize_label_name(k)
                ] = v
            svc = services.get(t.get("ServiceID", ""))
            svc_ports = []
            if svc:
                common.update(self._service_labels(svc))
                svc_ports = [
                    p
                    for p in (svc.get("Endpoint") or {}).get("Ports") or []
                    if p.get("Protocol") == "tcp"
                ]
            node = nodes.get(t.get("NodeID", ""))
            if node:
                common.update(node)
            for p in ((status.get("PortStatus") or {}).get("Ports") or []):
                if p.get("Protocol") != "tcp":
                    continue
                addr = common.get("__meta_dockerswarm_node_address", "")
                groups.append(TargetGroup(
                    [f'{addr}:{p.get("PublishedPort", 0)}'],
                    {**common,
                     "__meta_dockerswarm_task_port_publish_mode":
                         p.get("PublishMode", "")},
                ))
            for att in t.get("NetworksAttachments") or []:
                netl = networks.get(
                    (att.get("Network") or {}).get("ID", ""), {}
                )
                for cidr in att.get("Addresses") or []:
                    ip = self._vip_ip(cidr)
                    if svc_ports:
                        for p in svc_ports:
                            groups.append(TargetGroup(
                                [f'{ip}:{p.get("PublishedPort", 0)}'],
                                {**common, **netl,
                                 "__meta_dockerswarm_task_port_publish_mode":
                                     p.get("PublishMode", "")},
                            ))
                    else:
                        groups.append(TargetGroup(
                            [f"{ip}:{self.port}"], {**common, **netl}
                        ))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = {
                "nodes": self._nodes_groups,
                "services": self._services_groups,
                "tasks": self._tasks_groups,
            }[self.role]()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


class LightsailDiscovery:
    """lightsail_sd_configs provider (discovery/aws/lightsail.go:44-56,
    280-330): one target per instance at ``private_ip:port`` with the
    ``__meta_lightsail_*`` labels (AZ, blueprint/bundle ids, name,
    state, support code, public IP, wrapped IPv6 list, ``tag_*``).
    Plain AWS JSON-RPC (``Lightsail_20161128.GetInstances``) with the
    stdlib SigV4 signer and pageToken pagination."""

    def __init__(
        self,
        region: str,
        access_key: str = "",
        secret_key: str = "",
        port: int = 80,
        endpoint: str = "",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str, dict, bytes], bytes]] = None,
    ):
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.port = port
        self.endpoint = endpoint or f"https://lightsail.{region}.amazonaws.com"
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_post
        self._last_good: list[TargetGroup] = []

    def _http_post(self, url: str, headers: dict, body: bytes) -> bytes:
        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _get_instances(self, page_token: str = "") -> dict:
        body = json.dumps(
            {"pageToken": page_token} if page_token else {}
        ).encode()
        host = urllib.parse.urlparse(self.endpoint).netloc
        amz_date = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        headers = _sigv4_headers(
            "POST", host, "/", "", body, self.region, "lightsail",
            self.access_key, self.secret_key, amz_date,
        )
        headers["X-Amz-Target"] = "Lightsail_20161128.GetInstances"
        headers["Content-Type"] = "application/x-amz-json-1.1"
        return json.loads(self._fetch(f"{self.endpoint}/", headers, body))

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            groups: list[TargetGroup] = []
            token = ""
            while True:
                doc = self._get_instances(token)
                for inst in doc.get("instances") or []:
                    priv = inst.get("privateIpAddress")
                    if not priv:
                        continue
                    labels = {
                        "__meta_lightsail_private_ip": priv,
                        "__meta_lightsail_region": self.region,
                    }
                    az = (inst.get("location") or {}).get("availabilityZone")
                    if az:
                        labels["__meta_lightsail_availability_zone"] = az
                    for src, dst in (
                        ("blueprintId", "blueprint_id"),
                        ("bundleId", "bundle_id"),
                        ("name", "instance_name"),
                        ("supportCode", "instance_support_code"),
                        ("publicIpAddress", "public_ip"),
                    ):
                        if inst.get(src):
                            labels[f"__meta_lightsail_{dst}"] = inst[src]
                    state = (inst.get("state") or {}).get("name")
                    if state:
                        labels["__meta_lightsail_instance_state"] = state
                    if inst.get("ipv6Addresses"):
                        labels["__meta_lightsail_ipv6_addresses"] = _wrap_list(
                            inst["ipv6Addresses"]
                        )
                    for t in inst.get("tags") or []:
                        if t.get("key"):
                            labels[
                                "__meta_lightsail_tag_"
                                + _sanitize_label_name(t["key"])
                            ] = t.get("value", "") or ""
                    groups.append(
                        TargetGroup([f"{priv}:{self.port}"], labels)
                    )
                token = doc.get("nextPageToken", "")
                if not token:
                    break
            self._last_good = groups
        except Exception:
            groups = self._last_good
        return groups


class TritonDiscovery:
    """triton_sd_configs provider (discovery/triton/triton.go:38-45,
    245-305): GET the CMON discovery endpoint
    ``https://{endpoint}:{port}/v{version}/discover``; container role →
    one target per VM at ``{vm_uuid}.{dns_suffix}:{port}``; cn role →
    one per compute node at ``{server_uuid}.{dns_suffix}:{port}``."""

    def __init__(
        self,
        endpoint: str,
        dns_suffix: str = "triton.zone",
        role: str = "container",
        port: int = 9163,
        version: int = 1,
        groups: Optional[list[str]] = None,
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        if role not in ("container", "cn"):
            raise ValueError(f"triton_sd role {role!r} not supported")
        self.endpoint = endpoint
        self.dns_suffix = dns_suffix
        self.role = role
        self.port = port
        self.version = version
        self.groups_filter = list(groups or [])
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        with urllib.request.urlopen(
            urllib.request.Request(url), timeout=self.timeout_s
        ) as resp:
            return resp.read()

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            url = (
                f"https://{self.endpoint}:{self.port}"
                f"/v{self.version}/discover"
            )
            if self.groups_filter:  # triton.go:212 groups query params
                url += "?" + urlencode(
                    [("groups", g) for g in self.groups_filter]
                )
            doc = json.loads(self._fetch(url))
            groups: list[TargetGroup] = []
            if self.role == "container":
                for c in doc.get("containers") or []:
                    labels = {
                        "__meta_triton_machine_id": c.get("vm_uuid", ""),
                        "__meta_triton_machine_alias": c.get("vm_alias", ""),
                        "__meta_triton_machine_brand": c.get("vm_brand", ""),
                        "__meta_triton_machine_image":
                            c.get("vm_image_uuid", ""),
                        "__meta_triton_server_id": c.get("server_uuid", ""),
                    }
                    if c.get("groups"):
                        labels["__meta_triton_groups"] = _wrap_list(c["groups"])
                    groups.append(TargetGroup(
                        [f'{c.get("vm_uuid", "")}.{self.dns_suffix}:{self.port}'],
                        labels,
                    ))
            else:
                for cn in doc.get("cns") or []:
                    labels = {
                        "__meta_triton_machine_id": cn.get("server_uuid", ""),
                        "__meta_triton_machine_alias":
                            cn.get("server_hostname", ""),
                    }
                    groups.append(TargetGroup(
                        [f'{cn.get("server_uuid", "")}.{self.dns_suffix}:{self.port}'],
                        labels,
                    ))
            self._last_good = groups
        except Exception:
            groups = self._last_good
        return groups


class OVHcloudDiscovery:
    """ovhcloud_sd_configs provider, ``vps`` and ``dedicated_server``
    roles (discovery/ovhcloud/vps.go:34,125-190 and
    dedicated_server.go:34,110-160): list service names, fetch each
    service's details + IPs, one target per service with ``__address__``
    = IPv4 (IPv6 fallback) and the reference's label sets.  Requests
    signed with the OVH scheme: ``$1$`` + sha1(AS+CK+METHOD+URL+BODY+TS)
    (the public ovh API contract)."""

    def __init__(
        self,
        application_key: str = "",
        application_secret: str = "",
        consumer_key: str = "",
        service: str = "vps",
        endpoint: str = "https://eu.api.ovh.com/1.0",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        if service not in ("vps", "dedicated_server"):
            raise ValueError(f"ovhcloud_sd service {service!r} not supported")
        self.application_key = application_key
        self.application_secret = application_secret
        self.consumer_key = consumer_key
        self.service = service
        self.endpoint = endpoint.rstrip("/")
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        import hashlib

        ts = str(int(time.time()))
        raw = "+".join(
            [self.application_secret, self.consumer_key, "GET", url, "", ts]
        )
        sig = "$1$" + hashlib.sha1(raw.encode()).hexdigest()
        req = urllib.request.Request(
            url,
            headers={
                "X-Ovh-Application": self.application_key,
                "X-Ovh-Consumer": self.consumer_key,
                "X-Ovh-Timestamp": ts,
                "X-Ovh-Signature": sig,
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _get(self, path: str):
        return json.loads(self._fetch(self.endpoint + path))

    @staticmethod
    def _split_ips(ips: list) -> tuple[str, str]:
        ipv4 = ipv6 = ""
        for ip in ips or []:
            base = str(ip).split("/")[0]
            if ":" in base:
                ipv6 = base
            else:
                ipv4 = base
        return ipv4, ipv6

    def _vps_groups(self) -> list[TargetGroup]:
        groups = []
        for name in self._get("/vps") or []:
            try:
                d = self._get(f"/vps/{urllib.parse.quote(name)}")
                ips = self._get(f"/vps/{urllib.parse.quote(name)}/ips")
            except Exception:
                continue  # vps.go:133 per-service failures are skipped
            ipv4, ipv6 = self._split_ips(ips)
            model = d.get("model") or {}
            labels = {
                "__meta_ovhcloud_vps_offer": model.get("offer", ""),
                "__meta_ovhcloud_vps_datacenter":
                    str(d.get("datacenter") or []),
                "__meta_ovhcloud_vps_model_vcore": str(model.get("vcore", "")),
                "__meta_ovhcloud_vps_maximum_additional_ip":
                    str(model.get("maximumAdditionnalIp", "")),
                "__meta_ovhcloud_vps_version": str(model.get("version", "")),
                "__meta_ovhcloud_vps_model_name": model.get("name", ""),
                "__meta_ovhcloud_vps_disk": str(model.get("disk", "")),
                "__meta_ovhcloud_vps_memory": str(model.get("memory", "")),
                "__meta_ovhcloud_vps_zone": d.get("zone", ""),
                "__meta_ovhcloud_vps_display_name": d.get("displayName", ""),
                "__meta_ovhcloud_vps_cluster": d.get("cluster", ""),
                "__meta_ovhcloud_vps_state": d.get("state", ""),
                "__meta_ovhcloud_vps_name": name,
                "__meta_ovhcloud_vps_netboot_mode": d.get("netbootMode", ""),
                "__meta_ovhcloud_vps_memory_limit":
                    str(d.get("memoryLimit", "")),
                "__meta_ovhcloud_vps_offer_type": d.get("offerType", ""),
                "__meta_ovhcloud_vps_vcore": str(d.get("vcore", "")),
                "__meta_ovhcloud_vps_ipv4": ipv4,
                "__meta_ovhcloud_vps_ipv6": ipv6,
                "instance": name,
            }
            groups.append(TargetGroup([ipv4 or ipv6], labels))
        return groups

    def _dedicated_groups(self) -> list[TargetGroup]:
        groups = []
        for name in self._get("/dedicated/server") or []:
            try:
                d = self._get(f"/dedicated/server/{urllib.parse.quote(name)}")
                ips = self._get(
                    f"/dedicated/server/{urllib.parse.quote(name)}/ips"
                )
            except Exception:
                continue
            ipv4, ipv6 = self._split_ips(ips)
            labels = {
                "__meta_ovhcloud_dedicated_server_state": d.get("state", ""),
                "__meta_ovhcloud_dedicated_server_commercial_range":
                    d.get("commercialRange", ""),
                "__meta_ovhcloud_dedicated_server_link_speed":
                    str(d.get("linkSpeed", "")),
                "__meta_ovhcloud_dedicated_server_rack": d.get("rack", ""),
                "__meta_ovhcloud_dedicated_server_no_intervention":
                    "true" if d.get("noIntervention") else "false",
                "__meta_ovhcloud_dedicated_server_os": d.get("os", ""),
                "__meta_ovhcloud_dedicated_server_support_level":
                    d.get("supportLevel", ""),
                "__meta_ovhcloud_dedicated_server_server_id":
                    str(d.get("serverId", "")),
                "__meta_ovhcloud_dedicated_server_reverse":
                    d.get("reverse", ""),
                "__meta_ovhcloud_dedicated_server_datacenter":
                    d.get("datacenter", ""),
                "__meta_ovhcloud_dedicated_server_name": name,
                "__meta_ovhcloud_dedicated_server_ipv4": ipv4,
                "__meta_ovhcloud_dedicated_server_ipv6": ipv6,
                "instance": name,
            }
            groups.append(TargetGroup([ipv4 or ipv6], labels))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = (
                self._vps_groups()
                if self.service == "vps"
                else self._dedicated_groups()
            )
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


class _ZKClient:
    """Minimal read-only ZooKeeper wire client (stdlib socket/struct):
    the connect handshake plus getChildren (op 8) and getData (op 4) —
    all this provider needs.  Every packet is 4-byte-BE length framed;
    replies carry (xid, zxid, err) headers.  One short-lived session per
    refresh — the reference holds a watch-driven TreeCache session
    (util/treecache); refresh-polling is this repo's documented SD
    stance (same as the Kubernetes list mode)."""

    _OP_GETDATA = 4
    _OP_GETCHILDREN = 8

    def __init__(self, servers: list[str], timeout_s: float = 10.0):
        import socket

        self.timeout_s = timeout_s
        last_err: Exception | None = None
        for server in servers:
            host, _, port = server.partition(":")
            try:
                self._sock = socket.create_connection(
                    (host, int(port or 2181)), timeout=timeout_s
                )
                break
            except OSError as e:  # try the next ensemble member
                last_err = e
        else:
            raise last_err or OSError("no zookeeper servers")
        self._xid = 0
        self._handshake()

    def _send(self, payload: bytes) -> None:
        import struct as _s

        self._sock.sendall(_s.pack(">i", len(payload)) + payload)

    def _recv(self) -> bytes:
        import struct as _s

        hdr = b""
        while len(hdr) < 4:
            chunk = self._sock.recv(4 - len(hdr))
            if not chunk:
                raise OSError("zookeeper connection closed")
            hdr += chunk
        (n,) = _s.unpack(">i", hdr)
        out = b""
        while len(out) < n:
            chunk = self._sock.recv(n - len(out))
            if not chunk:
                raise OSError("zookeeper connection closed")
            out += chunk
        return out

    def _handshake(self) -> None:
        import struct as _s

        # ConnectRequest: protoVersion, lastZxidSeen, timeOut, sessionId,
        # passwd buffer
        self._send(
            _s.pack(">iqiq", 0, 0, int(self.timeout_s * 1000), 0)
            + _s.pack(">i", 16)
            + b"\x00" * 16
        )
        self._recv()  # ConnectResponse — session established

    def _call(self, op: int, path: str) -> bytes:
        import struct as _s

        self._xid += 1
        raw = path.encode()
        self._send(
            _s.pack(">ii", self._xid, op)
            + _s.pack(">i", len(raw))
            + raw
            + b"\x00"  # watch=false
        )
        reply = self._recv()
        _xid, _zxid, err = _s.unpack(">iqi", reply[:16])
        if err != 0:
            raise OSError(f"zookeeper error {err} for {path!r}")
        return reply[16:]

    def get_children(self, path: str) -> list[str]:
        import struct as _s

        body = self._call(self._OP_GETCHILDREN, path)
        (count,) = _s.unpack(">i", body[:4])
        out = []
        pos = 4
        for _ in range(count):
            (n,) = _s.unpack(">i", body[pos : pos + 4])
            pos += 4
            out.append(body[pos : pos + n].decode())
            pos += n
        return out

    def get_data(self, path: str) -> Optional[bytes]:
        import struct as _s

        body = self._call(self._OP_GETDATA, path)
        (n,) = _s.unpack(">i", body[:4])
        return None if n < 0 else body[4 : 4 + n]

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class ZookeeperDiscovery:
    """serverset_sd_configs / nerve_sd_configs provider
    (discovery/zookeeper/zookeeper.go:255-300,304-330): walk each
    configured znode path recursively; every node whose data parses as a
    member JSON becomes a target — serverset members at
    ``serviceEndpoint.host:port`` with ``__meta_serverset_*`` labels
    (additional endpoints, status, shard), nerve members at
    ``host:port`` with ``__meta_nerve_*``."""

    def __init__(
        self,
        servers: list[str],
        paths: list[str],
        role: str = "serverset",
        timeout_s: float = 10.0,
        refresh_interval_ms: int = 60_000,
        zk_client_fn=None,
    ):
        if role not in ("serverset", "nerve"):
            raise ValueError(f"zookeeper sd role {role!r} not supported")
        self.servers = list(servers)
        self.paths = list(paths)
        self.role = role
        self.timeout_s = timeout_s
        self.refresh_interval_ms = refresh_interval_ms
        self._zk_fn = zk_client_fn or (
            lambda: _ZKClient(self.servers, self.timeout_s)
        )
        self._last_good: list[TargetGroup] = []

    def _parse_serverset(self, data: bytes, path: str) -> Optional[TargetGroup]:
        member = json.loads(data)
        ep = member.get("serviceEndpoint") or {}
        host, port = ep.get("host", ""), int(ep.get("port", 0))
        labels = {
            "__meta_serverset_path": path,
            "__meta_serverset_endpoint_host": host,
            "__meta_serverset_endpoint_port": str(port),
            "__meta_serverset_status": member.get("status", ""),
            "__meta_serverset_shard": str(member.get("shard", 0)),
        }
        for name, aep in (member.get("additionalEndpoints") or {}).items():
            clean = _sanitize_label_name(name)
            labels[f"__meta_serverset_endpoint_host_{clean}"] = aep.get("host", "")
            labels[f"__meta_serverset_endpoint_port_{clean}"] = str(
                aep.get("port", 0)
            )
        return TargetGroup([f"{host}:{port}"], labels)

    def _parse_nerve(self, data: bytes, path: str) -> Optional[TargetGroup]:
        member = json.loads(data)
        host, port = member.get("host", ""), int(member.get("port", 0))
        return TargetGroup(
            [f"{host}:{port}"],
            {
                "__meta_nerve_path": path,
                "__meta_nerve_endpoint_host": host,
                "__meta_nerve_endpoint_port": str(port),
                "__meta_nerve_endpoint_name": member.get("name", ""),
            },
        )

    def _walk(self, zk, path: str, out: list[TargetGroup]) -> None:
        parse = (
            self._parse_serverset
            if self.role == "serverset"
            else self._parse_nerve
        )
        try:
            data = zk.get_data(path)
        except OSError:
            return  # NoNode and friends → nothing under this path
        if data:
            try:
                g = parse(data, path)
                if g is not None:
                    out.append(g)
            except (ValueError, KeyError, TypeError):
                pass  # non-member node data
        try:
            children = zk.get_children(path)
        except OSError:
            return
        for child in children:
            self._walk(zk, path.rstrip("/") + "/" + child, out)

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            zk = self._zk_fn()
            try:
                out: list[TargetGroup] = []
                for p in self.paths:
                    self._walk(zk, p, out)
            finally:
                close = getattr(zk, "close", None)
                if close:
                    close()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


# --- minimal RSA-SHA256 signer (OCI HTTP Signature auth) -------------------
#
# OCI request signing needs RSASSA-PKCS1-v1_5 over SHA-256 — stdlib has
# no RSA, but signing (not verifying untrusted input) is just modular
# exponentiation with the private exponent plus a fixed DER prefix, and
# key material is a DER structure a 40-line TLV reader handles.


def _der_walk(data: bytes, pos: int = 0) -> tuple[int, bytes, int]:
    """One DER TLV: returns (tag, value, next_pos)."""
    tag = data[pos]
    pos += 1
    length = data[pos]
    pos += 1
    if length & 0x80:
        nbytes = length & 0x7F
        length = int.from_bytes(data[pos : pos + nbytes], "big")
        pos += nbytes
    return tag, data[pos : pos + length], pos + length


def _rsa_key_from_pem(pem: str) -> tuple[int, int]:
    """(n, d) from a PKCS#1 (``RSA PRIVATE KEY``) or PKCS#8
    (``PRIVATE KEY``) PEM."""
    import base64
    import re as _re

    body = "".join(
        ln
        for ln in pem.strip().splitlines()
        if ln and not ln.startswith("-----")
    )
    der = base64.b64decode(body)
    _tag, seq, _ = _der_walk(der)
    # PKCS#8 wraps PKCS#1 in version+algid+OCTET STRING
    pos = 0
    tag, first, pos = _der_walk(seq, pos)
    if tag == 0x02 and len(first) <= 2:  # version int
        tag2, second, pos2 = _der_walk(seq, pos)
        if tag2 == 0x30:  # AlgorithmIdentifier → PKCS#8
            _t, octets, _p = _der_walk(seq, pos2)
            _tg, seq, _ = _der_walk(octets)
            pos = 0
            _t, _version, pos = _der_walk(seq, pos)
    ints = []
    while pos < len(seq) and len(ints) < 4:
        _t, v, pos = _der_walk(seq, pos)
        ints.append(int.from_bytes(v, "big"))
    # RSAPrivateKey ::= {version already consumed? ints: n, e, d, ...}
    n, _e, d = ints[0], ints[1], ints[2]
    return n, d


#: DigestInfo DER prefix for SHA-256 (RFC 8017 §9.2)
_SHA256_DER_PREFIX = bytes.fromhex(
    "3031300d060960864801650304020105000420"
)


def _rsa_sha256_sign(message: bytes, n: int, d: int) -> bytes:
    import hashlib

    k = (n.bit_length() + 7) // 8
    t = _SHA256_DER_PREFIX + hashlib.sha256(message).digest()
    em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    return pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")


class OCIDiscovery:
    """oci_sd_configs provider (discovery/oci/oci.go:48-65,600-700):
    list instances per compartment, resolve the primary VNIC via
    vnicAttachments + vnics, one target per instance at
    ``private_ip:port`` (public → sorted-first IPv6 fallback) with the
    ``__meta_oci_*`` labels (freeform ``tag_``, scalar-stringified
    ``defined_tag_<ns>_<k>``).

    Auth is OCI's HTTP Signature scheme — RSA-SHA256 over
    ``date (request-target) host`` with the API-key fingerprint keyId —
    implemented on the pure-Python signer above."""

    def __init__(
        self,
        region: str,
        tenancy: str = "",
        user: str = "",
        fingerprint: str = "",
        private_key_pem: str = "",
        compartments: Optional[list[str]] = None,
        port: int = 9100,
        endpoint: str = "",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        self.region = region
        self.tenancy = tenancy
        self.user = user
        self.fingerprint = fingerprint
        self.private_key_pem = private_key_pem
        self.compartments = list(compartments or ([tenancy] if tenancy else []))
        self.port = port
        self.endpoint = (
            endpoint or f"https://iaas.{region}.oraclecloud.com"
        ).rstrip("/")
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._key: Optional[tuple[int, int]] = None
        self._last_good: list[TargetGroup] = []

    def signed_headers(self, method: str, url: str) -> dict:
        """The OCI Signature v1 header set for a body-less request."""
        if self._key is None:
            self._key = _rsa_key_from_pem(self.private_key_pem)
        parsed = urllib.parse.urlparse(url)
        target = parsed.path + (f"?{parsed.query}" if parsed.query else "")
        date = time.strftime("%a, %d %b %Y %H:%M:%S GMT", time.gmtime())
        signing = (
            f"date: {date}\n(request-target): {method.lower()} {target}\n"
            f"host: {parsed.netloc}"
        )
        import base64

        sig = base64.b64encode(
            _rsa_sha256_sign(signing.encode(), *self._key)
        ).decode()
        key_id = f"{self.tenancy}/{self.user}/{self.fingerprint}"
        return {
            "Date": date,
            "Authorization": (
                'Signature version="1",keyId="%s",algorithm="rsa-sha256",'
                'headers="date (request-target) host",signature="%s"'
                % (key_id, sig)
            ),
        }

    def _http_get(self, url: str) -> bytes:
        req = urllib.request.Request(url, headers=self.signed_headers("get", url))
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _get(self, path: str, **params) -> list:
        q = urlencode({k: v for k, v in params.items() if v})
        return json.loads(
            self._fetch(f"{self.endpoint}/20160918{path}" + (f"?{q}" if q else ""))
        )

    def _primary_vnic(self, compartment: str, instance_id: str) -> dict:
        for att in self._get(
            "/vnicAttachments", compartmentId=compartment, instanceId=instance_id
        ):
            if att.get("lifecycleState") != "ATTACHED" or not att.get("vnicId"):
                continue
            vnic = json.loads(
                self._fetch(f'{self.endpoint}/20160918/vnics/{att["vnicId"]}')
            )
            if vnic.get("isPrimary"):
                return vnic
        return {}

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            groups: list[TargetGroup] = []
            for compartment in self.compartments:
                for inst in self._get("/instances", compartmentId=compartment):
                    vnic = self._primary_vnic(
                        compartment, inst.get("id", "")
                    )
                    ipv6 = sorted(vnic.get("ipv6Addresses") or [])
                    addr = (
                        vnic.get("privateIp")
                        or vnic.get("publicIp")
                        or (ipv6[0] if ipv6 else "")
                    )
                    labels = {
                        "__meta_oci_instance_id": inst.get("id", ""),
                        "__meta_oci_instance_name":
                            inst.get("displayName", ""),
                        "__meta_oci_instance_state":
                            inst.get("lifecycleState", ""),
                        "__meta_oci_instance_shape": inst.get("shape", ""),
                        "__meta_oci_availability_domain":
                            inst.get("availabilityDomain", ""),
                        "__meta_oci_fault_domain":
                            inst.get("faultDomain", ""),
                        "__meta_oci_region": inst.get("region", ""),
                        "__meta_oci_tenancy_id": self.tenancy,
                        "__meta_oci_compartment_id": compartment,
                        "__meta_oci_image_id": inst.get("imageId", ""),
                        "__meta_oci_vnic_id": vnic.get("id", ""),
                        "__meta_oci_private_ip": vnic.get("privateIp", "") or "",
                        "__meta_oci_public_ip": vnic.get("publicIp", "") or "",
                        "__meta_oci_hostname_label":
                            vnic.get("hostnameLabel", "") or "",
                        "__meta_oci_ipv6_addresses":
                            _wrap_list(ipv6) if ipv6 else "",
                    }
                    for k, v in (inst.get("freeformTags") or {}).items():
                        labels[
                            "__meta_oci_tag_" + _sanitize_label_name(k)
                        ] = str(v)
                    for ns, tags in (inst.get("definedTags") or {}).items():
                        for k, v in (tags or {}).items():
                            if isinstance(v, bool):
                                v = "true" if v else "false"
                            elif isinstance(v, float) and v.is_integer():
                                v = str(int(v))
                            elif not isinstance(v, (str, int)):
                                continue  # non-scalar skipped (oci.go)
                            labels[
                                "__meta_oci_defined_tag_"
                                + _sanitize_label_name(ns)
                                + "_"
                                + _sanitize_label_name(k)
                            ] = str(v)
                    host = f"[{addr}]" if ":" in addr else addr
                    groups.append(TargetGroup([f"{host}:{self.port}"], labels))
            self._last_good = groups
        except Exception:
            groups = self._last_good
        return groups


class KumaDiscovery:
    """kuma_sd_configs provider — the reference's xDS REST-JSON client
    specialized to Kuma MADS v1 (discovery/xds/client.go:160-210,
    kuma.go:42-160): POST a DiscoveryRequest to
    ``{server}/v3/discovery:monitoringassignments``; each
    MonitoringAssignment target becomes a scrape target carrying
    ``__meta_kuma_mesh/service/dataplane`` + user ``label_*`` labels and
    the relabel-visible ``__address__``/``__scheme__``/
    ``__metrics_path__``/``instance``.  version_info/nonce are echoed
    back (304 → keep the current set)."""

    def __init__(
        self,
        server: str,
        client_id: str = "prometheus_spark",
        refresh_interval_ms: int = 15_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str, bytes], bytes]] = None,
    ):
        self.server = server.rstrip("/")
        self.client_id = client_id
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_post
        self._version = ""
        self._nonce = ""
        self._last_good: list[TargetGroup] = []

    def _http_post(self, url: str, body: bytes) -> bytes:
        req = urllib.request.Request(
            url,
            data=body,
            headers={"Content-Type": "application/json",
                     "Accept": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            if resp.status == 304:
                return b""
            return resp.read()

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            body = json.dumps(
                {
                    "version_info": self._version,
                    "response_nonce": self._nonce,
                    "type_url": (
                        "type.googleapis.com/"
                        "kuma.observability.v1.MonitoringAssignment"
                    ),
                    "resource_names": [],
                    "node": {"id": self.client_id},
                }
            ).encode()
            raw = self._fetch(
                f"{self.server}/v3/discovery:monitoringassignments", body
            )
            if not raw:  # 304 Not Modified
                return self._last_good
            doc = json.loads(raw)
            self._version = doc.get("version_info", "") or doc.get(
                "versionInfo", ""
            )
            self._nonce = doc.get("nonce", "")
            groups: list[TargetGroup] = []
            for res in doc.get("resources") or []:
                common = {
                    "__meta_kuma_label_" + _sanitize_label_name(k): v
                    for k, v in (res.get("labels") or {}).items()
                }
                common["__meta_kuma_mesh"] = res.get("mesh", "")
                common["__meta_kuma_service"] = res.get("service", "")
                for t in res.get("targets") or []:
                    labels = {
                        **common,
                        **{
                            "__meta_kuma_label_" + _sanitize_label_name(k): v
                            for k, v in (t.get("labels") or {}).items()
                        },
                        "__meta_kuma_dataplane": t.get("name", ""),
                        "instance": t.get("name", ""),
                        "__scheme__": t.get("scheme", ""),
                        "__metrics_path__": t.get("metricsPath", "")
                        or t.get("metrics_path", ""),
                    }
                    groups.append(
                        TargetGroup([t.get("address", "")], labels)
                    )
            self._last_good = groups
        except Exception:
            groups = self._last_good
        return groups


class OutscaleDiscovery:
    """outscale_sd_configs provider (discovery/outscale/vm.go:28-37,
    85-150): POST ``ReadVms`` to the OAPI endpoint (SigV4-signed, the
    same stdlib signer EC2 uses); one target per VM at
    ``private_ip:port`` (public fallback, address-less skipped) with the
    ``__meta_outscale_vm_*`` labels; empty tag keys/values dropped."""

    def __init__(
        self,
        region: str,
        access_key: str = "",
        secret_key: str = "",
        port: int = 80,
        endpoint: str = "",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str, dict, bytes], bytes]] = None,
    ):
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.port = port
        self.endpoint = endpoint or f"https://api.{region}.outscale.com/api/v1"
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_post
        self._last_good: list[TargetGroup] = []

    def _http_post(self, url: str, headers: dict, body: bytes) -> bytes:
        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            body = b"{}"
            parsed = urllib.parse.urlparse(self.endpoint)
            amz_date = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
            headers = _sigv4_headers(
                "POST", parsed.netloc, parsed.path + "/ReadVms", "", body,
                self.region, "oapi", self.access_key, self.secret_key,
                amz_date,
            )
            headers["Content-Type"] = "application/json"
            doc = json.loads(
                self._fetch(f"{self.endpoint}/ReadVms", headers, body)
            )
            groups: list[TargetGroup] = []
            for vm in doc.get("Vms") or []:
                addr_ip = vm.get("PrivateIp") or vm.get("PublicIp")
                if not addr_ip:
                    continue
                labels = {
                    "__meta_outscale_vm_instance_id": vm.get("VmId", ""),
                    "__meta_outscale_vm_region": self.region,
                    "__meta_outscale_vm_state": vm.get("State", ""),
                }
                sub = (vm.get("Placement") or {}).get("SubregionName")
                if sub:
                    labels["__meta_outscale_vm_subregion"] = sub
                if vm.get("PrivateIp"):
                    labels["__meta_outscale_vm_private_ip"] = vm["PrivateIp"]
                if vm.get("PublicIp"):
                    labels["__meta_outscale_vm_public_ip"] = vm["PublicIp"]
                for t in vm.get("Tags") or []:
                    if t.get("Key") and t.get("Value"):
                        labels[
                            "__meta_outscale_vm_tag_"
                            + _sanitize_label_name(t["Key"])
                        ] = t["Value"]
                groups.append(
                    TargetGroup([f"{addr_ip}:{self.port}"], labels)
                )
            self._last_good = groups
        except Exception:
            groups = self._last_good
        return groups


class IonosDiscovery(_BearerListDiscovery):
    """ionos_sd_configs provider (discovery/ionos/server.go:38-52,
    85-160): GET ``/cloudapi/v6/datacenters/{id}/servers?depth=3``; one
    target per server with ≥1 NIC IP at ``first_ip:port`` with the
    ``__meta_ionos_server_*`` labels — wrapped full IP list, per-NIC
    ``nic_ip_<name>`` lists, boot cdrom/volume/image ids."""

    def __init__(
        self,
        datacenter_id: str,
        token: str = "",
        port: int = 80,
        endpoint: str = "https://api.ionos.com",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        super().__init__(
            token, port, endpoint, refresh_interval_ms, timeout_s, fetch_fn
        )
        self.datacenter_id = datacenter_id

    def _groups(self) -> list[TargetGroup]:
        doc = self._get_json(
            f"{self.endpoint}/cloudapi/v6/datacenters/"
            f"{self.datacenter_id}/servers?depth=3"
        )
        groups: list[TargetGroup] = []
        for server in doc.get("items") or []:
            props = server.get("properties") or {}
            entities = server.get("entities") or {}
            ips: list[str] = []
            by_nic: dict[str, list[str]] = {}
            for nic in (entities.get("nics") or {}).get("items") or []:
                nprops = nic.get("properties") or {}
                name = nprops.get("name") or "unnamed"
                nic_ips = nprops.get("ips") or []
                ips = nic_ips + ips
                by_nic[name] = nic_ips + by_nic.get(name, [])
            if not ips:
                continue  # server.go:116 IP-less servers dropped
            labels = {
                "__meta_ionos_server_availability_zone":
                    props.get("availabilityZone", ""),
                "__meta_ionos_server_cpu_family": props.get("cpuFamily", ""),
                "__meta_ionos_server_servers_id": doc.get("id", ""),
                "__meta_ionos_server_id": server.get("id", ""),
                "__meta_ionos_server_ip": _wrap_list(ips),
                "__meta_ionos_server_lifecycle":
                    (server.get("metadata") or {}).get("state", ""),
                "__meta_ionos_server_name": props.get("name", ""),
                "__meta_ionos_server_state": props.get("vmState", ""),
                "__meta_ionos_server_type": props.get("type", ""),
            }
            for name, nic_ips in by_nic.items():
                labels[
                    "__meta_ionos_server_nic_ip_" + _sanitize_label_name(name)
                ] = _wrap_list(nic_ips)
            if props.get("bootCdrom"):
                labels["__meta_ionos_server_boot_cdrom_id"] = props[
                    "bootCdrom"
                ].get("id", "")
            if props.get("bootVolume"):
                labels["__meta_ionos_server_boot_volume_id"] = props[
                    "bootVolume"
                ].get("id", "")
            volumes = (entities.get("volumes") or {}).get("items") or []
            if volumes:
                image = (volumes[0].get("properties") or {}).get("image")
                if image:
                    labels["__meta_ionos_server_boot_image_id"] = image
            groups.append(TargetGroup([f"{ips[0]}:{self.port}"], labels))
        return groups


class StackitDiscovery(_BearerListDiscovery):
    """stackit_sd_configs provider (discovery/stackit/server.go:35-44,
    140-225): list a project's servers; address = first public IP, else
    first private IPv4; servers without NICs or IPs are skipped; labels
    ``__meta_stackit_*`` incl. per-network ``private_ipv4_<net>`` and
    ``label_``/``labelpresent_`` pairs."""

    def __init__(
        self,
        project: str,
        token: str = "",
        port: int = 80,
        region: str = "eu01",
        endpoint: str = "",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        endpoint = endpoint or f"https://iaas.api.{region}.stackit.cloud"
        super().__init__(
            token, port, endpoint, refresh_interval_ms, timeout_s, fetch_fn
        )
        self.project = project

    def _groups(self) -> list[TargetGroup]:
        doc = self._get_json(
            f"{self.endpoint}/v1/projects/{self.project}/servers?details=true"
        )
        groups: list[TargetGroup] = []
        for server in doc.get("items") or []:
            nics = server.get("nics")
            if not nics:
                continue
            labels = {
                "__meta_stackit_project": self.project,
                "__meta_stackit_id": server.get("id", ""),
                "__meta_stackit_name": server.get("name", ""),
                "__meta_stackit_availability_zone":
                    server.get("availabilityZone", ""),
                "__meta_stackit_status": server.get("status", ""),
                "__meta_stackit_power_status": server.get("powerStatus", ""),
                "__meta_stackit_type": server.get("machineType", ""),
            }
            address = public_ip = ""
            for nic in nics:
                if nic.get("publicIp") and not public_ip:
                    public_ip = nic["publicIp"]
                    address = public_ip
                if nic.get("ipv4"):
                    labels[
                        "__meta_stackit_private_ipv4_"
                        + _sanitize_label_name(nic.get("networkName", ""))
                    ] = nic["ipv4"]
                    if not address:
                        address = nic["ipv4"]
            if not address:
                continue
            if public_ip:
                labels["__meta_stackit_public_ipv4"] = public_ip
            for k, v in (server.get("labels") or {}).items():
                if isinstance(v, str):
                    sk = _sanitize_label_name(k)
                    labels[f"__meta_stackit_label_{sk}"] = v
                    labels[f"__meta_stackit_labelpresent_{sk}"] = "true"
            groups.append(TargetGroup([f"{address}:{self.port}"], labels))
        return groups


class UyuniDiscovery:
    """uyuni_sd_configs provider (discovery/uyuni/uyuni.go:42-50,
    160-330): XML-RPC against ``{server}/rpc/api`` — auth.login, then
    system.listSystemGroupsForSystemsWithEntitlement /
    system.monitoring.listEndpoints / system.getNetworkForSystems; one
    target per monitoring endpoint at ``hostname:port`` with the
    ``__meta_uyuni_*`` labels (stdlib ``xmlrpc.client``)."""

    def __init__(
        self,
        server: str,
        username: str = "",
        password: str = "",
        entitlement: str = "monitoring_entitled",
        separator: str = ",",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        rpc_client=None,
    ):
        self.server = server.rstrip("/")
        self.username = username
        self.password = password
        self.entitlement = entitlement
        self.separator = separator
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._rpc = rpc_client  # object with .<method>(args...) attrs
        self._last_good: list[TargetGroup] = []

    def _client(self):
        if self._rpc is not None:
            return self._rpc
        import xmlrpc.client

        return xmlrpc.client.ServerProxy(self.server + "/rpc/api")

    def _groups(self) -> list[TargetGroup]:
        c = self._client()
        token = c.auth.login(self.username, self.password)
        groups_by_system = c.system.listSystemGroupsForSystemsWithEntitlement(
            token, self.entitlement
        )
        by_system_groups = {
            g["id"]: [x.get("name", "") for x in g.get("system_groups") or []]
            for g in groups_by_system
        }
        system_ids = list(by_system_groups)
        endpoints = c.system.monitoring.listEndpoints(token, system_ids)
        networks = c.system.getNetworkForSystems(token, system_ids)
        net_by_id = {n["system_id"]: n for n in networks}
        out: list[TargetGroup] = []
        for ep in endpoints:
            sid = ep.get("system_id")
            net = net_by_id.get(sid) or {}
            host = net.get("hostname", "")
            labels = {
                "__meta_uyuni_minion_hostname": host,
                "__meta_uyuni_primary_fqdn": net.get("primary_fqdn", ""),
                "__meta_uyuni_system_id": str(sid),
                "__meta_uyuni_groups": self.separator.join(
                    by_system_groups.get(sid, [])
                ),
                "__meta_uyuni_endpoint_name": ep.get("endpoint_name", ""),
                "__meta_uyuni_exporter": ep.get("exporter_name", ""),
                "__meta_uyuni_proxy_module": ep.get("module", ""),
                "__meta_uyuni_metrics_path": ep.get("path", ""),
                "__meta_uyuni_scheme":
                    "https" if ep.get("tls_enabled") else "http",
            }
            out.append(TargetGroup([f'{host}:{ep.get("port", 0)}'], labels))
        return out

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = self._groups()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


class DockerDiscovery:
    """docker_sd_configs provider — plain (non-swarm) containers
    (discovery/moby/docker.go:42-53,200-330): one target per
    (container, network, TCP private port) at ``network_ip:private``
    with the ``__meta_docker_*`` labels (container id/name/network_mode/
    label_*, network_*, port private/public/public_ip); containers with
    no exposed TCP port fall back to ``network_ip:port``; host-network
    containers target ``host_networking_host``; ``container:`` network
    mode resolves the shared container's networks."""

    def __init__(
        self,
        host: str,
        port: int = 80,
        host_networking_host: str = "localhost",
        match_first_network: bool = True,
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        self.host = host.rstrip("/")
        self.port = port
        self.host_networking_host = host_networking_host
        self.match_first_network = match_first_network
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        with urllib.request.urlopen(
            urllib.request.Request(url), timeout=self.timeout_s
        ) as resp:
            return resp.read()

    def _get(self, path: str) -> list:
        return json.loads(self._fetch(self.host + path)) or []

    def _groups(self) -> list[TargetGroup]:
        containers = self._get("/containers/json")
        by_id = {c.get("Id", ""): c for c in containers}
        network_labels = {}
        for net in self._get("/networks"):
            nid = net.get("Id", "")
            nl = {
                "__meta_docker_network_id": nid,
                "__meta_docker_network_name": net.get("Name", ""),
                "__meta_docker_network_scope": net.get("Scope", ""),
                "__meta_docker_network_internal":
                    "true" if net.get("Internal") else "false",
                "__meta_docker_network_ingress":
                    "true" if net.get("Ingress") else "false",
            }
            for k, v in (net.get("Labels") or {}).items():
                nl["__meta_docker_network_label_" + _sanitize_label_name(k)] = v
            network_labels[nid] = nl

        groups: list[TargetGroup] = []
        for c in containers:
            names = c.get("Names") or []
            if not names:
                continue
            mode = (c.get("HostConfig") or {}).get("NetworkMode", "")
            common = {
                "__meta_docker_container_id": c.get("Id", ""),
                "__meta_docker_container_name": names[0],
                "__meta_docker_container_network_mode": mode,
            }
            for k, v in (c.get("Labels") or {}).items():
                common[
                    "__meta_docker_container_label_" + _sanitize_label_name(k)
                ] = v
            networks = (c.get("NetworkSettings") or {}).get("Networks") or {}
            # container:<id> network mode shares another container's nets
            m = mode
            while not networks and m.startswith("container:"):
                shared = by_id.get(m[len("container:"):])
                if not shared:
                    break
                networks = (
                    (shared.get("NetworkSettings") or {}).get("Networks") or {}
                )
                m = (shared.get("HostConfig") or {}).get("NetworkMode", "")
            if self.match_first_network and len(networks) > 1:
                first = sorted(k for k, n in networks.items() if n)[0]
                networks = {first: networks[first]}
            for n in networks.values():
                if not n:
                    continue
                ip = n.get("IPAddress") or n.get("GlobalIPv6Address") or ""
                netl = network_labels.get(n.get("NetworkID", ""), {})
                added = False
                for p in c.get("Ports") or []:
                    if p.get("Type") != "tcp":
                        continue
                    labels = {
                        **common, **netl,
                        "__meta_docker_network_ip": ip,
                        "__meta_docker_port_private":
                            str(p.get("PrivatePort", "")),
                    }
                    if p.get("PublicPort"):
                        labels["__meta_docker_port_public"] = str(p["PublicPort"])
                        labels["__meta_docker_port_public_ip"] = p.get("IP", "")
                    host = f"[{ip}]" if ":" in ip else ip
                    groups.append(TargetGroup(
                        [f'{host}:{p.get("PrivatePort", 0)}'], labels
                    ))
                    added = True
                if not added:
                    labels = {**common, **netl, "__meta_docker_network_ip": ip}
                    if mode != "host":
                        host = f"[{ip}]" if ":" in ip else ip
                        addr = f"{host}:{self.port}"
                    else:
                        addr = self.host_networking_host
                    groups.append(TargetGroup([addr], labels))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = self._groups()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


class OpenStackDiscovery:
    """openstack_sd_configs provider, ``instance`` and ``hypervisor``
    roles (discovery/openstack/instance.go:38-49,150-250 and
    hypervisor.go:33-45,61-100).

    instance: one target per (server, address-pool, fixed address) at
    ``addr:port`` with ``__meta_openstack_instance_*`` + address-pool +
    metadata ``tag_*`` labels; floating addresses are never targets —
    they attach as ``public_ip`` to the pool's fixed targets
    (approximating the reference's neutron floating-IP join with the
    ``OS-EXT-IPS:type`` field the compute listing already carries).
    hypervisor: one target per hypervisor at ``host_ip:port``.

    Auth: Keystone v3 password flow (POST /v3/auth/tokens →
    X-Subject-Token) when ``identity_endpoint``+credentials are set;
    tests inject ``fetch_fn`` and ``compute_endpoint``."""

    def __init__(
        self,
        role: str = "instance",
        region: str = "",
        identity_endpoint: str = "",
        username: str = "",
        password: str = "",
        project_name: str = "",
        domain_name: str = "Default",
        all_tenants: bool = False,
        port: int = 80,
        compute_endpoint: str = "",
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        if role not in ("instance", "hypervisor"):
            raise ValueError(f"openstack_sd role {role!r} not supported")
        self.role = role
        self.region = region
        self.identity_endpoint = identity_endpoint.rstrip("/")
        self.username = username
        self.password = password
        self.project_name = project_name
        self.domain_name = domain_name
        self.all_tenants = all_tenants
        self.port = port
        self.compute_endpoint = compute_endpoint.rstrip("/")
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._token = ""
        self._last_good: list[TargetGroup] = []

    def _authenticate(self) -> None:
        body = json.dumps(
            {
                "auth": {
                    "identity": {
                        "methods": ["password"],
                        "password": {
                            "user": {
                                "name": self.username,
                                "domain": {"name": self.domain_name},
                                "password": self.password,
                            }
                        },
                    },
                    "scope": {
                        "project": {
                            "name": self.project_name,
                            "domain": {"name": self.domain_name},
                        }
                    },
                }
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.identity_endpoint}/v3/auth/tokens",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            self._token = resp.headers.get("X-Subject-Token", "")
            doc = json.loads(resp.read())
        if not self.compute_endpoint:
            for svc in (doc.get("token") or {}).get("catalog") or []:
                if svc.get("type") != "compute":
                    continue
                for ep in svc.get("endpoints") or []:
                    if ep.get("interface") == "public" and (
                        not self.region or ep.get("region") == self.region
                    ):
                        self.compute_endpoint = ep.get("url", "").rstrip("/")

    def _http_get(self, url: str) -> bytes:
        if not self._token and self.identity_endpoint:
            self._authenticate()
        req = urllib.request.Request(
            url, headers={"X-Auth-Token": self._token}
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _instance_groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        url = f"{self.compute_endpoint}/servers/detail"
        if self.all_tenants:
            url += "?all_tenants=True"
        while url:
            doc = json.loads(self._fetch(url))
            for s in doc.get("servers") or []:
                addresses = s.get("addresses") or {}
                if not addresses:
                    continue  # instance.go:175 address-less skipped
                flavor = s.get("flavor") or {}
                base = {
                    "__meta_openstack_instance_id": s.get("id", ""),
                    "__meta_openstack_instance_status": s.get("status", ""),
                    "__meta_openstack_instance_name": s.get("name", ""),
                    "__meta_openstack_project_id": s.get("tenant_id", ""),
                    "__meta_openstack_user_id": s.get("user_id", ""),
                    "__meta_openstack_instance_flavor":
                        flavor.get("original_name") or flavor.get("id", ""),
                }
                image = s.get("image")
                if isinstance(image, dict) and image.get("id"):
                    base["__meta_openstack_instance_image"] = image["id"]
                for k, v in (s.get("metadata") or {}).items():
                    base["__meta_openstack_tag_" + _sanitize_label_name(k)] = str(v)
                for pool, entries in addresses.items():
                    if not isinstance(entries, list):
                        continue
                    floating = [
                        e.get("addr")
                        for e in entries
                        if isinstance(e, dict)
                        and e.get("OS-EXT-IPS:type") == "floating"
                    ]
                    for e in entries:
                        if not isinstance(e, dict) or not e.get("addr"):
                            continue
                        if e.get("OS-EXT-IPS:type") == "floating":
                            continue  # floating addrs are not targets
                        labels = dict(base)
                        labels["__meta_openstack_address_pool"] = pool
                        labels["__meta_openstack_private_ip"] = e["addr"]
                        if floating:
                            labels["__meta_openstack_public_ip"] = floating[0]
                        host = (
                            f'[{e["addr"]}]' if ":" in e["addr"] else e["addr"]
                        )
                        groups.append(
                            TargetGroup([f"{host}:{self.port}"], labels)
                        )
            url = next(
                (
                    ln.get("href")
                    for ln in doc.get("servers_links") or []
                    if ln.get("rel") == "next"
                ),
                "",
            )
        return groups

    def _hypervisor_groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        doc = json.loads(self._fetch(f"{self.compute_endpoint}/os-hypervisors/detail"))
        for h in doc.get("hypervisors") or []:
            ip = h.get("host_ip", "")
            labels = {
                "__meta_openstack_hypervisor_id": str(h.get("id", "")),
                "__meta_openstack_hypervisor_hostname":
                    h.get("hypervisor_hostname", ""),
                "__meta_openstack_hypervisor_host_ip": ip,
                "__meta_openstack_hypervisor_status": h.get("status", ""),
                "__meta_openstack_hypervisor_state": h.get("state", ""),
                "__meta_openstack_hypervisor_type":
                    h.get("hypervisor_type", ""),
            }
            host = f"[{ip}]" if ":" in ip else ip
            groups.append(TargetGroup([f"{host}:{self.port}"], labels))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = (
                self._instance_groups()
                if self.role == "instance"
                else self._hypervisor_groups()
            )
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


class MarathonDiscovery:
    """marathon_sd_configs provider (discovery/marathon/marathon.go:
    41-60,415-520): GET ``/v2/apps?embed=apps.tasks``; one target per
    (task, port) with ``__meta_marathon_app``/``_image``/``_task``/
    ``_port_index`` plus ``app_label_*`` and per-port
    ``port_mapping_label_*`` / ``port_definition_label_*`` labels.  Port
    resolution follows the reference's precedence: container
    portMappings > docker portMappings > portDefinitions (app ports only
    when requirePorts) > task ports, with zero ports resolved from the
    task; container-network apps use the task's first IP address."""

    def __init__(
        self,
        servers: list[str],
        auth_token: str = "",
        refresh_interval_ms: int = 30_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        self.servers = [s.rstrip("/") for s in (servers or [])]
        self.auth_token = auth_token
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        headers = {}
        if self.auth_token:
            headers["Authorization"] = f"token={self.auth_token}"
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    @staticmethod
    def _app_ports(app: dict) -> tuple[list[int], list[dict], str, bool]:
        container = app.get("container") or {}
        container_net = any(
            (n.get("mode") == "container")
            for n in app.get("networks") or []
        )
        pms = container.get("portMappings") or (
            (container.get("docker") or {}).get("portMappings") or []
        )
        if pms:
            ports = [
                (pm.get("containerPort") if container_net else pm.get("hostPort"))
                or 0
                for pm in pms
            ]
            return ports, [pm.get("labels") or {} for pm in pms], (
                "__meta_marathon_port_mapping_label_"
            ), container_net
        pds = app.get("portDefinitions") or []
        if pds:
            require = bool(app.get("requirePorts"))
            ports = [(pd.get("port") or 0) if require else 0 for pd in pds]
            return ports, [pd.get("labels") or {} for pd in pds], (
                "__meta_marathon_port_definition_label_"
            ), container_net
        return [], [], "", container_net

    def _groups(self) -> list[TargetGroup]:
        doc = json.loads(self._fetch(f"{self.servers[0]}/v2/apps?embed=apps.tasks"))
        groups: list[TargetGroup] = []
        for app in doc.get("apps") or []:
            base = {"__meta_marathon_app": app.get("id", "")}
            image = ((app.get("container") or {}).get("docker") or {}).get(
                "image", ""
            )
            if image:
                base["__meta_marathon_image"] = image
            for k, v in (app.get("labels") or {}).items():
                base[
                    "__meta_marathon_app_label_" + _sanitize_label_name(k)
                ] = v
            ports, port_labels, prefix, container_net = self._app_ports(app)
            for t in app.get("tasks") or []:
                tports = list(ports)
                if not tports and t.get("ports"):
                    tports = list(t["ports"])
                    port_labels = []
                host = t.get("host", "")
                if container_net and t.get("ipAddresses"):
                    host = t["ipAddresses"][0].get("ipAddress", host)
                for i, port in enumerate(tports):
                    if port == 0 and len(t.get("ports") or []) == len(tports):
                        port = t["ports"][i]
                    labels = {
                        **base,
                        "__meta_marathon_task": t.get("id", ""),
                        "__meta_marathon_port_index": str(i),
                    }
                    if i < len(port_labels):
                        for k, v in port_labels[i].items():
                            labels[prefix + _sanitize_label_name(k)] = v
                    hostp = f"[{host}]" if ":" in host else host
                    groups.append(TargetGroup([f"{hostp}:{port}"], labels))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = self._groups()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


class PuppetDBDiscovery:
    """puppetdb_sd_configs provider (discovery/puppetdb/puppetdb.go:
    44-54,180-260): POST a PQL query to ``/pdb/query/v4``; one target
    per returned resource at ``certname:port`` with the
    ``__meta_puppetdb_*`` labels; tags separator-wrapped; parameters
    flattened only when ``include_parameters`` (they may hold secrets,
    puppetdb.go:250)."""

    def __init__(
        self,
        url: str,
        query: str,
        port: int = 80,
        include_parameters: bool = False,
        refresh_interval_ms: int = 60_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str, bytes], bytes]] = None,
    ):
        if not query:
            raise ValueError("puppetdb_sd: query missing")
        self.url = url.rstrip("/") + "/pdb/query/v4"
        self.query = query
        self.port = port
        self.include_parameters = include_parameters
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_post
        self._last_good: list[TargetGroup] = []

    def _http_post(self, url: str, body: bytes) -> bytes:
        req = urllib.request.Request(
            url,
            data=body,
            headers={"Content-Type": "application/json",
                     "Accept": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    @staticmethod
    def _flatten_params(prefix: str, value, out: dict) -> None:
        """Nested parameter maps flatten to underscore-joined label
        names (puppetdb/resources.go Parameters.toLabels)."""
        if isinstance(value, dict):
            for k, v in value.items():
                PuppetDBDiscovery._flatten_params(
                    f"{prefix}{_sanitize_label_name(str(k))}_", v, out
                )
        elif isinstance(value, list):
            out[prefix.rstrip("_")] = _wrap_list([str(x) for x in value])
        elif isinstance(value, bool):
            out[prefix.rstrip("_")] = "true" if value else "false"
        elif value is not None:
            out[prefix.rstrip("_")] = str(value)

    def _groups(self) -> list[TargetGroup]:
        resources = json.loads(
            self._fetch(self.url, json.dumps({"query": self.query}).encode())
        )
        groups: list[TargetGroup] = []
        for r in resources or []:
            certname = r.get("certname", "")
            labels = {
                "__meta_puppetdb_query": self.query,
                "__meta_puppetdb_certname": certname,
                "__meta_puppetdb_resource": r.get("resource", ""),
                "__meta_puppetdb_type": r.get("type", ""),
                "__meta_puppetdb_title": r.get("title", ""),
                "__meta_puppetdb_exported":
                    "true" if r.get("exported") else "false",
                "__meta_puppetdb_file": r.get("file", "") or "",
                "__meta_puppetdb_environment": r.get("environment", ""),
            }
            if r.get("tags"):
                labels["__meta_puppetdb_tags"] = _wrap_list(r["tags"])
            if self.include_parameters:
                self._flatten_params(
                    "__meta_puppetdb_parameter_", r.get("parameters") or {}, labels
                )
            groups.append(TargetGroup([f"{certname}:{self.port}"], labels))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = self._groups()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


class EurekaDiscovery:
    """eureka_sd_configs provider (discovery/eureka/eureka.go:36-60,
    160-230): GET ``{server}/apps`` (XML), one target per application
    instance at ``hostname:port`` (80 when the port element is absent)
    with the ``__meta_eureka_app_*`` labels, instance metadata as
    ``..._metadata_<k>``, and datacenterinfo name + metadata."""

    def __init__(
        self,
        server: str,
        refresh_interval_ms: int = 30_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
    ):
        self.server = server.rstrip("/")
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []

    def _http_get(self, url: str) -> bytes:
        req = urllib.request.Request(url, headers={"Accept": "application/xml"})
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _groups(self) -> list[TargetGroup]:
        import xml.etree.ElementTree as ET

        root = ET.fromstring(self._fetch(f"{self.server}/apps"))

        def text(el, tag: str) -> str:
            found = el.find(tag)
            return (found.text or "") if found is not None else ""

        groups: list[TargetGroup] = []
        for app in root.iter("application"):
            app_name = text(app, "name")
            for inst in app.findall("instance"):
                host = text(inst, "hostName")
                port_el = inst.find("port")
                port = (port_el.text or "80") if port_el is not None else "80"
                labels = {
                    "__meta_eureka_app_name": app_name,
                    "__meta_eureka_app_instance_id": text(inst, "instanceId"),
                    "__meta_eureka_app_instance_hostname": host,
                    "__meta_eureka_app_instance_homepage_url":
                        text(inst, "homePageUrl"),
                    "__meta_eureka_app_instance_statuspage_url":
                        text(inst, "statusPageUrl"),
                    "__meta_eureka_app_instance_healthcheck_url":
                        text(inst, "healthCheckUrl"),
                    "__meta_eureka_app_instance_ip_addr": text(inst, "ipAddr"),
                    "__meta_eureka_app_instance_vip_address":
                        text(inst, "vipAddress"),
                    "__meta_eureka_app_instance_secure_vip_address":
                        text(inst, "secureVipAddress"),
                    "__meta_eureka_app_instance_status": text(inst, "status"),
                    "__meta_eureka_app_instance_country_id":
                        text(inst, "countryId"),
                }
                if port_el is not None:
                    labels["__meta_eureka_app_instance_port"] = port
                    labels["__meta_eureka_app_instance_port_enabled"] = (
                        port_el.get("enabled", "true")
                    )
                sport = inst.find("securePort")
                if sport is not None:
                    labels["__meta_eureka_app_instance_secure_port"] = (
                        sport.text or ""
                    )
                    labels["__meta_eureka_app_instance_secure_port_enabled"] = (
                        sport.get("enabled", "false")
                    )
                dci = inst.find("dataCenterInfo")
                if dci is not None:
                    labels["__meta_eureka_app_instance_datacenterinfo_name"] = (
                        text(dci, "name")
                    )
                    dmeta = dci.find("metadata")
                    if dmeta is not None:
                        for m in dmeta:
                            labels[
                                "__meta_eureka_app_instance_datacenterinfo_metadata_"
                                + _sanitize_label_name(m.tag)
                            ] = m.text or ""
                meta = inst.find("metadata")
                if meta is not None:
                    for m in meta:
                        labels[
                            "__meta_eureka_app_instance_metadata_"
                            + _sanitize_label_name(m.tag)
                        ] = m.text or ""
                groups.append(TargetGroup([f"{host}:{port}"], labels))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = self._groups()
            self._last_good = out
        except Exception:
            out = self._last_good
        return out


_AZURE_RG_RE = re.compile(
    r"/subscriptions/[^/]+/resourceGroups/([^/]+)/", re.IGNORECASE
)


class AzureDiscovery:
    """azure_sd_configs provider (discovery/azure/azure.go:53-66,527-610):
    one target per VM (standalone and scale-set) at ``private_ip:port``
    with the reference's ``__meta_azure_*`` labels (subscription/tenant/
    machine id+name+computer_name+os_type+location+resource_group+size,
    scale_set when applicable, tags, private/public IP).

    Plain REST list-on-refresh against the ARM API: list VMs and scale
    sets subscription- or resource-group-wide, then resolve each VM's
    primary NIC for addresses (the reference caches NIC lookups; here a
    per-refresh memo de-dupes them).  OAuth2 client-credentials token by
    default, or inject ``token_fn``/``fetch_fn``."""

    def __init__(
        self,
        subscription_id: str,
        tenant_id: str = "",
        client_id: str = "",
        client_secret: str = "",
        port: int = 80,
        resource_group: str = "",
        endpoint: str = "https://management.azure.com",
        authentication_endpoint: str = "https://login.microsoftonline.com",
        api_version: str = "2023-03-01",
        refresh_interval_ms: int = 300_000,
        timeout_s: float = 10.0,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
        token_fn: Optional[Callable[[], str]] = None,
    ):
        self.subscription_id = subscription_id
        self.tenant_id = tenant_id
        self.client_id = client_id
        self.client_secret = client_secret
        self.port = port
        self.resource_group = resource_group
        self.endpoint = endpoint.rstrip("/")
        self.auth_endpoint = authentication_endpoint.rstrip("/")
        self.api_version = api_version
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self._fetch = fetch_fn or self._http_get
        self._token_fn = token_fn
        self._last_good: list[TargetGroup] = []

    def _client_credentials_token(self) -> str:
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "scope": f"{self.endpoint}/.default",
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.auth_endpoint}/{self.tenant_id}/oauth2/v2.0/token",
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read())["access_token"]

    def _http_get(self, url: str) -> bytes:
        token = (
            self._token_fn() if self._token_fn else self._client_credentials_token()
        )
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {token}"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _list(self, path: str) -> list:
        """GET an ARM collection, following ``nextLink`` pagination."""
        url = f"{self.endpoint}{path}?api-version={self.api_version}"
        out: list = []
        while url:
            doc = json.loads(self._fetch(url))
            out += doc.get("value") or []
            url = doc.get("nextLink", "")
        return out

    def _scope(self) -> str:
        base = f"/subscriptions/{self.subscription_id}"
        if self.resource_group:
            base += f"/resourceGroups/{self.resource_group}"
        return base

    def _nic(self, nic_id: str, memo: dict) -> dict:
        if nic_id not in memo:
            memo[nic_id] = json.loads(
                self._fetch(
                    f"{self.endpoint}{nic_id}?api-version={self.api_version}"
                )
            )
        return memo[nic_id]

    def _vm_group(self, vm: dict, memo: dict, scale_set: str = "") -> Optional[TargetGroup]:
        props = vm.get("properties") or {}
        os_profile = props.get("osProfile") or {}
        storage = props.get("storageProfile") or {}
        hw = props.get("hardwareProfile") or {}
        labels = {
            "__meta_azure_subscription_id": self.subscription_id,
            "__meta_azure_tenant_id": self.tenant_id,
            "__meta_azure_machine_id": vm.get("id", ""),
            "__meta_azure_machine_name": vm.get("name", ""),
            "__meta_azure_machine_computer_name":
                os_profile.get("computerName", ""),
            "__meta_azure_machine_os_type":
                (storage.get("osDisk") or {}).get("osType", ""),
            "__meta_azure_machine_location": vm.get("location", ""),
            "__meta_azure_machine_resource_group":
                (_AZURE_RG_RE.search(vm.get("id", "") + "/") or [None, ""])[1],
            "__meta_azure_machine_size": hw.get("vmSize", ""),
        }
        if scale_set:
            labels["__meta_azure_machine_scale_set"] = scale_set
        for k, v in (vm.get("tags") or {}).items():
            labels["__meta_azure_machine_tag_" + _sanitize_label_name(k)] = v
        # address resolution via the network provider (azure.go:556-607):
        # first private IP of the primary NIC's ipConfigurations wins
        address = ""
        for nic_ref in ((props.get("networkProfile") or {}).get(
            "networkInterfaces"
        ) or []):
            nic_id = nic_ref.get("id", "")
            if not nic_id:
                continue
            nic = self._nic(nic_id, memo)
            nprops = nic.get("properties") or {}
            primary = nprops.get("primary")
            if primary is False:
                continue
            for ipcfg in nprops.get("ipConfigurations") or []:
                ipprops = ipcfg.get("properties") or {}
                pub = (ipprops.get("publicIPAddress") or {}).get(
                    "properties", {}
                ).get("ipAddress")
                if pub:
                    labels["__meta_azure_machine_public_ip"] = pub
                priv = ipprops.get("privateIPAddress")
                if priv:
                    labels["__meta_azure_machine_private_ip"] = priv
                    address = f"{priv}:{self.port}"
                    break
            if address:
                break
        if not address:
            return None  # machines with no private IP are not targets
        return TargetGroup([address], labels)

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            memo: dict = {}
            groups: list[TargetGroup] = []
            scope = self._scope()
            for vm in self._list(
                f"{scope}/providers/Microsoft.Compute/virtualMachines"
            ):
                g = self._vm_group(vm, memo)
                if g is not None:
                    groups.append(g)
            for ss in self._list(
                f"{scope}/providers/Microsoft.Compute/virtualMachineScaleSets"
            ):
                ss_id, ss_name = ss.get("id", ""), ss.get("name", "")
                if not ss_id:
                    continue
                for vm in self._list(f"{ss_id}/virtualMachines"):
                    g = self._vm_group(vm, memo, scale_set=ss_name)
                    if g is not None:
                        groups.append(g)
            self._last_good = groups
        except Exception:
            groups = self._last_good
        return groups


# ---------------------------------------------------------------------------
# Kubernetes SD (discovery/kubernetes/) — the API server speaks plain
# HTTPS+JSON with bearer-token auth, so list-on-refresh needs no SDK.
# The reference uses watch/informers for incremental updates; here each
# refresh LISTs the role's objects (documented simplification — the
# DiscoveryManager's interval gating bounds API-server load).


class KubernetesDiscovery:
    """kubernetes_sd_configs provider for the ``pod`` and ``endpoints``
    roles, emitting the reference's core ``__meta_kubernetes_*`` labels
    (discovery/kubernetes/pod.go:261-300, endpoints.go:338-380):
    per-container-port pod targets (podIP:port; port-less containers
    yield a bare podIP target) and per-subset endpoint address×port
    targets.  Namespaces scope the list; label/annotation maps become
    ``_label_<k>`` / ``_annotation_<k>`` (+ ``...present``) labels."""

    def __init__(
        self,
        api_server: str,
        role: str = "pod",
        namespaces: Optional[list[str]] = None,
        bearer_token: str = "",
        refresh_interval_ms: int = 30_000,
        timeout_s: float = 10.0,
        insecure_skip_verify: bool = False,
        fetch_fn: Optional[Callable[[str], bytes]] = None,
        watch: bool = False,
        watch_timeout_s: float = 1.0,
    ):
        if role not in (
            "pod", "endpoints", "node", "service", "endpointslice", "ingress"
        ):
            raise ValueError(f"kubernetes_sd role {role!r} not supported")
        self.base = api_server.rstrip("/")
        self.role = role
        self.namespaces = list(namespaces or [])
        self.bearer_token = bearer_token
        self.refresh_interval_ms = refresh_interval_ms
        self.timeout_s = timeout_s
        self.insecure_skip_verify = insecure_skip_verify
        self._fetch = fetch_fn or self._http_get
        self._last_good: list[TargetGroup] = []
        # watch/informer mode (discovery/kubernetes/kubernetes.go uses
        # cache.NewSharedInformer): first refresh LISTs and records the
        # collection resourceVersion; later refreshes send an
        # incremental WATCH from that version and apply
        # ADDED/MODIFIED/DELETED deltas to a local object store — no
        # full relists, which at large cluster scale is the difference
        # between O(changes) and O(cluster) per refresh.
        self.watch = watch
        self.watch_timeout_s = watch_timeout_s
        self._stores: dict[str, dict] = {}

    def _http_get(self, url: str) -> bytes:
        import ssl

        headers = {"Accept": "application/json"}
        if self.bearer_token:
            headers["Authorization"] = f"Bearer {self.bearer_token}"
        ctx = None
        if url.startswith("https") and self.insecure_skip_verify:
            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(
            req, timeout=self.timeout_s, context=ctx
        ) as resp:
            return resp.read()

    def _paths(self, resource: str, api_prefix: str) -> list[str]:
        return (
            [
                f"{api_prefix}/namespaces/{ns}/{resource}"
                for ns in self.namespaces
            ]
            if self.namespaces
            else [f"{api_prefix}/{resource}"]
        )

    def _list(self, resource: str, api_prefix: str = "/api/v1") -> list[dict]:
        items: list[dict] = []
        for p in self._paths(resource, api_prefix):
            if self.watch:
                items.extend(self._watch_items(p))
            else:
                doc = json.loads(self._fetch(self.base + p).decode())
                items.extend(doc.get("items") or [])
        return items

    @staticmethod
    def _obj_key(obj: dict) -> str:
        meta = obj.get("metadata") or {}
        return meta.get("uid") or (
            f'{meta.get("namespace", "")}/{meta.get("name", "")}'
        )

    def _watch_items(self, path: str) -> list[dict]:
        """Informer-style store for one collection path: LIST once to
        seed, then WATCH from the recorded resourceVersion and fold
        ADDED/MODIFIED/DELETED events in.  A watch error (e.g. 410 Gone
        after the version fell out of the server's history) drops the
        store so the next refresh relists — the informer's
        relist-on-expiry behavior."""
        store = self._stores.get(path)
        if store is None:
            doc = json.loads(self._fetch(self.base + path).decode())
            objects = {self._obj_key(o): o for o in doc.get("items") or []}
            store = {
                "rv": (doc.get("metadata") or {}).get("resourceVersion", ""),
                "objects": objects,
            }
            self._stores[path] = store
            return list(objects.values())
        q = urlencode(
            {
                "watch": "1",
                "allowWatchBookmarks": "true",
                "resourceVersion": store["rv"],
                "timeoutSeconds": max(int(self.watch_timeout_s), 0),
            }
        )
        try:
            body = self._fetch(f"{self.base}{path}?{q}").decode()
        except Exception:
            # transport error: serve the store unchanged; next refresh
            # retries the watch from the same version
            return list(store["objects"].values())
        for line in body.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            etype = ev.get("type", "")
            obj = ev.get("object") or {}
            if etype == "ERROR":
                # expired/invalid version (410 Gone) → drop the store
                # and relist right away (kubernetes.go informer
                # ListerWatcher relist-on-expiry)
                self._stores.pop(path, None)
                return self._watch_items(path)
            rv = (obj.get("metadata") or {}).get("resourceVersion", "")
            if rv:
                store["rv"] = rv
            if etype == "BOOKMARK":
                continue
            key = self._obj_key(obj)
            if etype == "DELETED":
                store["objects"].pop(key, None)
            elif etype in ("ADDED", "MODIFIED"):
                store["objects"][key] = obj
        return list(store["objects"].values())

    @staticmethod
    def _obj_labels(prefix: str, obj: dict) -> dict:
        meta = obj.get("metadata") or {}
        out = {
            f"__meta_kubernetes_namespace": meta.get("namespace", ""),
        }
        for kind in ("label", "annotation"):
            src = meta.get(kind + "s") or {}
            for k, v in src.items():
                name = _sanitize_label_name(k)
                out[f"__meta_kubernetes_{prefix}_{kind}_{name}"] = str(v)
                out[f"__meta_kubernetes_{prefix}_{kind}present_{name}"] = "true"
        return out

    def _pod_groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        for pod in self._list("pods"):
            meta = pod.get("metadata") or {}
            spec = pod.get("spec") or {}
            status = pod.get("status") or {}
            pod_ip = status.get("podIP") or ""
            if not pod_ip:
                continue
            ready = "false"
            for c in status.get("conditions") or []:
                if c.get("type") == "Ready":
                    ready = str(c.get("status", "")).lower() == "true"
                    ready = "true" if ready else "false"
            base = {
                **self._obj_labels("pod", pod),
                "__meta_kubernetes_pod_name": meta.get("name", ""),
                "__meta_kubernetes_pod_ip": pod_ip,
                "__meta_kubernetes_pod_ready": ready,
                "__meta_kubernetes_pod_phase": status.get("phase", ""),
                "__meta_kubernetes_pod_node_name": spec.get("nodeName", ""),
                "__meta_kubernetes_pod_host_ip": status.get("hostIP", ""),
                "__meta_kubernetes_pod_uid": meta.get("uid", ""),
            }
            containers = (spec.get("containers") or []) + (
                spec.get("initContainers") or []
            )
            emitted = False
            for c in containers:
                is_init = c in (spec.get("initContainers") or [])
                for port in c.get("ports") or []:
                    num = port.get("containerPort")
                    addr = (
                        f"[{pod_ip}]:{num}" if ":" in pod_ip
                        else f"{pod_ip}:{num}"
                    )
                    groups.append(TargetGroup([addr], {
                        **base,
                        "__meta_kubernetes_pod_container_name": c.get("name", ""),
                        "__meta_kubernetes_pod_container_init":
                            "true" if is_init else "false",
                        "__meta_kubernetes_pod_container_port_name":
                            port.get("name", ""),
                        "__meta_kubernetes_pod_container_port_number": str(num),
                        "__meta_kubernetes_pod_container_port_protocol":
                            port.get("protocol", ""),
                    }))
                    emitted = True
            if not emitted:  # port-less pod: one bare-IP target (pod.go)
                groups.append(TargetGroup([pod_ip], dict(base)))
        return groups

    def _endpoints_groups(self) -> list[TargetGroup]:
        groups: list[TargetGroup] = []
        for ep in self._list("endpoints"):
            meta = ep.get("metadata") or {}
            base = {
                **self._obj_labels("endpoints", ep),
                "__meta_kubernetes_endpoints_name": meta.get("name", ""),
            }
            for subset in ep.get("subsets") or []:
                for ready, key in (("true", "addresses"),
                                   ("false", "notReadyAddresses")):
                    for a in subset.get(key) or []:
                        ip = a.get("ip", "")
                        tref = a.get("targetRef") or {}
                        for port in subset.get("ports") or []:
                            num = port.get("port")
                            addr = (
                                f"[{ip}]:{num}" if ":" in ip
                                else f"{ip}:{num}"
                            )
                            groups.append(TargetGroup([addr], {
                                **base,
                                "__meta_kubernetes_endpoint_ready": ready,
                                "__meta_kubernetes_endpoint_port_name":
                                    port.get("name", ""),
                                "__meta_kubernetes_endpoint_port_protocol":
                                    port.get("protocol", ""),
                                "__meta_kubernetes_endpoint_address_target_kind":
                                    tref.get("kind", ""),
                                "__meta_kubernetes_endpoint_address_target_name":
                                    tref.get("name", ""),
                                "__meta_kubernetes_endpoint_node_name":
                                    a.get("nodeName", ""),
                            }))
        return groups

    def _node_groups(self) -> list[TargetGroup]:
        """node role (node.go:210-260): address preference InternalIP >
        ExternalIP > LegacyHostIP > Hostname, port = Kubelet (10250)."""
        groups: list[TargetGroup] = []
        order = ["InternalIP", "ExternalIP", "LegacyHostIP", "Hostname"]
        for node in self._list("nodes"):
            meta = node.get("metadata") or {}
            status = node.get("status") or {}
            by_type: dict[str, str] = {}
            labels_extra: dict[str, str] = {}
            for a in status.get("addresses") or []:
                t, addr = a.get("type", ""), a.get("address", "")
                by_type.setdefault(t, addr)
                labels_extra[
                    "__meta_kubernetes_node_address_"
                    + _sanitize_label_name(t)
                ] = addr
            host = next(
                (by_type[t] for t in order if t in by_type), None
            )
            if host is None:
                continue
            addr = f"[{host}]:10250" if ":" in host else f"{host}:10250"
            groups.append(TargetGroup([addr], {
                **self._obj_labels("node", node),
                **labels_extra,
                "__meta_kubernetes_node_name": meta.get("name", ""),
                "__meta_kubernetes_node_provider_id":
                    (node.get("spec") or {}).get("providerID", ""),
            }))
        return groups

    def _service_groups(self) -> list[TargetGroup]:
        """service role (service.go:190-235): one target per service
        port at <name>.<ns>.svc:<port>; ExternalName services target the
        external name instead."""
        groups: list[TargetGroup] = []
        for svc in self._list("services"):
            meta = svc.get("metadata") or {}
            spec = svc.get("spec") or {}
            name, ns = meta.get("name", ""), meta.get("namespace", "")
            external = (
                spec.get("externalName", "")
                if spec.get("type") == "ExternalName"
                else ""
            )
            host = external or f"{name}.{ns}.svc"
            base = {
                **self._obj_labels("service", svc),
                "__meta_kubernetes_service_name": name,
                "__meta_kubernetes_service_cluster_ip":
                    "" if external else spec.get("clusterIP", ""),
                "__meta_kubernetes_service_type": spec.get("type", ""),
                "__meta_kubernetes_service_external_name": external,
            }
            for port in spec.get("ports") or []:
                num = port.get("port")
                groups.append(TargetGroup([f"{host}:{num}"], {
                    **base,
                    "__meta_kubernetes_service_port_name":
                        port.get("name", ""),
                    "__meta_kubernetes_service_port_number": str(num),
                    "__meta_kubernetes_service_port_protocol":
                        port.get("protocol", ""),
                }))
        return groups

    def _endpointslice_groups(self) -> list[TargetGroup]:
        """endpointslice role (endpointslice.go:291-350): the modern
        discovery.k8s.io/v1 shape — per-endpoint addresses x slice
        ports, with conditions and targetRef."""
        groups: list[TargetGroup] = []
        for eps in self._list(
            "endpointslices", api_prefix="/apis/discovery.k8s.io/v1"
        ):
            meta = eps.get("metadata") or {}
            base = {
                **self._obj_labels("endpointslice", eps),
                "__meta_kubernetes_endpointslice_name": meta.get("name", ""),
                "__meta_kubernetes_endpointslice_address_type":
                    eps.get("addressType", ""),
            }
            for ep in eps.get("endpoints") or []:
                conds = ep.get("conditions") or {}
                ready = str(conds.get("ready", True)).lower()
                tref = ep.get("targetRef") or {}
                for addr in ep.get("addresses") or []:
                    for port in eps.get("ports") or []:
                        num = port.get("port")
                        t = (
                            f"[{addr}]:{num}" if ":" in addr
                            else f"{addr}:{num}"
                        )
                        groups.append(TargetGroup([t], {
                            **base,
                            "__meta_kubernetes_endpointslice_endpoint_conditions_ready":
                                ready,
                            "__meta_kubernetes_endpointslice_port_name":
                                port.get("name", ""),
                            "__meta_kubernetes_endpointslice_port_protocol":
                                port.get("protocol", ""),
                            "__meta_kubernetes_endpointslice_address_target_kind":
                                tref.get("kind", ""),
                            "__meta_kubernetes_endpointslice_address_target_name":
                                tref.get("name", ""),
                        }))
        return groups

    def _ingress_groups(self) -> list[TargetGroup]:
        """ingress role (ingress.go:181-230): one target per rule host x
        path; scheme https when the host appears in a TLS block."""
        groups: list[TargetGroup] = []
        for ing in self._list(
            "ingresses", api_prefix="/apis/networking.k8s.io/v1"
        ):
            meta = ing.get("metadata") or {}
            spec = ing.get("spec") or {}
            tls_hosts = {
                h for t in spec.get("tls") or [] for h in t.get("hosts") or []
            }
            base = {
                **self._obj_labels("ingress", ing),
                "__meta_kubernetes_ingress_name": meta.get("name", ""),
                "__meta_kubernetes_ingress_class_name":
                    spec.get("ingressClassName", ""),
            }
            for rule in spec.get("rules") or []:
                host = rule.get("host", "")
                if not host:
                    continue
                paths = (
                    (rule.get("http") or {}).get("paths") or [{"path": "/"}]
                )
                for p in paths:
                    groups.append(TargetGroup([host], {
                        **base,
                        "__meta_kubernetes_ingress_host": host,
                        "__meta_kubernetes_ingress_path": p.get("path", "/"),
                        "__meta_kubernetes_ingress_scheme":
                            "https" if host in tls_hosts else "http",
                    }))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        try:
            out = {
                "pod": self._pod_groups,
                "endpoints": self._endpoints_groups,
                "node": self._node_groups,
                "service": self._service_groups,
                "endpointslice": self._endpointslice_groups,
                "ingress": self._ingress_groups,
            }[self.role]()
            self._last_good = out
        except Exception:
            out = self._last_good  # keep previous set on failure
        return out


# ---------------------------------------------------------------------------
# DNS SD (discovery/dns/dns.go) — pure-stdlib UDP resolver, no deps.

_DNS_QTYPES = {"A": 1, "NS": 2, "CNAME": 5, "MX": 15, "AAAA": 28, "SRV": 33}


def _dns_encode_query(qname: str, qtype: int, txid: int = 0x5350) -> bytes:
    import struct as _s

    out = _s.pack(">HHHHHH", txid, 0x0100, 1, 0, 0, 0)  # RD, 1 question
    for part in qname.rstrip(".").split("."):
        raw = part.encode()
        out += bytes([len(raw)]) + raw
    return out + b"\x00" + _s.pack(">HH", qtype, 1)  # class IN


def _dns_read_name(data: bytes, pos: int) -> tuple[str, int]:
    """Read a (possibly compression-pointer'd) domain name."""
    parts: list[str] = []
    jumped = False
    end = pos
    hops = 0
    while True:
        ln = data[pos]
        if ln & 0xC0 == 0xC0:  # compression pointer
            ptr = ((ln & 0x3F) << 8) | data[pos + 1]
            if not jumped:
                end = pos + 2
            pos = ptr
            jumped = True
            hops += 1
            if hops > 64:
                raise ValueError("DNS compression loop")
            continue
        if ln == 0:
            if not jumped:
                end = pos + 1
            return ".".join(parts) + ".", end
        parts.append(data[pos + 1:pos + 1 + ln].decode("ascii", "replace"))
        pos += 1 + ln


def _dns_parse_answers(data: bytes) -> list[dict]:
    """Answer records: {type, target/addr fields} — SRV/A/AAAA/MX/NS/CNAME."""
    import socket as _sock
    import struct as _s

    _txid, _flags, qd, an, _ns, _ar = _s.unpack(">HHHHHH", data[:12])
    pos = 12
    for _ in range(qd):  # skip questions
        _name, pos = _dns_read_name(data, pos)
        pos += 4
    out: list[dict] = []
    for _ in range(an):
        _name, pos = _dns_read_name(data, pos)
        rtype, _rclass, _ttl, rdlen = _s.unpack(">HHIH", data[pos:pos + 10])
        rpos = pos + 10
        pos = rpos + rdlen
        if rtype == 33:  # SRV: prio, weight, port, target
            _prio, _w, port = _s.unpack(">HHH", data[rpos:rpos + 6])
            target, _ = _dns_read_name(data, rpos + 6)
            out.append({"type": "SRV", "target": target, "port": port})
        elif rtype == 1:
            out.append(
                {"type": "A", "addr": _sock.inet_ntop(_sock.AF_INET,
                                                      data[rpos:rpos + 4])}
            )
        elif rtype == 28:
            out.append(
                {"type": "AAAA", "addr": _sock.inet_ntop(_sock.AF_INET6,
                                                         data[rpos:rpos + 16])}
            )
        elif rtype == 15:  # MX: preference, exchange
            target, _ = _dns_read_name(data, rpos + 2)
            out.append({"type": "MX", "target": target})
        elif rtype == 2:  # NS
            target, _ = _dns_read_name(data, rpos)
            out.append({"type": "NS", "target": target})
        elif rtype == 5:  # CNAME — legal in A responses; skipped (dns.go)
            out.append({"type": "CNAME"})
    return out


def _dns_resolver_addr() -> str:
    try:
        with open("/etc/resolv.conf") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2 and parts[0] == "nameserver":
                    return parts[1]
    except OSError:
        pass
    return "127.0.0.1"


def _dns_query_udp(qname: str, qtype: int, timeout_s: float = 5.0) -> bytes:
    import socket as _sock

    server = _dns_resolver_addr()
    fam = _sock.AF_INET6 if ":" in server else _sock.AF_INET
    with _sock.socket(fam, _sock.SOCK_DGRAM) as s:
        s.settimeout(timeout_s)
        s.sendto(_dns_encode_query(qname, qtype), (server, 53))
        return s.recv(65535)


class DNSDiscovery:
    """dns_sd_configs provider (discovery/dns/dns.go): SRV targets carry
    their own port; A/AAAA/MX/NS need the configured ``port``.  Each
    record becomes one TargetGroup carrying the reference's
    ``__meta_dns_*`` labels; a query failure keeps the last good set."""

    def __init__(
        self,
        names: list[str],
        qtype: str = "SRV",
        port: int = 0,
        refresh_interval_ms: int = 30_000,
        query_fn=None,  # (qname, qtype_code) -> wire bytes, for tests
    ):
        self.names = list(names)
        self.qtype = qtype.upper()
        if self.qtype not in _DNS_QTYPES:
            raise ValueError(f"unsupported DNS SD record type {qtype!r}")
        if self.qtype not in ("SRV",) and not port:
            raise ValueError("dns_sd_configs: 'port' required for non-SRV")
        self.port = port
        self.refresh_interval_ms = refresh_interval_ms
        self._query = query_fn or _dns_query_udp
        self._last_good: dict[str, list[TargetGroup]] = {}

    def _groups_for(self, name: str) -> list[TargetGroup]:
        records = _dns_parse_answers(self._query(name, _DNS_QTYPES[self.qtype]))
        groups: list[TargetGroup] = []
        for rec in records:
            meta = {
                "__meta_dns_name": name,
                "__meta_dns_srv_record_target": "",
                "__meta_dns_srv_record_port": "",
                "__meta_dns_mx_record_target": "",
                "__meta_dns_ns_record_target": "",
            }
            if rec["type"] == "SRV":
                meta["__meta_dns_srv_record_target"] = rec["target"]
                meta["__meta_dns_srv_record_port"] = str(rec["port"])
                host = rec["target"].rstrip(".")
                addr = f"{host}:{rec['port']}"
            elif rec["type"] in ("A", "AAAA"):
                a = rec["addr"]
                addr = f"[{a}]:{self.port}" if ":" in a else f"{a}:{self.port}"
            elif rec["type"] == "MX":
                meta["__meta_dns_mx_record_target"] = rec["target"]
                addr = f"{rec['target'].rstrip('.')}:{self.port}"
            elif rec["type"] == "NS":
                meta["__meta_dns_ns_record_target"] = rec["target"]
                addr = f"{rec['target'].rstrip('.')}:{self.port}"
            else:  # CNAME riding along in an A response
                continue
            groups.append(TargetGroup([addr], meta))
        return groups

    def refresh(self, now_ms: Optional[int] = None) -> list[TargetGroup]:
        out: list[TargetGroup] = []
        for name in self.names:
            try:
                groups = self._groups_for(name)
                self._last_good[name] = groups
            except Exception:
                groups = self._last_good.get(name, [])
            out.extend(groups)
        return out


# ---------------------------------------------------------------------------
def discovered_labels(jobcfg, grp: TargetGroup, addr: str) -> dict:
    """The PRE-relabel label set the reference calls discovered labels
    (scrape/target.go DiscoveredLabels): __address__/__scheme__/
    __metrics_path__/__param_* plus the target group's labels, scoped
    per group — not a job-wide merge."""
    lbls = {
        "__address__": addr,
        "__scheme__": jobcfg.scheme,
        "__metrics_path__": jobcfg.metrics_path,
    }
    for k, v in (jobcfg.params or {}).items():
        v0 = v[0] if isinstance(v, list) and v else v
        lbls[f"__param_{k}"] = str(v0)
    lbls.update(grp.labels)
    lbls.setdefault("job", jobcfg.job_name)
    return lbls


def sd_check(jobcfg, groups: list[TargetGroup]) -> list[dict]:
    """cmd/promtool sd.go CheckSD result rows: per discovered target,
    the pre-relabel label set and the post-relabel outcome (empty labels
    = dropped by relabeling)."""
    out: list[dict] = []
    for grp in groups:
        for addr in grp.targets:
            pre = discovered_labels(jobcfg, grp, addr)
            res = process_labels(pre, jobcfg.relabel_configs)
            out.append(
                {
                    "discoveredLabels": dict(sorted(pre.items())),
                    "labels": dict(sorted(res.items())) if res else {},
                }
            )
    return out


def populate_targets(
    jobcfg, groups: list[TargetGroup], dropped: list | None = None
) -> list[ScrapeTarget]:
    """scrape/target.go PopulateLabels: assemble the relabel-visible
    label set per address, run target relabeling, then re-derive the
    scrape URL from the POST-relabel ``__address__`` / ``__scheme__`` /
    ``__metrics_path__`` / ``__param_*`` (so a config that rewrites
    ``__address__`` — the blackbox-exporter pattern — scrapes the
    rewritten endpoint), default ``instance``, and strip meta labels.

    ``dropped`` (when given) collects the PRE-relabel label sets of
    targets relabeling dropped, capped per job by
    ``keep_dropped_targets`` (0 = unlimited; scrape/manager.go
    droppedTargets for /api/v1/targets?state=dropped)."""
    out: list[ScrapeTarget] = []
    keep_cap = getattr(jobcfg, "keep_dropped_targets", 0)
    job_dropped = 0
    for grp in groups:
        for addr in grp.targets:
            lbls = discovered_labels(jobcfg, grp, addr)
            res = process_labels(lbls, jobcfg.relabel_configs)
            if res is None:
                if dropped is not None and (
                    not keep_cap or job_dropped < keep_cap
                ):
                    dropped.append(
                        {"job": jobcfg.job_name, "discoveredLabels": lbls}
                    )
                    job_dropped += 1
                continue  # target dropped by relabeling
            scheme = res.get("__scheme__", jobcfg.scheme)
            path = res.get("__metrics_path__", jobcfg.metrics_path)
            address = res.get("__address__", addr)
            params = {
                k[len("__param_"):]: v
                for k, v in res.items()
                if k.startswith("__param_")
            }
            query = urlencode(sorted(params.items()))
            url = f"{scheme}://{address}{path}" + (f"?{query}" if query else "")
            final = {k: v for k, v in res.items() if not k.startswith("__")}
            final.setdefault("instance", address)
            out.append(
                ScrapeTarget(
                    url,
                    labels=final,
                    honor_labels=jobcfg.honor_labels,
                    honor_timestamps=getattr(
                        jobcfg, "honor_timestamps", True
                    ),
                    scrape_protocols=(
                        tuple(getattr(jobcfg, "scrape_protocols", ()) or ())
                        or (
                            PROTO_FIRST_SCRAPE_PROTOCOLS
                            if getattr(
                                jobcfg, "scrape_native_histograms", False
                            )
                            else DEFAULT_SCRAPE_PROTOCOLS
                        )
                    ),
                    auth_header=getattr(jobcfg, "auth_header", None),
                    enable_compression=getattr(
                        jobcfg, "enable_compression", True
                    ),
                    follow_redirects=getattr(
                        jobcfg, "follow_redirects", True
                    ),
                    fallback_scrape_protocol=getattr(
                        jobcfg, "fallback_scrape_protocol", ""
                    ),
                    track_timestamps_staleness=getattr(
                        jobcfg, "track_timestamps_staleness", False
                    ),
                    metric_name_validation_scheme=getattr(
                        jobcfg, "metric_name_validation_scheme", "utf8"
                    )
                    or "utf8",
                    metric_name_escaping_scheme=getattr(
                        jobcfg, "metric_name_escaping_scheme", ""
                    ),
                    scrape_failure_log_file=getattr(
                        jobcfg, "scrape_failure_log_file", ""
                    ),
                    interval_ms=getattr(jobcfg, "scrape_interval_ms", None),
                    timeout_s=(
                        jobcfg.scrape_timeout_ms / 1000.0
                        if getattr(jobcfg, "scrape_timeout_ms", None)
                        else None
                    ),
                    limits=_job_limits(jobcfg),
                )
            )
    return out


def _job_limits(jobcfg):
    """Per-job scrape protections → ScrapeLimits (None when all off)."""
    from prometheus_spark.sources.scrape import ScrapeLimits

    lims = ScrapeLimits(
        sample_limit=getattr(jobcfg, "sample_limit", 0),
        label_limit=getattr(jobcfg, "label_limit", 0),
        label_name_length_limit=getattr(jobcfg, "label_name_length_limit", 0),
        label_value_length_limit=getattr(
            jobcfg, "label_value_length_limit", 0
        ),
        body_size_limit=getattr(jobcfg, "body_size_limit", 0),
        target_limit=getattr(jobcfg, "target_limit", 0),
        native_histogram_bucket_limit=getattr(
            jobcfg, "native_histogram_bucket_limit", 0
        ),
        native_histogram_min_bucket_factor=getattr(
            jobcfg, "native_histogram_min_bucket_factor", 0.0
        ),
    )
    if not any(
        (
            lims.sample_limit, lims.label_limit,
            lims.label_name_length_limit, lims.label_value_length_limit,
            lims.body_size_limit, lims.target_limit,
            lims.native_histogram_bucket_limit,
            lims.native_histogram_min_bucket_factor,
        )
    ):
        return None
    return lims


class DiscoveryManager:
    """discovery/manager.go:64 — owns every job's providers, polls each
    on its own refresh interval, and reconciles the ScrapeManager's
    target list when the derived set changes."""

    def __init__(self):
        # job_name -> (jobcfg, [providers])
        self._jobs: dict[str, tuple] = {}
        # provider id -> (last_refresh_ms, cached groups)
        self._cache: dict[int, tuple[int, list[TargetGroup]]] = {}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def register(self, jobcfg, providers: list) -> None:
        self._jobs[jobcfg.job_name] = (jobcfg, list(providers))

    def _provider_groups(self, p, now_ms: int) -> list[TargetGroup]:
        interval = getattr(p, "refresh_interval_ms", 0)
        cached = self._cache.get(id(p))
        if cached is not None and interval > 0 and now_ms - cached[0] < interval:
            return cached[1]
        groups = p.refresh(now_ms)
        self._cache[id(p)] = (now_ms, groups)
        return groups

    def targets(self, now_ms: Optional[int] = None) -> list[ScrapeTarget]:
        now_ms = int(time.time() * 1000) if now_ms is None else now_ms
        out: list[ScrapeTarget] = []
        dropped: list[dict] = []
        for jobcfg, providers in self._jobs.values():
            groups: list[TargetGroup] = []
            for p in providers:
                groups.extend(self._provider_groups(p, now_ms))
            out.extend(populate_targets(jobcfg, groups, dropped=dropped))
        # relabel-dropped targets for /api/v1/targets?state=dropped
        # (scrape/manager.go droppedTargets + droppedTargetsCount)
        self.dropped_targets = dropped
        return out

    def apply(self, scrape_manager, now_ms: Optional[int] = None) -> bool:
        """Reconcile: swap the manager's target list if it changed.
        Returns True when an update was applied."""
        new = self.targets(now_ms)
        old = scrape_manager.targets
        if [(t.url, t.labels) for t in new] == [(t.url, t.labels) for t in old]:
            return False
        scrape_manager.targets = new
        return True

    def start(self, scrape_manager, poll_interval_s: float = 5.0):
        def loop():
            while not self._stop.wait(poll_interval_s):
                self.apply(scrape_manager)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self._thread

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
