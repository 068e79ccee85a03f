"""Pull-ingest scrape loop: HTTP GET targets on an interval → spool.

Reference: scrape/scrape.go (``scrapeLoop``: fetch, parse by
content-type, attach target labels, honor_labels conflict handling,
report series) and scrape/target.go.  SURVEY §2.7 maps the loop to a
periodic batch feeding the same spool → ``readStream`` pickup as the
push receivers — the scheduler is driver-side (it only moves scrape
bodies, never samples per query), and everything downstream is Spark.

Per-scrape report series mirror scrape.go:2040-2113: ``up``,
``scrape_duration_seconds``, ``scrape_samples_scraped``,
``scrape_samples_post_metric_relabeling``, ``scrape_series_added``.

Content-type negotiation picks the parser the reference would
(protobuf delimited / OpenMetrics / classic text).
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Optional

from prometheus_spark.sources.openmetrics import parse_openmetrics_text
from prometheus_spark.sources.promtext import parse_exposition_text
from prometheus_spark.sources.protobuf_scrape import parse_protobuf_scrape

PROTOBUF_CT = "application/vnd.google.protobuf"
OPENMETRICS_CT = "application/openmetrics-text"

#: config.go ScrapeProtocolsHeaders — protocol name → Accept media type
SCRAPE_PROTOCOL_HEADERS = {
    "PrometheusProto": (
        f"{PROTOBUF_CT};proto=io.prometheus.client.MetricFamily;"
        "encoding=delimited"
    ),
    "PrometheusText0.0.4": "text/plain;version=0.0.4",
    "PrometheusText1.0.0": "text/plain;version=1.0.0",
    "OpenMetricsText0.0.1": f"{OPENMETRICS_CT};version=0.0.1",
    "OpenMetricsText1.0.0": f"{OPENMETRICS_CT};version=1.0.0",
}

#: config.go DefaultScrapeProtocols (priority order)
DEFAULT_SCRAPE_PROTOCOLS = (
    "OpenMetricsText1.0.0",
    "OpenMetricsText0.0.1",
    "PrometheusText1.0.0",
    "PrometheusText0.0.4",
)

#: config.go DefaultProtoFirstScrapeProtocols — the default when
#: ``scrape_native_histograms`` is on (protobuf carries the native
#: histogram exposition)
PROTO_FIRST_SCRAPE_PROTOCOLS = ("PrometheusProto",) + DEFAULT_SCRAPE_PROTOCOLS


def accept_header(protocols, escaping_scheme: str = "") -> str:
    """scrape.go acceptHeader: q-weights descend from 0.<n+1>, with a
    trailing match-anything at the lowest weight.  A non-empty escaping
    scheme is negotiated via ``;escaping=`` — only on the newer text
    formats (scrape.go:711-714)."""
    vals = []
    weight = len(SCRAPE_PROTOCOL_HEADERS) + 1
    for sp in protocols:
        try:
            val = SCRAPE_PROTOCOL_HEADERS[sp]
        except KeyError:
            raise ValueError(f"unknown scrape protocol {sp!r}") from None
        if escaping_scheme and sp in ("PrometheusText1.0.0", "OpenMetricsText1.0.0"):
            val += f";escaping={escaping_scheme}"
        vals.append(f"{val};q=0.{weight}")
        weight -= 1
    vals.append(f"*/*;q=0.{weight}")
    return ",".join(vals)


_ESCAPING_SCHEMES = ("allow-utf-8", "underscores", "dots", "values")


def to_escaping_scheme(s: str, validation_scheme: str = "utf8") -> str:
    """config.go:1063 ToEscapingScheme: blank falls back on the
    validation scheme's natural escaping."""
    if not s:
        return "allow-utf-8" if validation_scheme != "legacy" else "underscores"
    if s not in _ESCAPING_SCHEMES:
        raise ValueError(f"invalid metric name escaping scheme {s!r}")
    return s


_LEGACY_METRIC_RE = re.compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")
_LEGACY_LABEL_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def labels_valid(labels: dict, scheme: str) -> bool:
    """labels.Labels.IsValid(scheme) (scrape.go:1737): legacy restricts
    metric/label names to the classic charset; utf8 only requires
    non-empty valid UTF-8 (Python strs always are)."""
    for k, v in labels.items():
        if not k:
            return False
        if scheme == "legacy":
            if k == "__name__":
                if not _LEGACY_METRIC_RE.match(v):
                    return False
            elif not _LEGACY_LABEL_RE.match(k):
                return False
    return True


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """follow_redirects: false — a 3xx response fails the scrape."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


class ScrapeLimitError(Exception):
    """A scrape-protection limit was exceeded — the whole scrape is
    discarded and the target reports up=0 (scrape.go errSampleLimit /
    errBodySizeLimit / verifyLabelLimits)."""


@dataclass
class ScrapeLimits:
    """Scrape protections (config.go ScrapeConfig, enforced in
    scrape.go): 0 means unlimited, matching the reference defaults."""

    sample_limit: int = 0  # post-metric-relabeling sample count
    label_limit: int = 0  # labels per sample
    label_name_length_limit: int = 0
    label_value_length_limit: int = 0
    body_size_limit: int = 0  # uncompressed response bytes
    target_limit: int = 0  # targets per job/pool
    # native-histogram protections (config.go:823, scrape/target.go:426):
    # bucket_limit 0 = unlimited; min_bucket_factor 0 = no schema cap
    native_histogram_bucket_limit: int = 0
    native_histogram_min_bucket_factor: float = 0.0


@dataclass
class ScrapeTarget:
    url: str
    # job/instance + extra target labels (target.go Labels()); instance
    # defaults to the host:port of the url like the reference
    labels: dict[str, str] = field(default_factory=dict)
    honor_labels: bool = False
    limits: Optional[ScrapeLimits] = None  # falls back to the manager's
    # honor_timestamps=False replaces every exposed timestamp with the
    # scrape time (scrape.go:1699 parsedTimestamp = nil)
    honor_timestamps: bool = True
    # Accept-header negotiation order (config.go scrape_protocols)
    scrape_protocols: tuple = DEFAULT_SCRAPE_PROTOCOLS
    # precomputed Authorization header value ("Basic …" / "Bearer …"),
    # from basic_auth / authorization / bearer_token scrape config
    auth_header: Optional[str] = None
    # per-job cadence/deadline (scrape_interval / scrape_timeout);
    # None falls back to the manager's defaults
    interval_ms: Optional[int] = None
    timeout_s: Optional[float] = None
    # HTTP client behavior (config.go HTTPClientConfig defaults)
    enable_compression: bool = True  # Accept-Encoding: gzip
    follow_redirects: bool = True
    # parser substitute for blank/invalid Content-Type responses
    # (config.go fallback_scrape_protocol); "" = fail the scrape
    fallback_scrape_protocol: str = ""
    # staleness markers also track samples carrying their OWN exposed
    # timestamps (config.go track_timestamps_staleness; default off —
    # explicitly-timestamped series are assumed push-like)
    track_timestamps_staleness: bool = False
    # metric/label name validation after relabeling (config.go:526
    # metric_name_validation_scheme: "utf8" default / "legacy")
    metric_name_validation_scheme: str = "utf8"
    # escaping mode requested through content negotiation (config.go:530
    # metric_name_escaping_scheme; "" = follow the validation scheme)
    metric_name_escaping_scheme: str = ""
    # file receiving one line per failed scrape (config.go:500
    # scrape_failure_log_file; "" = disabled)
    scrape_failure_log_file: str = ""

    def target_labels(self) -> dict[str, str]:
        out = dict(self.labels)
        if "instance" not in out:
            from urllib.parse import urlparse

            out["instance"] = urlparse(self.url).netloc
        return out


def _merge_labels(
    scraped: dict[str, str], target: dict[str, str], honor: bool
) -> dict[str, str]:
    """honor_labels semantics (scrape.go mutateSampleLabels): scraped
    labels win when honoring; otherwise a conflicting scraped label is
    preserved under ``exported_<name>``."""
    if honor:
        return {**target, **scraped}
    out = dict(scraped)
    for k, v in target.items():
        if k in out and out[k] != v and k != "__name__":
            out[f"exported_{k}"] = out[k]
        out[k] = v
    return out


def parse_scrape_body(
    body: bytes,
    content_type: str,
    default_ts_ms: int,
    fallback_protocol: str = "",
) -> tuple[list[tuple[dict, int, object]], dict, list]:
    """Dispatch on Content-Type exactly like the reference's parser
    selection (model/textparse New()).  Returns (samples, metadata,
    exemplars) — samples as (labels, t_ms, value, st_ms) where st_ms is
    the created/start timestamp (textparse ``p.StartTimestamp()``; None
    when the format doesn't expose one); exemplars as (series_labels,
    t_ms, exemplar_labels, value, ex_t_ms), populated by the OpenMetrics
    parser (the classic text format has no exemplar syntax).

    A blank Content-Type substitutes the job's configured
    ``fallback_scrape_protocol`` and FAILS the scrape when none is set
    (textparse interface.go extractMediaType: "non-compliant scrape
    target sending blank Content-Type and no fallback_scrape_protocol
    specified")."""
    if not content_type.strip():
        if not fallback_protocol:
            raise ValueError(
                "non-compliant scrape target sending blank Content-Type "
                "and no fallback_scrape_protocol specified for target"
            )
        content_type = SCRAPE_PROTOCOL_HEADERS.get(
            fallback_protocol, fallback_protocol
        )
    if content_type.startswith(PROTOBUF_CT):
        rows, meta = parse_protobuf_scrape(body, default_ts_ms)
        return list(rows), meta, []
    if content_type.startswith(OPENMETRICS_CT):
        samples, meta, exemplars, created = parse_openmetrics_text(
            body.decode(), default_ts_ms=default_ts_ms
        )
        return (
            [(l, t, v, _om_start_ts(l, created)) for l, t, v in samples],
            meta,
            list(exemplars),
        )
    from prometheus_spark.sources.promtext import parse_exposition_metadata

    text = body.decode()
    return (
        [(l, t, v, None) for l, t, v in parse_exposition_text(text, default_ts_ms)],
        parse_exposition_metadata(text),
        [],
    )


# suffixes whose ``<base>_created`` series applies to the sample
# (openmetricsparse.go CreatedTimestamp: counter _total, summary/histogram
# _count/_sum/_bucket and quantile/le-carrying series share the family's
# created series, which is exposed without le/quantile labels)
_CREATED_SUFFIXES = ("_total", "_count", "_sum", "_bucket", "")


def _om_start_ts(labels: dict, created: dict):
    """Per-sample start timestamp from the OpenMetrics ``*_created``
    map keyed by (family base name, sorted non-reserved label items)."""
    if not created:
        return None
    name = labels.get("__name__", "")
    key_labels = tuple(
        sorted(
            (k, v)
            for k, v in labels.items()
            if k not in ("__name__", "le", "quantile")
        )
    )
    for suf in _CREATED_SUFFIXES:
        if suf and not name.endswith(suf):
            continue
        base = name[: len(name) - len(suf)] if suf else name
        st = created.get((base, key_labels))
        if st is not None:
            return st
    return None


def _zero_value_like(v):
    """The synthetic zero sample to inject at the start timestamp:
    0.0 for float counters (head_append.go AppendSTZeroSample); an
    all-zero histogram sharing schema/zero-threshold/custom bounds for
    native histograms (AppendHistogramSTZeroSample appends the zero
    &Histogram{} with the series' layout so chunk appenders don't force
    a layout-change cut)."""
    if not isinstance(v, dict):
        return 0.0
    return {
        "schema": v.get("schema", 0),
        "zero_threshold": v.get("zero_threshold", 0.0),
        "zero_count": 0.0,
        "count": 0.0,
        "sum": 0.0,
        "pos_spans": [],
        "pos_buckets": [],
        "neg_spans": [],
        "neg_buckets": [],
        "custom_values": v.get("custom_values", []),
        "counter_reset_hint": 0,
    }


# suffixes each family TYPE may shed when binding series to a family
# (scrape.go:1911 isSeriesPartOfFamily — the gates are type-specific)
_FAMILY_SUFFIXES = {
    "counter": ("_total",),
    "histogram": ("_bucket", "_sum", "_count"),
    "gaugehistogram": ("_bucket", "_gsum", "_gcount"),
    "summary": ("_sum", "_count"),
}


def _family_meta(name: str, meta: dict) -> dict:
    """Metric-family metadata for a series name (scrape.go:1911
    isSeriesPartOfFamily): exact family match, or a suffix-stripped
    match gated on the FAMILY's type — `_total` only binds to counter
    families, `_bucket`/`_sum`/`_count` to histogram/summary families,
    never the reverse."""
    fam = meta.get(name)
    if fam:
        return fam
    for suf in ("_total", "_count", "_sum", "_bucket", "_gsum", "_gcount"):
        if name.endswith(suf):
            fam = meta.get(name[: -len(suf)])
            if fam and suf in _FAMILY_SUFFIXES.get(fam.get("type", ""), ()):
                return fam
    return {}


def _family_type(name: str, meta: dict) -> str:
    return _family_meta(name, meta).get("type", "")


def add_type_and_unit_labels(labels: dict, meta: dict, units: bool = True) -> dict:
    """type-and-unit-labels feature (schema/labels.go:105 AddToLabels
    via the parsers): attach ``__type__``/``__unit__`` from the family
    metadata — the type only when known (not ""/unknown), the unit only
    when non-empty; family metadata overrides user-exposed
    ``__type__``/``__unit__`` labels (promparse.go:256).  ``units=False``
    for the classic text format, which has no unit metadata in the
    reference (promparse.go:220 Unit() is nil — a lenient ``# UNIT``
    comment must not change series identity vs the reference)."""
    fam = _family_meta(labels.get("__name__", ""), meta)
    out = dict(labels)
    ftype = fam.get("type", "")
    if ftype and ftype != "unknown":
        out["__type__"] = ftype
    unit = fam.get("unit", "")
    if units and unit:
        out["__unit__"] = unit
    return out


def synthesize_st(cache: dict, key, name: str, t: int, v, meta: dict):
    """ST synthesis for one cumulative sample lacking an exposed start
    timestamp (scrape/st_synthesis.go stCache): the FIRST sample of a
    series establishes the reference — it is dropped and remembered as
    the starting value; later samples append ``value - starting`` with
    ``st`` = the reference time.  A reset re-anchors st at ``t-1`` with
    no further adjustment.  Only counters, histograms, and summary
    _count/_sum synthesize; everything else passes through.

    Returns (value, st, skip_append)."""
    mtype = _family_type(name, meta)
    if mtype in ("summary",):
        if not (name.endswith("_count") or name.endswith("_sum")):
            return v, None, False
    elif mtype not in ("counter", "histogram"):
        return v, None, False

    # COPY-ON-WRITE: entries are never mutated in place, always
    # replaced — the caller's rollback-on-failed-scrape is then a
    # shallow dict copy instead of a deepcopy of every series
    c = cache.get(key)
    is_hist = isinstance(v, dict)
    if c is not None and bool(c.get("hist")) != is_hist:
        # exposition type flipped (float↔native) — the cached reference
        # is meaningless; re-establish it from this sample
        c = None
    if is_hist:  # native histogram
        from prometheus_spark.model.histogram import from_row

        cur = from_row(v)
        if c is None:
            cache[key] = {"st": t, "prev": v, "hist": True, "starting": v}
            return v, t, True
        prev = from_row(c["prev"])
        if cur.detect_reset(prev):
            cache[key] = {**c, "prev": v, "starting": None, "st": t - 1}
            return v, t - 1, False
        st = c["st"]
        starting = c["starting"]
        cache[key] = {**c, "prev": v}
        if starting is None:
            return v, st, False
        adjusted = from_row(v)
        adjusted.add(from_row(starting), sub=True)
        adjusted.compact()
        return adjusted.to_row(), st, False
    # float counter / classic-histogram series
    if c is None:
        cache[key] = {"st": t, "prev": float(v), "starting": float(v)}
        return v, t, True
    st, starting = c["st"], c["starting"]
    if float(v) < c["prev"]:
        starting = 0.0
        st = t - 1  # reset happened somewhere in (prev_t, t]
    cache[key] = {**c, "prev": float(v), "starting": starting, "st": st}
    return float(v) - starting, st, False


def maybe_st_zero(labels: dict, t: int, v, st, st_seen: dict):
    """The ST zero-ingestion decision for one sample (scrape.go:1752 +
    head_append.go:511 AppendSTZeroSample): return the synthetic zero
    row ``(labels, st, zero, st)`` to append BEFORE the real sample, or
    None when no injection applies — st missing, st >= t
    (ErrSTNewerThanSample), or the same st already ingested for the
    series (the head's OOO check; counters share their ST across
    scrapes).  Mutates ``st_seen`` (series key → last ingested st)."""
    if st is None or st >= t:
        return None
    key = tuple(sorted(labels.items()))
    if st_seen.get(key) == st:
        return None
    st_seen[key] = st
    return (labels, st, _zero_value_like(v), st)


class ScrapeManager:
    """Periodic scraper appending to a JSON-lines spool directory shared
    with the push receivers (one atomic file per scrape — ``readStream``
    never sees partial bodies)."""

    def __init__(
        self,
        spool_dir: str,
        targets: list[ScrapeTarget],
        metric_relabel: Optional[Callable[[dict], Optional[dict]]] = None,
        timeout_s: float = 10.0,
        limits: Optional[ScrapeLimits] = None,
        extra_scrape_metrics: bool = False,
        enable_st_zero_ingestion: bool = False,
        synthesize_st_enabled: bool = False,
        enable_type_and_unit_labels: bool = False,
    ):
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        # scraped exemplars land in the same sibling spool the push
        # receivers use, so /api/v1/query_exemplars covers scraped
        # targets too (scrape.go appends exemplars next to samples)
        self.exemplar_dir = os.path.join(spool_dir, "_exemplars")
        os.makedirs(self.exemplar_dir, exist_ok=True)
        self.targets = targets
        self.metric_relabel = metric_relabel
        self.timeout_s = timeout_s
        self.limits = limits or ScrapeLimits()
        # extra report series per scrape (config.go extra_scrape_metrics)
        self.extra_scrape_metrics = extra_scrape_metrics
        # created-timestamp zero-ingestion (feature flag
        # created-timestamp-zero-ingestion; scrape.go:1752
        # enableSTZeroIngestion): inject a synthetic zero sample at the
        # series' start timestamp so rate()/increase() see the counter's
        # birth instead of under-extrapolating
        self.enable_st_zero_ingestion = enable_st_zero_ingestion
        # per-target {series key: last zero-ingested st} — the analogue
        # of the head's OOO check that makes repeated same-ST scrapes
        # no-ops (head_append.go:525 "often hit ... counters share ST")
        self._st_ingested: dict[str, dict[tuple, int]] = {}
        # st-synthesis (feature flag st-synthesis; scrape/st_synthesis.go):
        # synthesize start timestamps for cumulative series that expose
        # none — first sample dropped as the reference point, later
        # values re-anchored to it
        self.synthesize_st_enabled = synthesize_st_enabled
        self._st_synth: dict[str, dict] = {}
        # type-and-unit-labels feature: __type__/__unit__ metadata labels
        # attached from family metadata at parse time (schema/labels.go)
        self.enable_type_and_unit_labels = enable_type_and_unit_labels
        # family → {type, help, unit}, accumulated across scrapes — the
        # metadata store the /api/v1/metadata endpoint serves
        self.metadata: dict[str, dict] = {}
        # per-target family metadata for /api/v1/targets/metadata
        # (reference scrape cache MetadataList per target)
        self.target_metadata: dict[str, dict[str, dict]] = {}
        # staleness tracking: per-target label sets seen last scrape
        # (scrape.go scrapeCache seriesCur/seriesPrev → StaleNaN append)
        self._prev_series: dict[str, dict[tuple, dict]] = {}
        self._n = 0
        self._stop = threading.Event()

    # -- one scrape pass ----------------------------------------------
    def scrape_once(self, now_ms: Optional[int] = None) -> int:
        now_ms = int(time.time() * 1000) if now_ms is None else now_ms
        # target_limit fails EVERY target of the over-limit job, not
        # just the overflow (scrape.go scrapePool.sync
        # refreshTargetLimitErr); per-job pools share this manager, so
        # the count is per job label
        job_counts: dict[str, int] = {}
        for tgt in self.targets:
            job = tgt.labels.get("job", "")
            job_counts[job] = job_counts.get(job, 0) + 1
        written = 0
        for tgt in self.targets:
            lim = tgt.limits or self.limits
            over = bool(lim.target_limit) and (
                job_counts[tgt.labels.get("job", "")] > lim.target_limit
            )
            written += self._scrape_target(tgt, now_ms, fail_all=over)
        return written

    def _check_label_limits(self, labels: dict, lim: ScrapeLimits) -> None:
        """scrape.go verifyLabelLimits — any violation fails the scrape."""
        if lim.label_limit and len(labels) > lim.label_limit:
            raise ScrapeLimitError(
                f"label_limit exceeded ({len(labels)} > {lim.label_limit})"
            )
        for k, v in labels.items():
            if (
                lim.label_name_length_limit
                and len(k) > lim.label_name_length_limit
            ):
                raise ScrapeLimitError(f"label name too long: {k!r}")
            if (
                lim.label_value_length_limit
                and len(v) > lim.label_value_length_limit
            ):
                raise ScrapeLimitError(f"label value too long for {k!r}")

    def _scrape_target(
        self, tgt: ScrapeTarget, now_ms: int, fail_all: bool = False
    ) -> int:
        # "Scrape" span per target fetch (reference scrape/scrape.go:746)
        from prometheus_spark.tracing import span

        with span("Scrape"):
            return self._scrape_target_inner(tgt, now_ms, fail_all)

    def _scrape_target_inner(
        self, tgt: ScrapeTarget, now_ms: int, fail_all: bool = False
    ) -> int:
        tl = tgt.target_labels()
        lim = tgt.limits or self.limits
        start = time.monotonic()
        rows: list = []
        exemplar_rows: list = []
        tracked: dict = {}  # label sets eligible for staleness tracking
        scraped = post_relabel = series_added = 0
        bytes_read = -1  # -1 on failure (scrape.go report bytesRead)
        up = 0.0
        try:
            if fail_all:
                raise ScrapeLimitError("target_limit exceeded")
            escaping = to_escaping_scheme(
                tgt.metric_name_escaping_scheme,
                tgt.metric_name_validation_scheme,
            )
            headers = {
                "Accept": accept_header(tgt.scrape_protocols, escaping)
            }
            if tgt.auth_header:
                headers["Authorization"] = tgt.auth_header
            if tgt.enable_compression:
                headers["Accept-Encoding"] = "gzip"
            req = urllib.request.Request(tgt.url, headers=headers)
            timeout_s = (
                tgt.timeout_s if tgt.timeout_s is not None else self.timeout_s
            )
            opener = (
                urllib.request.build_opener()
                if tgt.follow_redirects
                else urllib.request.build_opener(_NoRedirect())
            )
            with opener.open(req, timeout=timeout_s) as resp:
                if lim.body_size_limit:
                    body = resp.read(lim.body_size_limit + 1)
                    if len(body) > lim.body_size_limit:
                        raise ScrapeLimitError("body_size_limit exceeded")
                else:
                    body = resp.read()
                ct = resp.headers.get("Content-Type", "")
                if resp.headers.get("Content-Encoding") == "gzip":
                    # the body-size limit applies to the UNCOMPRESSED
                    # payload (scrape.go readResponse wraps the gzip
                    # reader in the limit reader)
                    import gzip as _gzip

                    body = _gzip.decompress(body)
                    if (
                        lim.body_size_limit
                        and len(body) > lim.body_size_limit
                    ):
                        raise ScrapeLimitError("body_size_limit exceeded")
                bytes_read = len(body)
            parsed, meta, raw_exemplars = parse_scrape_body(
                body, ct, now_ms,
                fallback_protocol=tgt.fallback_scrape_protocol,
            )
            # the classic text format carries no unit metadata in the
            # reference parsers — attach __unit__ only for OM/protobuf
            units_ok = ct.startswith(OPENMETRICS_CT) or ct.startswith(
                PROTOBUF_CT
            )
            self.metadata.update(meta)
            self.target_metadata.setdefault(tgt.url, {}).update(meta)
            scraped = len(parsed)
            sigs = set()
            # work on COPIES: a scrape that fails later in the loop
            # discards its rows, so the st-ingested marks and synthesis
            # reference points must roll back too
            st_seen = dict(self._st_ingested.get(tgt.url, {}))
            # shallow copy suffices: synthesize_st is copy-on-write
            # (entries replaced, never mutated), so the shared entries
            # stay valid when a failed scrape discards this dict
            synth_cache = (
                dict(self._st_synth.get(tgt.url, {}))
                if self.synthesize_st_enabled
                else {}
            )
            # native-histogram protections (target.go:426-503): schema cap
            # wraps the bucket limit, so it applies first per sample
            from prometheus_spark.sources.hist_limits import (
                EXP_SCHEMA_MAX,
                apply_hist_limits,
                pick_schema,
            )

            max_schema = pick_schema(lim.native_histogram_min_bucket_factor)
            guard_hists = bool(lim.native_histogram_bucket_limit) or (
                max_schema < EXP_SCHEMA_MAX
            )
            for labels, t, v, st in parsed:
                if not tgt.honor_timestamps:
                    t = now_ms
                if self.enable_type_and_unit_labels:
                    # parser-level in the reference, so the labels are
                    # relabel-visible like any others
                    labels = add_type_and_unit_labels(labels, meta, units_ok)
                labels = _merge_labels(labels, tl, tgt.honor_labels)
                if self.metric_relabel is not None:
                    labels = self.metric_relabel(labels)
                    if labels is None:
                        continue
                post_relabel += 1
                if not labels_valid(
                    labels, tgt.metric_name_validation_scheme
                ):
                    # scrape.go:1737 — invalid names fail the scrape
                    raise ScrapeLimitError(
                        "invalid metric name or label names: "
                        f"{sorted(labels)!r}"
                    )
                self._check_label_limits(labels, lim)
                if lim.sample_limit and post_relabel > lim.sample_limit:
                    raise ScrapeLimitError(
                        f"sample_limit exceeded (> {lim.sample_limit})"
                    )
                if guard_hists and isinstance(v, dict):
                    # BucketLimitError propagates → fails the scrape,
                    # exactly like sample_limit (scrape.go:1885)
                    v = apply_hist_limits(
                        v, lim.native_histogram_bucket_limit, max_schema
                    )
                key = tuple(sorted(labels.items()))
                sigs.add(key)
                # st-synthesis (scrape_append_v2.go:269): only samples
                # WITHOUT an exposed start timestamp synthesize one
                if self.synthesize_st_enabled and st is None:
                    v, st, skip = synthesize_st(
                        synth_cache, key, labels.get("__name__", ""),
                        t, v, meta,
                    )
                    if skip:  # first sample = the reference point
                        continue
                # ST zero-ingestion (scrape.go:1752-1768): one synthetic
                # zero sample at the start timestamp, before the real
                # sample; skips (invalid/OOO st) never fail the scrape
                if self.enable_st_zero_ingestion:
                    zero_row = maybe_st_zero(labels, t, v, st, st_seen)
                    if zero_row is not None:
                        rows.append(zero_row)
                rows.append((labels, t, v, st))
                # staleness tracking excludes explicitly-timestamped
                # samples unless track_timestamps_staleness is on
                # (scrape.go:1699 trackTimestampsStaleness)
                if t == now_ms or tgt.track_timestamps_staleness:
                    tracked[tuple(sorted(labels.items()))] = labels
            series_added = len(sigs)
            # exemplars attach to the series' FINAL label set: same
            # target-label merge + metric relabeling as the samples; a
            # relabel-dropped series drops its exemplars with it
            # (scrape.go append: exemplars ride the sample's labels)
            for slabels, t, exl, exv, ext in raw_exemplars:
                if not tgt.honor_timestamps:
                    t = now_ms
                if self.enable_type_and_unit_labels:
                    # exemplars ride the SAME series identity as their
                    # samples — metadata labels included
                    slabels = add_type_and_unit_labels(
                        slabels, meta, units_ok
                    )
                slabels = _merge_labels(slabels, tl, tgt.honor_labels)
                if self.metric_relabel is not None:
                    slabels = self.metric_relabel(slabels)
                    if slabels is None:
                        continue
                # keep the sample time and the exemplar's own (optional)
                # timestamp separate: `ext is not None` so a legitimate
                # explicit exemplar timestamp of 0 survives
                exemplar_rows.append(
                    {"series_labels": slabels, "t": t,
                     "ex_t": ext,
                     "labels": exl, "value": exv}
                )
            # the scrape committed — persist the ST-ingestion marks and
            # synthesis reference points
            self._st_ingested[tgt.url] = st_seen
            if self.synthesize_st_enabled:
                self._st_synth[tgt.url] = synth_cache
            up = 1.0
        except Exception as scrape_err:  # noqa: BLE001 — a failed scrape
            # (including a ScrapeLimitError) discards every sample and
            # reports up=0
            rows = []
            exemplar_rows = []
            tracked = {}
            # scrape_failure_log_file (scrape.go:1429 scrapeFailureLogger):
            # one line per failed scrape; logging must never fail the loop
            if tgt.scrape_failure_log_file:
                try:
                    with open(tgt.scrape_failure_log_file, "a") as lf:
                        lf.write(
                            json.dumps(
                                {
                                    "time": now_ms,
                                    "level": "ERROR",
                                    "msg": str(scrape_err) or "Scrape failed",
                                    "target": tgt.url,
                                }
                            )
                            + "\n"
                        )
                except OSError:
                    pass
        duration = time.monotonic() - start
        # report series (scrape.go report()): target labels only
        for name, value in (
            ("up", up),
            ("scrape_duration_seconds", duration),
            ("scrape_samples_scraped", float(scraped)),
            ("scrape_samples_post_metric_relabeling", float(post_relabel)),
            ("scrape_series_added", float(series_added)),
        ):
            rows.append(({**tl, "__name__": name}, now_ms, value, None))
        if self.extra_scrape_metrics:
            # --enable-feature=extra-scrape-metrics / the yaml knob
            # (scrape.go scrapeTimeout/SampleLimit/BodySizeBytes metrics)
            timeout_s = tgt.timeout_s if tgt.timeout_s else self.timeout_s
            for name, value in (
                ("scrape_timeout_seconds", float(timeout_s)),
                ("scrape_sample_limit", float(lim.sample_limit)),
                ("scrape_body_size_bytes", float(bytes_read)),
            ):
                rows.append(({**tl, "__name__": name}, now_ms, value, None))
        # staleness markers for series seen last scrape but not this one
        # — including ALL of them after a failed scrape (scrape.go
        # report() + endOfRunStaleness semantics)
        prev = self._prev_series.get(tgt.url, {})
        stale_rows = [
            labels for key, labels in prev.items() if key not in tracked
        ]
        self._prev_series[tgt.url] = tracked
        self._n += 1
        path = os.path.join(
            self.spool_dir, f"scrape_{os.getpid()}_{self._n:08d}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for labels, t, v, st in rows:
                rec = {"labels": labels, "t": t}
                if isinstance(v, dict):
                    rec["hist"] = v
                else:
                    rec["value"] = float(v)
                if st is not None:
                    rec["st"] = st
                f.write(json.dumps(rec) + "\n")
            for labels in stale_rows:
                f.write(
                    json.dumps(
                        {"labels": labels, "t": now_ms, "stale": True}
                    )
                    + "\n"
                )
        os.replace(tmp, path)
        if exemplar_rows:
            ex_path = os.path.join(
                self.exemplar_dir, f"scrape_ex_{os.getpid()}_{self._n:08d}.json"
            )
            tmp = ex_path + ".tmp"
            with open(tmp, "w") as f:
                for ex in exemplar_rows:
                    f.write(json.dumps(ex) + "\n")
            os.replace(tmp, ex_path)
        return len(rows)

    def exemplars_df(self, spark):
        """The scrape exemplar spool as the canonical exemplar frame
        (storage.exemplars.EXEMPLAR_SCHEMA) for /api/v1/query_exemplars
        — same record shape as the remote-write receiver's, so a server
        sharing one spool dir serves both sources from one frame."""
        import glob as _glob

        from prometheus_spark.storage.exemplars import exemplars_from_rows

        ex_rows = []
        for p in sorted(_glob.glob(f"{self.exemplar_dir}/*.json")):
            with open(p) as f:
                for line in f:
                    ex = json.loads(line)
                    ex_rows.append(
                        (ex["series_labels"], ex["t"], ex["labels"],
                         ex["value"], ex.get("ex_t"))
                    )
        return exemplars_from_rows(spark, ex_rows)

    # -- background loop ----------------------------------------------
    def start(self, interval_ms: int) -> threading.Thread:
        """Per-target scheduler: each target scrapes on its own
        ``interval_ms`` (falling back to the argument), like the
        reference's one-loop-per-target tickers (scrape.go scrapeLoop
        run).  Targets added by discovery reconciliation are picked up
        on the next tick and scrape immediately."""

        def loop():
            next_due: dict[int, float] = {}
            while not self._stop.is_set():
                now = time.time()
                # snapshot: discovery may swap self.targets concurrently
                targets = list(self.targets)
                due = [t for t in targets if next_due.get(id(t), 0.0) <= now]
                now_ms = int(now * 1000)
                for tgt in due:
                    iv = (tgt.interval_ms or interval_ms) / 1000.0
                    next_due[id(tgt)] = now + iv
                    self._scrape_target(tgt, now_ms)
                # sleep until the earliest deadline, capped for prompt
                # stop/reconcile responsiveness
                pending = [
                    next_due.get(id(t), 0.0) for t in targets
                ] or [now + 1.0]
                delay = max(0.05, min(min(pending) - time.time(), 1.0))
                self._stop.wait(delay)

        thread = threading.Thread(target=loop, daemon=True)
        thread.start()
        return thread

    def stop(self):
        self._stop.set()
