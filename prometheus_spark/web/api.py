"""HTTP API v1 veneer — the reference's query surface as JSON over HTTP.

Reference: web/api/v1/api.go (endpoints ``/api/v1/query``,
``/query_range``, ``/series``, ``/labels``, ``/label/<n>/values``,
``/metadata``, ``/status/buildinfo``, ``/federate``) and
util/jsonutil/marshal.go (value rendering: floats as shortest-``'f'``
strings switching to exponent outside [1e-6, 1e21); timestamps as
second.millisecond numbers; native histograms as
``{count, sum, buckets: [[boundary_rule, lo, hi, count], ...]}``).

The engine does the heavy lifting distributed; this layer only
``collect()``s final result vectors/matrices — the same driver-side
boundary the reference's API layer represents.  Response size is
bounded by series count × steps, exactly as in the reference.
"""

from __future__ import annotations

import json
import math
import re
from typing import Optional
from urllib.parse import parse_qs, urlparse

from prometheus_spark.model.histogram import FloatHist, from_row
from prometheus_spark.parser.lexer import parse_duration_ms


class QueryQueueTimeout(Exception):
    """promql.ErrQueryTimeout: no concurrency slot freed within
    --query.timeout; the API maps it to 503/errorType=timeout
    (api.go returnAPIError errorTimeout)."""


def marshal_float(v: float) -> str:
    """jsonutil.MarshalFloat: shortest 'f' form, 'e' outside
    [1e-6, 1e21), Inf/NaN spelled out."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    a = abs(v)
    s = repr(v)
    if a != 0 and (a < 1e-6 or a >= 1e21):
        if "e" not in s:  # force exponent form
            m, e = f"{v:e}".split("e")
            m = m.rstrip("0").rstrip(".")
            s = f"{m}e{int(e):+03d}"
        return s
    if "e" in s:  # python flipped to exponent inside Go's 'f' range
        from decimal import Decimal

        s = format(Decimal(s), "f")
    if s.endswith(".0"):
        s = s[:-2]
    return s


def _ts_number(t_ms: int) -> float:
    """Timestamp as seconds.milliseconds (MarshalTimestamp)."""
    return t_ms / 1000 if t_ms % 1000 else t_ms // 1000


def render_histogram(h: FloatHist) -> dict:
    """MarshalHistogram: empty buckets dropped; boundary rule 0 = lower
    exclusive/upper inclusive (positive exp buckets), 1 = the mirror
    (negative), 3 = both inclusive (zero bucket)."""
    out = {"count": marshal_float(h.count), "sum": marshal_float(h.sum)}
    buckets = []
    for lo, up, count in h.all_buckets():
        if count == 0:
            continue
        if lo <= 0 <= up:
            rule = 3
        elif up <= 0:
            rule = 1
        else:
            rule = 0
        buckets.append(
            [rule, marshal_float(lo), marshal_float(up), marshal_float(count)]
        )
    if buckets:
        out["buckets"] = buckets
    return out


def render_result(rows, result_type: str) -> dict:
    """Engine result rows → the ``data`` object of a query response.

    ``rows`` are collected Rows with (labels, t, value [, hist]).
    """
    if result_type == "scalar":
        r = rows[0]
        return {
            "resultType": "scalar",
            "result": [_ts_number(r["t"]), marshal_float(r["value"])],
        }
    if result_type == "vector":
        result = []
        for r in rows:
            entry = {"metric": dict(r["labels"])}
            h = from_row(r["hist"]) if "hist" in r.__fields__ else None
            if h is not None:
                entry["histogram"] = [_ts_number(r["t"]), render_histogram(h)]
            else:
                entry["value"] = [_ts_number(r["t"]), marshal_float(r["value"])]
            result.append(entry)
        return {"resultType": "vector", "result": result}
    # matrix: group by labelset, one values/histograms array per series
    series: dict[str, dict] = {}
    for r in rows:
        key = r["sig"]
        s = series.setdefault(
            key, {"metric": dict(r["labels"]), "values": [], "histograms": []}
        )
        h = from_row(r["hist"]) if "hist" in r.__fields__ else None
        if h is not None:
            s["histograms"].append([_ts_number(r["t"]), render_histogram(h)])
        else:
            s["values"].append([_ts_number(r["t"]), marshal_float(r["value"])])
    result = []
    for s in series.values():
        if not s["values"]:
            del s["values"]
        if not s["histograms"]:
            del s["histograms"]
        result.append(s)
    return {"resultType": "matrix", "result": result}


def _parse_time_ms(s: str) -> int:
    """Unix seconds (possibly fractional) or RFC3339 (api.go parseTime)."""
    if re.fullmatch(r"-?\d+(\.\d+)?", s):
        return int(round(float(s) * 1000))
    from datetime import datetime

    return int(datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp() * 1000)


def _parse_duration_ms_api(s: str) -> int:
    """Float seconds or PromQL duration (api.go parseDuration)."""
    if re.fullmatch(r"-?\d+(\.\d+)?", s):
        return int(round(float(s) * 1000))
    return parse_duration_ms(s)


def _query_stats(t_start: float, t_prepared: float, t_done: float) -> dict:
    """The ``stats`` object of a query response (util/stats/query_stats.go:97
    queryTimings; the sample counters are eval-loop instrumentation the
    Spark executors don't surface, so only timings are reported —
    ``samples`` is omitempty upstream)."""
    prep = t_prepared - t_start
    inner = t_done - t_prepared
    return {
        "timings": {
            "evalTotalTime": prep + inner,
            "resultSortTime": 0.0,
            "queryPreparationTime": prep,
            "innerEvalTime": inner,
            "execQueueTime": 0.0,
            "execTotalTime": prep + inner,
        }
    }


# route table for /api/v1/openapi.yaml — (summary, method)
_ROUTES = {
    "/api/v1/query": ("Evaluate an instant query", "get"),
    "/api/v1/query_range": ("Evaluate a range query", "get"),
    "/api/v1/query_exemplars": ("Exemplars for series", "get"),
    "/api/v1/series": ("Series matching selectors", "get"),
    "/api/v1/labels": ("Label names", "get"),
    "/api/v1/label/{name}/values": ("Values of a label", "get"),
    "/api/v1/search/metric_names": ("Fuzzy metric name search", "get"),
    "/api/v1/search/label_names": ("Fuzzy label name search", "get"),
    "/api/v1/search/label_values": ("Fuzzy label value search", "get"),
    "/api/v1/metadata": ("Metric metadata", "get"),
    "/api/v1/targets": ("Scrape targets", "get"),
    "/api/v1/targets/metadata": ("Per-target metric metadata", "get"),
    "/api/v1/targets/relabel_steps": ("Relabel debugging", "get"),
    "/api/v1/scrape_pools": ("Scrape pool names", "get"),
    "/api/v1/rules": ("Rule groups", "get"),
    "/api/v1/alerts": ("Active alerts", "get"),
    "/api/v1/alertmanagers": ("Alertmanager discovery state", "get"),
    "/api/v1/format_query": ("Prettify a PromQL query", "get"),
    "/api/v1/parse_query": ("Parse a PromQL query to AST", "get"),
    "/api/v1/features": ("Supported engine features", "get"),
    "/api/v1/notifications": ("Active server notifications", "get"),
    "/api/v1/notifications/live": ("Notification SSE stream", "get"),
    "/api/v1/status/buildinfo": ("Build information", "get"),
    "/api/v1/status/runtimeinfo": ("Runtime information", "get"),
    "/api/v1/status/config": ("Loaded configuration", "get"),
    "/api/v1/status/flags": ("Flag values", "get"),
    "/api/v1/status/tsdb": ("TSDB stats", "get"),
    "/api/v1/status/tsdb/blocks": ("TSDB block list", "get"),
    "/api/v1/status/walreplay": ("WAL replay status", "get"),
    "/api/v1/status/self_metrics": ("Server self metrics", "get"),
    "/api/v1/read": ("Remote read", "post"),
    "/api/v1/write": ("Remote write", "post"),
    "/api/v1/otlp/v1/metrics": ("OTLP metrics ingest", "post"),
    "/api/v1/admin/tsdb/delete_series": ("Delete series", "post"),
    "/api/v1/admin/tsdb/clean_tombstones": ("Clean tombstones", "post"),
    "/api/v1/admin/tsdb/snapshot": ("Snapshot TSDB", "post"),
    "/api/v1/openapi.yaml": ("This document", "get"),
}


class PromAPI:
    """The /api/v1 surface over a PromQLEngine.

    ``handle(path, params)`` returns (status_code, response_dict) — the
    HTTP server below is a thin shim over it, so tests can drive the
    API without sockets.
    """

    def __init__(
        self,
        engine,
        metadata: Optional[dict] = None,
        rule_groups: Optional[list] = None,
        rules_engine=None,
        scrape_manager=None,
        per_step_stats: bool = False,
    ):
        self.engine = engine
        # --enable-feature=promql-per-step-stats: stats=all additionally
        # returns per-step queryable-sample counts (engine/stats.py)
        self.per_step_stats = per_step_stats
        self.metadata = metadata or {}
        self.rule_groups = rule_groups or []
        self.rules_engine = rules_engine
        self.scrape_manager = scrape_manager
        self.exemplars = None  # optional exemplar frame (storage.exemplars)
        # optional series-dimension table (storage.series_dim): one row
        # per series — when set, /labels, /series and /label/<n>/values
        # answer from it (the postings-index role) instead of scanning
        # the samples store
        self.series_dim = None
        self.last_alerts: list = []  # refreshed by record_alerts()
        from prometheus_spark.storage.tombstones import TombstoneStore

        self.tombstones = TombstoneStore()
        self.config_yaml = ""  # served by /status/config (reference: api.go serveConfig)
        self.flags: dict = {}  # /status/flags
        self.snapshot_dir: Optional[str] = None  # /admin/tsdb/snapshot target
        self.blocks_dir: Optional[str] = None  # /status/tsdb/blocks source
        self.notifier = None  # NotifierManager for /alertmanagers
        # --query.max-concurrency / --query.timeout defaults (main.go
        # flag defaults 20 and 2m; engine.go exec blocks on the
        # concurrency gate and fails with ErrQueryTimeout("query queue")
        # once the timeout elapses waiting for a slot)
        import threading as _threading

        self.max_concurrency = 20
        self.queue_timeout_s = 120.0
        self._query_gate = _threading.BoundedSemaphore(self.max_concurrency)

    def targets_metadata(self, params: dict) -> tuple[int, dict]:
        """api.go targetMetadata: per-target metric metadata filtered by
        match_target label matchers and an optional metric family."""
        import re as _re

        from prometheus_spark.parser import parse_expr
        from prometheus_spark.parser.ast import MatchType, VectorSelector

        try:
            limit = int(params.get("limit", ["-1"])[0])
        except ValueError:
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": "limit must be a number"}
        metric = params.get("metric", [""])[0]
        match_target = params.get("match_target", [""])[0]
        matchers = []
        if match_target:
            try:
                node = parse_expr(match_target)
                assert isinstance(node, VectorSelector)
                matchers = node.matchers
            except Exception as e:  # noqa: BLE001 — API boundary
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": f"invalid match_target: {e}"}

        def _match(lbls: dict) -> bool:
            for m in matchers:
                v = lbls.get(m.name, "")
                if m.type == MatchType.EQ:
                    ok = v == m.value
                elif m.type == MatchType.NEQ:
                    ok = v != m.value
                else:
                    ok = bool(_re.fullmatch(m.value, v))
                    if m.type == MatchType.NRE:
                        ok = not ok
                if not ok:
                    return False
            return True

        res: list[dict] = []
        sm = self.scrape_manager
        for t in (sm.targets if sm is not None else []):
            if 0 <= limit <= len(res):
                break
            tl = t.target_labels()
            if matchers and not _match(tl):
                continue
            md = sm.target_metadata.get(t.url, {})
            fams = [metric] if metric else sorted(md)
            for fam in fams:
                if fam not in md:
                    continue
                m = md[fam]
                res.append({
                    "target": tl,
                    "metric": fam,
                    "type": m.get("type", "unknown"),
                    "help": m.get("help", ""),
                    "unit": m.get("unit", ""),
                })
        return 200, {"status": "success", "data": res}

    def record_alerts(self, alert_rows: list) -> None:
        """Feed the latest RulesEngine.eval_tick alert snapshot so
        /api/v1/alerts serves it."""
        self.last_alerts = alert_rows

    def rules(self, params: Optional[dict] = None) -> tuple[int, dict]:
        """api.go:1633 rules endpoint: groups with their rule
        definitions, the reference's query filters (``type``,
        ``rule_name[]``, ``rule_group[]``, ``exclude_alerts``), per-rule
        alert state derived from the rules engine's active-alert maps,
        and the group's ``limit``."""
        from prometheus_spark.streaming.rules import AlertingRule, RecordingRule

        params = params or {}
        want_type = params.get("type", [""])[0]
        if want_type not in ("", "alert", "record"):
            return 400, {
                "status": "error", "errorType": "bad_data",
                "error": f"not supported value {want_type!r} of type parameter",
            }
        name_set = set(params.get("rule_name[]", []))
        group_set = set(params.get("rule_group[]", []))
        file_set = set(params.get("file[]", []))
        # strconv.ParseBool semantics (api.go:1793 parseExcludeAlerts)
        ea_raw = params.get("exclude_alerts", [""])[0]
        if ea_raw in ("1", "t", "T", "TRUE", "true", "True"):
            exclude_alerts = True
        elif ea_raw in ("", "0", "f", "F", "FALSE", "false", "False"):
            exclude_alerts = False
        else:
            return 400, {
                "status": "error", "errorType": "bad_data",
                "error": f"error converting exclude_alerts: invalid "
                         f"syntax {ea_raw!r}",
            }

        # match[]: rule labels must satisfy at least one matcher set
        # (sets ORed, matchers within a set ANDed — group.go:180)
        matcher_sets = []
        for m in params.get("match[]", []):
            from prometheus_spark.parser import parse_expr
            from prometheus_spark.parser.ast import VectorSelector

            try:
                node = parse_expr(m)
            except Exception as e:  # noqa: BLE001
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": str(e)}
            if not isinstance(node, VectorSelector):
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": f"invalid matcher {m!r}"}
            ms = list(node.matchers)
            if node.name:
                from prometheus_spark.parser.ast import MatchType, Matcher

                ms.append(Matcher("__name__", MatchType.EQ, node.name))
            matcher_sets.append(ms)

        def rule_matches(labels: dict) -> bool:
            if not matcher_sets:
                return True
            from prometheus_spark.streaming.rule_deps import matcher_matches

            return any(
                all(matcher_matches(m, labels.get(m.name, "")) for m in ms)
                for ms in matcher_sets
            )

        # pagination (api.go:1807 parseListRulesPaginationRequest)
        import hashlib

        def group_token(g) -> str:
            return hashlib.sha256(
                f"{getattr(g, 'file', '')};{g.name}".encode()
            ).hexdigest()

        next_token = params.get("group_next_token", [""])[0]
        group_limit_raw = params.get("group_limit", [""])[0]
        max_groups = -1
        if next_token and not group_limit_raw:
            return 400, {
                "status": "error", "errorType": "bad_data",
                "error": "group_limit needs to be present in order to "
                         "paginate over the groups",
            }
        if group_limit_raw:
            try:
                max_groups = int(group_limit_raw)
            except ValueError:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": "group_limit needs to be a valid number"}
            if max_groups <= 0:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": "group_limit needs to be greater than 0"}

        def rule_alerts(group, idx, rule):
            """Active alerts for one alerting rule from the engine's
            state map (keyed per rule instance)."""
            if self.rules_engine is None:
                return []
            key = f"{group.name}/{idx}/{rule.alert}"
            out = []
            for st in self.rules_engine._alert_state.get(key, {}).values():
                out.append({
                    "labels": dict(st["labels"]),
                    "annotations": dict(st.get("annotations") or {}),
                    "state": st["state"],
                    "activeAt": _ts_number(st["active_since"]),
                    "value": marshal_float(st["value"]),
                })
            return out

        groups = []
        overflow_token = None
        found_token = not next_token
        for g in self.rule_groups:
            if max_groups > 0 and next_token and not found_token:
                if next_token != group_token(g):
                    continue
                found_token = True
            if group_set and g.name not in group_set:
                continue
            if file_set and getattr(g, "file", "") not in file_set:
                continue
            rules = []
            for idx, r in enumerate(g.rules):
                if not rule_matches(r.labels):
                    continue
                if isinstance(r, RecordingRule):
                    if want_type == "alert":
                        continue
                    if name_set and r.record not in name_set:
                        continue
                    rules.append({
                        "type": "recording",
                        "name": r.record,
                        "query": r.expr,
                        "labels": r.labels,
                        "health": "ok",
                    })
                elif isinstance(r, AlertingRule):
                    if want_type == "record":
                        continue
                    if name_set and r.alert not in name_set:
                        continue
                    alerts = rule_alerts(g, idx, r)
                    state = "inactive"
                    if any(a["state"] == "firing" for a in alerts):
                        state = "firing"
                    elif any(a["state"] == "pending" for a in alerts):
                        state = "pending"
                    entry = {
                        "type": "alerting",
                        "name": r.alert,
                        "query": r.expr,
                        "duration": r.for_ms / 1000,
                        "keepFiringFor": r.keep_firing_for_ms / 1000,
                        "labels": r.labels,
                        "annotations": r.annotations,
                        "health": "ok",
                        "state": state,
                    }
                    if not exclude_alerts:
                        entry["alerts"] = alerts
                    rules.append(entry)
            if not rules:
                # all rules of the group filtered out → skip the group
                # (api.go:1773 "If the rule group response has no rules")
                continue
            if max_groups > 0 and len(groups) == max_groups:
                overflow_token = group_token(g)
                break
            entry = {
                "name": g.name,
                "file": getattr(g, "file", ""),
                "interval": g.interval_ms / 1000,
                "rules": rules,
            }
            if g.limit:
                entry["limit"] = g.limit
            groups.append(entry)
        if max_groups > 0 and next_token and not found_token:
            return 400, {
                "status": "error", "errorType": "bad_data",
                "error": f"invalid group_next_token '{next_token}'. "
                         "were rule groups changed?",
            }
        data: dict = {"groups": groups}
        if overflow_token:
            data["groupNextToken"] = overflow_token
        return 200, {"status": "success", "data": data}

    def alerts(self) -> tuple[int, dict]:
        """api.go alerts endpoint over the last eval's alert snapshot."""
        alerts = [
            {
                "labels": dict(labels),
                "annotations": dict(annotations),
                "state": state,
                "activeAt": _ts_number(active_since),
                "value": marshal_float(value),
            }
            for (_name, labels, annotations, state, active_since, value)
            in self.last_alerts
        ]
        return 200, {"status": "success", "data": {"alerts": alerts}}

    def targets(self) -> tuple[int, dict]:
        """api.go targets endpoint over the scrape manager's targets;
        relabel-dropped targets come from the discovery manager's last
        reconcile (scrape/manager.go droppedTargets, capped per job by
        keep_dropped_targets)."""
        active = []
        if self.scrape_manager is not None:
            for t in self.scrape_manager.targets:
                labels = t.target_labels()
                active.append({
                    "scrapeUrl": t.url,
                    "labels": labels,
                    "health": "unknown",
                })
        dropped = [
            {"discoveredLabels": d["discoveredLabels"]}
            for d in getattr(
                getattr(self, "discovery", None), "dropped_targets", []
            ) or []
        ]
        counts: dict[str, int] = {}
        for d in getattr(
            getattr(self, "discovery", None), "dropped_targets", []
        ) or []:
            counts[d["job"]] = counts.get(d["job"], 0) + 1
        return 200, {
            "status": "success",
            "data": {
                "activeTargets": active,
                "droppedTargets": dropped,
                "droppedTargetCounts": counts,
            },
        }

    # -- endpoint implementations -------------------------------------
    def _engine_metrics(self, t_start, t_prepared, samples_stats=None):
        """Engine self-telemetry for one completed query — the
        reference's engine metrics (promql/engine.go:392-470): query
        count, duration slices, and querySamplesRead fed from the
        query's SamplesRead (:691)."""
        import time as _time

        from prometheus_spark.web.selfmetrics import REGISTRY

        now = _time.monotonic()
        REGISTRY.counter_add(
            "prometheus_engine_queries_total",
            help_="Number of PromQL queries executed.",
        )
        REGISTRY.observe(
            "prometheus_engine_query_duration_seconds",
            t_prepared - t_start,
            help_="Query timings",
            slice="queue_and_prepare_time",
        )
        REGISTRY.observe(
            "prometheus_engine_query_duration_seconds",
            now - t_prepared,
            slice="inner_eval",
        )
        if samples_stats:
            REGISTRY.counter_add(
                "prometheus_engine_query_samples_total",
                float(samples_stats.get("samplesRead", 0)),
                help_="The total number of samples read by all queries.",
            )

    def _track(self, q: str):
        """Claim a concurrency slot (bounded at ``max_concurrency``,
        waiting at most ``queue_timeout_s`` — engine.go exec's gate) and
        an active-query tracker slot when a tracker is configured
        (promql/query_logger.go ActiveQueryTracker); returns a finisher.
        Raises QueryQueueTimeout when no slot frees in time."""
        if not self._query_gate.acquire(timeout=self.queue_timeout_s):
            raise QueryQueueTimeout("query timed out in query queue")
        if getattr(self, "query_tracker", None) is None:
            return lambda: self._query_gate.release()
        slot = self.query_tracker.insert(q)

        def _done():
            self.query_tracker.delete(slot)
            self._query_gate.release()
            # py4j handles self-cycle and are only freed by the cycle
            # collector; a months-lived query API otherwise accumulates
            # pinned JVM plans + broadcast pages (see pygc docstring)
            from prometheus_spark import pygc

            pygc.tick()

        return _done

    def query(self, params: dict) -> tuple[int, dict]:
        import time as _time

        q = params["query"][0]
        t_ms = (
            _parse_time_ms(params["time"][0]) if "time" in params else 0
        )
        t_start = _time.monotonic()
        try:
            done = self._track(q)
        except QueryQueueTimeout as e:
            return 503, {"status": "error", "errorType": "timeout",
                         "error": str(e)}
        try:
            df = self.engine.instant_query(q, t_ms)
            t_prepared = _time.monotonic()
            rows = df.collect()
        except ValueError as e:
            done()
            if "string results" in str(e):
                from prometheus_spark.parser import parse_expr
                from prometheus_spark.parser.ast import StringLiteral

                node = parse_expr(q)
                if isinstance(node, StringLiteral):
                    return 200, {
                        "status": "success",
                        "data": {
                            "resultType": "string",
                            "result": [_ts_number(t_ms), node.value],
                        },
                    }
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": str(e)}
        except Exception as e:  # noqa: BLE001 — API boundary
            done()
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": str(e)}
        # per-step sample stats run INSIDE the tracked region so their
        # counting jobs respect the query-concurrency limiter; stats
        # failures never fail the query (and never leak the slot)
        samples_stats = None
        try:
            if params.get("stats", [""])[0] == "all" and self.per_step_stats:
                from prometheus_spark.engine.stats import query_samples_stats

                samples_stats = query_samples_stats(
                    self.engine, q, t_ms, t_ms, 1
                )
        except Exception:  # noqa: BLE001
            samples_stats = None
        finally:
            done()
        self._engine_metrics(t_start, t_prepared, samples_stats)
        from prometheus_spark.parser import parse_expr
        from prometheus_spark.parser.ast import ValueType

        vt = parse_expr(q).value_type()
        if vt == ValueType.SCALAR:
            rtype = "scalar"
        elif vt == ValueType.MATRIX:
            rtype = "matrix"  # top-level range-vector instant query
        else:
            rtype = "vector"
        data = render_result(rows, rtype)
        if params.get("stats", [""])[0]:
            data["stats"] = _query_stats(t_start, t_prepared, _time.monotonic())
            if samples_stats is not None:
                data["stats"]["samples"] = samples_stats
        return 200, {"status": "success", "data": data}

    def query_range(self, params: dict) -> tuple[int, dict]:
        q = params["query"][0]
        start = _parse_time_ms(params["start"][0])
        end = _parse_time_ms(params["end"][0])
        step = _parse_duration_ms_api(params["step"][0])
        if end < start:
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": "end timestamp must not be before start time"}
        if step <= 0:
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": "zero or negative query resolution step"}
        if (end - start) // step > 11000:
            return 422, {"status": "error", "errorType": "bad_data",
                         "error": "exceeded maximum resolution of 11,000 points"}
        import time as _time

        t_start = _time.monotonic()
        try:
            done = self._track(q)
        except QueryQueueTimeout as e:
            return 503, {"status": "error", "errorType": "timeout",
                         "error": str(e)}
        try:
            df = self.engine.range_query(q, start, end, step)
            t_prepared = _time.monotonic()
            rows = df.collect()
            # inside the tracked region: the stats counting jobs must
            # respect the query-concurrency limiter
            samples_stats = None
            if params.get("stats", [""])[0] == "all" and self.per_step_stats:
                from prometheus_spark.engine.stats import query_samples_stats

                samples_stats = query_samples_stats(
                    self.engine, q, start, end, step
                )
        except Exception as e:  # noqa: BLE001 — API boundary
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": str(e)}
        finally:
            done()
        self._engine_metrics(t_start, t_prepared, samples_stats)
        data = render_result(rows, "matrix")
        if params.get("stats", [""])[0]:
            data["stats"] = _query_stats(t_start, t_prepared, _time.monotonic())
            if samples_stats is not None:
                data["stats"]["samples"] = samples_stats
        return 200, {
            "status": "success",
            "data": data,
        }

    def _scoped_samples(self, params: dict, require_match: bool = False):
        """The samples view scoped by optional ``match[]`` selector sets
        (OR-combined, api.go parseMatchersParam), ``start`` and ``end`` —
        shared by the series/labels/label-values metadata endpoints.
        Returns (df, error_response)."""
        from pyspark.sql import functions as F

        from prometheus_spark.engine.selectors import matcher_predicate
        from prometheus_spark.parser import parse_expr
        from prometheus_spark.parser.ast import VectorSelector

        matches = params.get("match[]", [])
        if require_match and not matches:
            return None, (400, {"status": "error", "errorType": "bad_data",
                                "error": "no match[] parameter provided"})
        # The series-dimension table (one row per series, min_t/max_t
        # presence range) answers metadata queries without touching the
        # samples store — the postings-index stance of the reference
        # (tsdb/index/postings.go).  Fall back to the samples scan only
        # when no dimension table is wired.
        dim = self.series_dim
        df = dim if dim is not None else self.engine.samples
        if matches:
            pred = None
            for m in matches:
                node = parse_expr(m)
                if not isinstance(node, VectorSelector):
                    return None, (
                        400,
                        {"status": "error", "errorType": "bad_data",
                         "error": f"not a vector selector: {m}"},
                    )
                p = matcher_predicate(node.matchers, df.columns)
                pred = p if pred is None else (pred | p)
            df = df.where(pred)
        if dim is not None:  # overlap test against the presence range
            if "start" in params:
                df = df.where(
                    F.col("max_t") >= _parse_time_ms(params["start"][0])
                )
            if "end" in params:
                df = df.where(
                    F.col("min_t") <= _parse_time_ms(params["end"][0])
                )
        else:
            if "start" in params:
                df = df.where(F.col("t") >= _parse_time_ms(params["start"][0]))
            if "end" in params:
                df = df.where(F.col("t") <= _parse_time_ms(params["end"][0]))
        return df, None

    @staticmethod
    def _limit(params: dict, data: list, resp: dict) -> dict:
        """Apply the ``limit`` parameter (api.go parseLimitParam +
        truncation warning)."""
        s = params.get("limit", [""])[0]
        if s:
            limit = int(s)
            if limit < 0:
                return {"status": "error", "errorType": "bad_data",
                        "error": "limit must be non-negative"}
            if limit > 0 and len(data) > limit:
                resp["data"] = data[:limit]
                resp["warnings"] = ["results truncated due to limit"]
        return resp

    @staticmethod
    def _push_limit(params: dict, df):
        """Push ``limit`` into the plan as ``.limit(n+1)`` — the
        SelectHints.Limit stance (storage/interface.go:214): at high
        cardinality a broad match[] must not materialize every series on
        the driver just to throw away all but n.  +1 so ``_limit`` can
        still detect truncation and attach the warning."""
        s = params.get("limit", [""])[0]
        if s:
            try:
                n = int(s)
            except ValueError:
                return df
            if n > 0:
                return df.limit(n + 1)
        return df

    def series(self, params: dict) -> tuple[int, dict]:
        df, err = self._scoped_samples(params, require_match=True)
        if err:
            return err
        out = []
        seen = set()
        # distinct() can't hash MAP columns — dedupe on the sig key;
        # limit is pushed below the collect (GlobalLimit above the
        # dedup exchange), so the driver sees at most n+1 rows
        plan = self._push_limit(
            params, df.select("sig", "labels").dropDuplicates(["sig"])
        )
        for r in plan.collect():
            key = tuple(sorted(r["labels"].items()))
            if key not in seen:
                seen.add(key)
                out.append(dict(r["labels"]))
        resp = self._limit(params, out, {"status": "success", "data": out})
        return (400 if resp["status"] == "error" else 200), resp

    def labels(self, params: dict) -> tuple[int, dict]:
        from pyspark.sql import functions as F

        df, err = self._scoped_samples(params)
        if err:
            return err
        # orderBy+limit compiles to TakeOrderedAndProject — sorted
        # truncation without a global sort or a full driver collect
        names = [
            r["l"]
            for r in self._push_limit(
                params,
                df.select(F.explode(F.map_keys("labels")).alias("l"))
                .distinct()
                .orderBy("l"),
            ).collect()
        ]
        resp = self._limit(params, names, {"status": "success", "data": names})
        return (400 if resp["status"] == "error" else 200), resp

    def label_values(self, name: str, params: dict) -> tuple[int, dict]:
        from pyspark.sql import functions as F

        df, err = self._scoped_samples(params)
        if err:
            return err
        vals = [
            r["v"]
            for r in self._push_limit(
                params,
                df.select(F.element_at("labels", name).alias("v"))
                .where(F.col("v").isNotNull())
                .distinct()
                .orderBy("v"),
            ).collect()
        ]
        resp = self._limit(params, vals, {"status": "success", "data": vals})
        return (400 if resp["status"] == "error" else 200), resp

    # -- search API (web/api/v1/search.go) ---------------------------------
    def _search_common(self, params: dict, endpoint: str):
        """Parse the shared search params (search.go:701 newSearchRequest /
        parseSearchParams); returns (kwargs, candidates_df, error)."""
        from prometheus_spark.web.search import (
            DEFAULT_BATCH_SIZE,
            DEFAULT_LIMIT,
            FUZZ_ALGORITHMS,
            MAX_SEARCH_TERMS,
        )

        def bad(msg):
            return None, None, (400, {"status": "error",
                                      "errorType": "bad_data", "error": msg})

        searches = params.get("search[]", [])
        if len(searches) > MAX_SEARCH_TERMS:
            return bad(
                f"too many search[] terms: got {len(searches)}, "
                f"maximum is {MAX_SEARCH_TERMS}"
            )
        try:
            ft = int(params.get("fuzz_threshold", ["0"])[0])
            assert 0 <= ft <= 100
        except (ValueError, AssertionError):
            return bad("invalid fuzz_threshold: must be 0-100")
        alg = params.get("fuzz_alg", ["subsequence"])[0]
        if alg not in FUZZ_ALGORITHMS:
            return bad(
                f"unsupported fuzz_alg {alg!r}: must be one of {FUZZ_ALGORITHMS}"
            )
        sort_by = params.get("sort_by", [""])[0]
        sort_dir = params.get("sort_dir", [""])[0]
        if sort_dir and not sort_by:
            return bad("sort_dir is only valid when sort_by is set")
        if sort_dir and sort_by == "score":
            return bad("sort_dir is not supported for sort_by=score")
        if sort_by not in ("", "alpha", "score"):
            return bad(f'invalid sort_by {sort_by!r} for {endpoint}: '
                       'must be "alpha" or "score"')
        if sort_by == "score" and not searches:
            return bad("sort_by=score requires search[] to be set")
        try:
            limit = int(params.get("limit", [str(DEFAULT_LIMIT)])[0])
            assert limit > 0
        except (ValueError, AssertionError):
            return bad("invalid limit: must be a positive integer")
        try:
            batch = int(params.get("batch_size", [str(DEFAULT_BATCH_SIZE)])[0])
            assert batch > 0
        except (ValueError, AssertionError):
            return bad("invalid batch_size: must be a positive integer")
        case_sensitive = params.get("case_sensitive", ["true"])[0] != "false"
        include_score = params.get("include_score", ["false"])[0] == "true"
        df, err = self._scoped_samples(params)
        if err:
            return None, None, err
        kwargs = dict(
            searches=searches, limit=limit, batch_size=batch,
            fuzz_threshold=ft, fuzz_alg=alg, case_sensitive=case_sensitive,
            include_score=include_score, sort_by=sort_by,
            sort_dir=sort_dir or "asc",
        )
        return kwargs, df, None

    def search(self, kind: str, params: dict) -> tuple[int, dict]:
        """GET/POST /api/v1/search/{metric_names,label_names,label_values}.
        Returns the NDJSON line objects under ``__ndjson__`` — the HTTP
        layer writes one JSON document per line
        (Content-Type application/x-ndjson, search.go stream contract)."""
        from pyspark.sql import functions as F

        from prometheus_spark.web.search import run_search

        kwargs, df, err = self._search_common(params, kind)
        if err:
            return err
        if kind == "metric_names":
            vals = [r["v"] for r in df.select(
                F.element_at("labels", "__name__").alias("v")
            ).where(F.col("v").isNotNull()).distinct().collect()]
            key = "name"
        elif kind == "label_names":
            vals = [r["v"] for r in df.select(
                F.explode(F.map_keys("labels")).alias("v")
            ).distinct().collect()]
            key = "name"
        else:
            label = params.get("label", [""])[0]
            if not label:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": 'missing required parameter "label"'}
            vals = [r["v"] for r in df.select(
                F.element_at("labels", label).alias("v")
            ).where(F.col("v").isNotNull()).distinct().collect()]
            key = "value"
        lines = run_search(vals, result_key=key, **kwargs)
        if kind == "metric_names" and (
            params.get("include_metadata", ["false"])[0] == "true"
        ):
            merged = dict(self.metadata)
            if self.scrape_manager is not None:
                merged = {**self.scrape_manager.metadata, **merged}
            for line in lines:
                for r in line.get("results", []):
                    md = merged.get(r["name"])
                    if isinstance(md, list):
                        md = md[0] if md else None
                    if md:
                        r["type"] = md.get("type", "unknown")
                        r["help"] = md.get("help", "")
                        r["unit"] = md.get("unit", "")
        return 200, {"__ndjson__": lines}

    def query_exemplars(self, params: dict) -> tuple[int, dict]:
        """api.go:756 queryExemplars: series matchers + time range →
        [{seriesLabels, exemplars: [{labels, value, timestamp}]}]."""
        exemplars = (
            self.exemplars_fn()
            if getattr(self, "exemplars_fn", None)
            else self.exemplars
        )
        if exemplars is None:
            return 200, {"status": "success", "data": []}
        # the reference takes a full PromQL `query` and extracts its
        # selectors (api.go:770 parser.ExtractSelectors); bare match[]
        # selectors are also accepted
        matches = list(params.get("match[]", []))
        matches += params.get("query", [])
        if not matches:
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": "no query parameter provided"}
        start = _parse_time_ms(params["start"][0]) if "start" in params else 0
        end = (
            _parse_time_ms(params["end"][0])
            if "end" in params
            else (1 << 62)
        )
        from prometheus_spark.parser import parse_expr
        from prometheus_spark.parser.ast import VectorSelector
        from prometheus_spark.storage.exemplars import select_exemplars

        def _selectors(node) -> list:
            """All VectorSelectors in an expression (the reference's
            parser.ExtractSelectors walk)."""
            if isinstance(node, VectorSelector):
                return [node]
            out = []
            for v in vars(node).values():
                from prometheus_spark.parser.ast import Expr

                if isinstance(v, Expr):
                    out.extend(_selectors(v))
                elif isinstance(v, (list, tuple)):
                    out.extend(
                        s for x in v if isinstance(x, Expr)
                        for s in _selectors(x)
                    )
            return out

        series: dict[tuple, dict] = {}
        selectors = []
        for m in matches:
            found = _selectors(parse_expr(m))
            if not found:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": f"no vector selector in: {m}"}
            selectors.extend(found)
        for node in selectors:
            rows = select_exemplars(
                exemplars, node.matchers, start, end
            ).collect()
            for r in rows:
                key = tuple(sorted(r["labels"].items()))
                s = series.setdefault(
                    key, {"seriesLabels": dict(r["labels"]), "exemplars": []}
                )
                ex = {
                    "labels": dict(r["ex_labels"]),
                    "value": marshal_float(r["value"]),
                    "timestamp": _ts_number(
                        r["ex_t"] if r["ex_t"] is not None else r["t"]
                    ),
                }
                if ex not in s["exemplars"]:
                    s["exemplars"].append(ex)
        return 200, {"status": "success", "data": list(series.values())}

    def tsdb_stats(self) -> tuple[int, dict]:
        """api.go TSDB stats (/api/v1/status/tsdb): head series/sample
        counts and top-10 cardinality tables — DataFrame aggregates."""
        from pyspark.sql import functions as F

        s = self.engine.samples
        num_series = s.select("sig").distinct().count()
        # label names by number of distinct values (docs: the top-10
        # label names with the highest value cardinality)
        label_counts = (
            s.select(F.explode("labels").alias("l", "v"))
            .distinct()
            .groupBy("l")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "l")
            .limit(10)
            .collect()
        )
        metric_counts = (
            s.select("sig", "name").dropDuplicates(["sig"])
            .groupBy("name").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "name").limit(10).collect()
        )
        pair_counts = (
            s.select(
                "sig", F.explode("labels").alias("l", "v")
            )
            .select("sig", F.concat_ws("=", "l", "v").alias("pair"))
            .dropDuplicates(["sig", "pair"])
            .groupBy("pair").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "pair").limit(10).collect()
        )
        return 200, {
            "status": "success",
            "data": {
                "headStats": {
                    "numSeries": num_series,
                    "numLabelPairs": int(
                        s.select(F.explode("labels"))
                        .distinct()
                        .count()
                    ),
                },
                "seriesCountByMetricName": [
                    {"name": r["name"], "value": r["n"]} for r in metric_counts
                ],
                "labelValueCountByLabelName": [
                    {"name": r["l"], "value": r["n"]} for r in label_counts
                ],
                "seriesCountByLabelValuePair": [
                    {"name": r["pair"], "value": r["n"]} for r in pair_counts
                ],
            },
        }

    def buildinfo(self) -> tuple[int, dict]:
        return 200, {
            "status": "success",
            "data": {
                "version": "0.1.0-spark",
                "revision": "",
                "branch": "",
                "buildUser": "",
                "buildDate": "",
                "goVersion": "",
            },
        }

    def delete_series(self, params: dict) -> tuple[int, dict]:
        """Admin deleteSeries (api.go admin endpoints): record a tombstone
        per match[] selector and mask the engine's samples immediately —
        deletions are query-time filters until clean_tombstones compacts."""
        from prometheus_spark.storage.tombstones import parse_delete_matchers

        sels = params.get("match[]", [])
        if not sels:
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": "no match[] parameter provided"}
        mint = _parse_time_ms(params["start"][0]) if "start" in params else None
        maxt = _parse_time_ms(params["end"][0]) if "end" in params else None
        try:
            for sel in sels:
                stone = self.tombstones.add(
                    parse_delete_matchers(sel), mint, maxt
                )
                self.engine.samples = self.engine.samples.filter(
                    ~stone.predicate()
                )
        except Exception as e:  # noqa: BLE001 — API boundary
            return 400, {"status": "error", "errorType": "bad_data",
                         "error": str(e)}
        return 204, {"status": "success"}

    def snapshot(self, params: dict) -> tuple[int, dict]:
        """Admin snapshot (api.go:500): persist the engine's current
        (tombstone-masked) samples view as a partitioned parquet snapshot
        under ``snapshot_dir`` and return its name."""
        if not getattr(self, "snapshot_dir", None):
            return 500, {"status": "error", "errorType": "unavailable",
                         "error": "snapshot directory not configured"}
        import os as _os
        import time as _time

        from prometheus_spark.storage.samples import write_samples

        name = _time.strftime("%Y%m%dT%H%M%SZ-spark", _time.gmtime())
        df = self.engine.samples
        if params.get("skip_head", [""])[0] in ("true", "1"):
            # the reference skips the in-memory head block; our analog is
            # dropping the most recent 2h bucket
            from pyspark.sql import functions as _F

            head_cut = df.agg(_F.max("t")).first()[0]
            if head_cut is not None:
                df = df.filter(_F.col("t") <= head_cut - 7_200_000)
        write_samples(df, _os.path.join(self.snapshot_dir, name))
        return 200, {"status": "success", "data": {"name": name}}

    def clean_tombstones(self) -> tuple[int, dict]:
        """Compaction counterpart: the masked frame is already the engine's
        view; dropping the stones makes the deletion permanent for this
        session (a Parquet-backed deployment passes a path to
        TombstoneStore.clean to rewrite storage)."""
        self.tombstones.stones = []
        return 204, {"status": "success"}

    # -- dispatch ------------------------------------------------------
    def handle(self, path: str, params: dict) -> tuple[int, dict]:
        import time as _time

        t0 = _time.monotonic()
        try:
            code, resp = self._dispatch(path, params)
        except Exception as e:  # noqa: BLE001 — api.go errorInternal
            code, resp = 500, {"status": "error", "errorType": "internal",
                               "error": str(e)}
        # self-telemetry counters served by /status/self_metrics
        sm = self.__dict__.setdefault("self_counters", {})
        sm[(path, "requests")] = sm.get((path, "requests"), 0) + 1
        if code >= 400:
            sm[(path, "errors")] = sm.get((path, "errors"), 0) + 1
        # the /metrics self-instrumentation registry (web/web.go
        # instrumentHandler: requests by handler+code, duration summary)
        from prometheus_spark.web.selfmetrics import REGISTRY

        REGISTRY.counter_add(
            "prometheus_http_requests_total",
            help_="Counter of HTTP requests.",
            handler=path, code=str(code),
        )
        REGISTRY.observe(
            "prometheus_http_request_duration_seconds",
            _time.monotonic() - t0,
            help_="Histogram of latencies for HTTP requests.",
            handler=path,
        )
        return code, resp

    def metrics_text(self) -> str:
        """The server's own telemetry as text exposition — the body the
        HTTP server serves at ``/metrics`` (the reference's self-scrape
        surface)."""
        from prometheus_spark.web.selfmetrics import REGISTRY

        return REGISTRY.render()

    def _dispatch(self, path: str, params: dict) -> tuple[int, dict]:
        if path == "/api/v1/status/self_metrics":
            # api.go:1929 selfMetrics: JSON metric families of the
            # server's own telemetry, optionally name-filtered
            import re as _re

            pattern = params.get("metric_name_pattern", [""])[0]
            try:
                nf = _re.compile(f"^(?:{pattern})$") if pattern else None
            except _re.error as e:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": f"invalid metric_name_pattern: {e}"}
            sm = self.__dict__.get("self_counters", {})
            fams: dict[str, list] = {}
            for (pth, kind), v in sorted(sm.items()):
                name = f"promspark_http_{kind}_total"
                fams.setdefault(name, []).append({
                    "label": [{"name": "path", "value": pth}],
                    "counter": {"value": float(v)},
                })
            result = [
                {"name": n, "type": "COUNTER", "metric": ms}
                for n, ms in sorted(fams.items())
                if nf is None or nf.match(n)
            ]
            return 200, {"status": "success", "data": result}
        if path == "/api/v1/query":
            return self.query(params)
        if path == "/api/v1/query_range":
            return self.query_range(params)
        if path == "/api/v1/series":
            return self.series(params)
        if path == "/api/v1/labels":
            return self.labels(params)
        m = re.fullmatch(r"/api/v1/label/([^/]+)/values", path)
        if m:
            return self.label_values(m.group(1), params)
        m = re.fullmatch(
            r"/api/v1/search/(metric_names|label_names|label_values)", path
        )
        if m:
            return self.search(m.group(1), params)
        if path == "/api/v1/metadata":
            # api.go metricMetadata: {family: [{type, help, unit}]};
            # scrape-accumulated metadata merges under the static dict
            merged: dict = {}
            if self.scrape_manager is not None:
                merged.update(self.scrape_manager.metadata)
            merged.update(self.metadata)
            data = {
                k: v if isinstance(v, list) else [v] for k, v in merged.items()
            }
            return 200, {"status": "success", "data": data}
        if path == "/api/v1/format_query":
            from prometheus_spark.parser.printer import format_query

            try:
                return 200, {
                    "status": "success",
                    "data": format_query(params["query"][0]),
                }
            except Exception as e:  # noqa: BLE001 — API boundary
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": str(e)}
        if path == "/api/v1/rules":
            return self.rules(params)
        if path == "/api/v1/alerts":
            return self.alerts()
        if path == "/api/v1/targets":
            return self.targets()
        if path == "/api/v1/query_exemplars":
            return self.query_exemplars(params)
        if path == "/api/v1/status/tsdb":
            return self.tsdb_stats()
        if path == "/api/v1/status/buildinfo":
            return self.buildinfo()
        if path == "/api/v1/status/config":
            return 200, {"status": "success", "data": {"yaml": self.config_yaml}}
        if path == "/api/v1/status/flags":
            return 200, {"status": "success", "data": dict(self.flags)}
        if path == "/api/v1/status/runtimeinfo":
            import time as _time

            return 200, {
                "status": "success",
                "data": {
                    "startTime": "",
                    "CWD": "",
                    "reloadConfigSuccess": True,
                    "lastConfigTime": "",
                    "corruptionCount": 0,
                    "goroutineCount": 0,
                    "GOMAXPROCS": 0,
                    "storageRetention": "",
                    "serverTime": _time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", _time.gmtime()
                    ),
                },
            }
        if path == "/api/v1/parse_query":
            from prometheus_spark.parser.astjson import parse_query_to_dict

            try:
                return 200, {
                    "status": "success",
                    "data": parse_query_to_dict(params["query"][0]),
                }
            except Exception as e:  # noqa: BLE001 — API boundary
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": str(e)}
        if path == "/api/v1/admin/tsdb/delete_series":
            return self.delete_series(params)
        if path == "/api/v1/admin/tsdb/clean_tombstones":
            return self.clean_tombstones()
        if path == "/api/v1/admin/tsdb/snapshot":
            return self.snapshot(params)
        if path == "/api/v1/scrape_pools":
            # api.go:1215 scrapePools: sorted distinct job names
            pools = sorted({
                t.target_labels().get("job", "")
                for t in (
                    self.scrape_manager.targets
                    if self.scrape_manager is not None else []
                )
            } - {""})
            return 200, {"status": "success",
                         "data": {"scrapePools": pools}}
        if path == "/api/v1/targets/metadata":
            return self.targets_metadata(params)
        if path == "/api/v1/targets/relabel_steps":
            # api.go:1396 targetRelabelSteps: step-by-step relabel debug —
            # each rule's output label set and whether the target survives
            import json as _json

            from prometheus_spark.sources.relabel import process_labels

            pool = params.get("scrapePool", [""])[0]
            if not pool:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": "no scrapePool parameter provided"}
            raw = params.get("labels", [""])[0]
            if not raw:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": "no labels parameter provided"}
            try:
                lbls = _json.loads(raw)
                assert isinstance(lbls, dict)
            except (ValueError, AssertionError) as e:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": f"error parsing labels: {e}"}
            rules = getattr(self, "relabel_configs_by_pool", {}).get(pool)
            if rules is None:
                return 400, {"status": "error", "errorType": "bad_data",
                             "error": f"error retrieving scrape config: "
                                      f"unknown pool {pool!r}"}
            steps = []
            keep, cur = True, dict(lbls)
            for rule in rules:
                if keep:
                    out = process_labels(cur, [rule])
                    if out is None:
                        keep = False
                    else:
                        cur = out
                steps.append({
                    "rule": {
                        "action": rule.action,
                        "sourceLabels": rule.source_labels,
                        "separator": rule.separator,
                        "regex": rule.regex,
                        "targetLabel": rule.target_label,
                        "replacement": rule.replacement,
                        "modulus": rule.modulus,
                    },
                    "output": dict(cur) if keep else {},
                    "keep": keep,
                })
            return 200, {"status": "success", "data": {"steps": steps}}
        if path == "/api/v1/openapi.yaml":
            # api.go ServeOpenAPI (web/api/v1/openapi.go:101): the spec
            # is generated from the actual route table, so it never
            # drifts from what handle() dispatches
            import yaml as _yaml

            paths = {}
            for route, (summary, method) in sorted(_ROUTES.items()):
                paths[route] = {
                    method: {
                        "summary": summary,
                        "responses": {"200": {"description": "success"}},
                    }
                }
            spec = {
                "openapi": "3.0.3",
                "info": {"title": "Prometheus API (prometheus_spark)",
                         "version": "1"},
                "paths": paths,
            }
            return 200, {"__text__": _yaml.safe_dump(spec, sort_keys=True),
                         "__content_type__": "application/yaml"}
        if path == "/api/v1/status/walreplay":
            # api.go serveWALReplayStatus: batch storage has no replaying
            # WAL — report a completed replay (min=max=current)
            return 200, {
                "status": "success",
                "data": {"min": 0, "max": 0, "current": 0},
            }
        if path == "/api/v1/notifications":
            # api.go notifications: active UI notifications (config
            # reload failures etc.) — from the NotificationCenter when
            # attached, else the static active_notifications list
            nc = getattr(self, "notification_center", None)
            items = (
                nc.active() if nc is not None
                else list(getattr(self, "active_notifications", []))
            )
            return 200, {"status": "success",
                         "data": {"notifications": items}}
        if path == "/api/v1/alertmanagers":
            # api.go:1490 alertmanagers: active + dropped discovery state
            nt = getattr(self, "notifier", None)
            return 200, {
                "status": "success",
                "data": {
                    "activeAlertmanagers": [
                        {"url": u} for u in (nt.alertmanagers() if nt else [])
                    ],
                    "droppedAlertmanagers": [
                        {"url": u}
                        for u in (nt.dropped_alertmanagers() if nt else [])
                    ],
                },
            }
        if path == "/api/v1/status/tsdb/blocks":
            # api.go:1961 serveTSDBBlocks over the partitioned block
            # layout: one meta per t_bucket directory
            if not getattr(self, "blocks_dir", None):
                return 200, {"status": "success", "data": {"blocks": []}}
            from prometheus_spark.storage.compact import (
                DEFAULT_BLOCK_MS,
                list_buckets,
            )

            blocks = [
                {
                    "ulid": f"t_bucket={b}",
                    "minTime": b * DEFAULT_BLOCK_MS,
                    "maxTime": (b + 1) * DEFAULT_BLOCK_MS,
                }
                for b in list_buckets(self.blocks_dir)
            ]
            return 200, {"status": "success", "data": {"blocks": blocks}}
        if path == "/api/v1/features":
            # features registry (api.go:1888, util/features/features.go):
            # category → {feature: enabled}; every registered construct in
            # this engine is always on (no feature flags gate them here)
            from prometheus_spark.parser.ast import AGGREGATORS
            from prometheus_spark.parser.functions import FUNCTIONS

            keywords = [
                "offset", "by", "without", "on", "ignoring", "group_left",
                "group_right", "bool", "start", "end", "anchored",
                "smoothed", "fill", "fill_left", "fill_right", "step",
                "and", "or", "unless", "atan2",
            ]
            data = {
                "promql": {k: True for k in keywords}
                | {"duration_expr": True},
                "promql_operators": {
                    o: True
                    for o in ["+", "-", "*", "/", "%", "^", "==", "!=",
                              ">", "<", ">=", "<=", "and", "or", "unless",
                              "atan2"]
                }
                | {a: True for a in sorted(AGGREGATORS)},
                "promql_functions": {f: True for f in sorted(FUNCTIONS)},
            }
            return 200, {"status": "success", "data": data}
        return 404, {"status": "error", "errorType": "bad_data",
                     "error": f"unknown endpoint {path}"}

    # -- HTTP shim -----------------------------------------------------
    def server(self, host: str = "127.0.0.1", port: int = 0):
        """Build (not start) a threaded HTTP server over ``handle``;
        also serves /federate as text exposition."""
        import http.server
        import socketserver

        api = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _respond(self):
                parsed = urlparse(self.path)
                params = parse_qs(parsed.query)
                if self.command == "POST":
                    ln = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(ln)
                    if parsed.path == "/api/v1/write" and getattr(
                        api, "remote_write_receiver", None
                    ) is not None:
                        # same-server ingest (api.go:483): v1/v2 by
                        # Content-Type, written-stats headers for v2
                        ct = self.headers.get("Content-Type", "")
                        try:
                            api.remote_write_receiver.handle_body(
                                raw, content_type=ct
                            )
                        except Exception as e:  # noqa: BLE001 — 400
                            self.send_error(400, str(e)[:200])
                            return
                        self.send_response(204)
                        if "io.prometheus.write.v2.request" in ct.lower():
                            st = getattr(
                                api.remote_write_receiver, "last_stats", {}
                            )
                            for k, v in (
                                ("Samples", st.get("samples", 0)),
                                ("Histograms", st.get("histograms", 0)),
                                ("Exemplars", st.get("exemplars", 0)),
                            ):
                                self.send_header(
                                    f"X-Prometheus-Remote-Write-{k}-Written",
                                    str(v),
                                )
                        self.end_headers()
                        return
                    if parsed.path == "/api/v1/otlp/v1/metrics" and getattr(
                        api, "otlp_receiver", None
                    ) is not None:
                        # api.go:484 OTLP write endpoint on the main server
                        try:
                            api.otlp_receiver.handle_body(raw)
                        except Exception as e:  # noqa: BLE001 — 400
                            self.send_error(400, str(e)[:200])
                            return
                        self.send_response(200)
                        self.send_header(
                            "Content-Type", "application/x-protobuf"
                        )
                        self.end_headers()
                        return
                    if parsed.path == "/api/v1/read":
                        # remote read: snappy+protobuf in; SAMPLES or a
                        # STREAMED_XOR_CHUNKS frame stream out, per the
                        # request's accepted_response_types
                        # (api.go:482, storage/remote/read_handler.go:100)
                        from prometheus_spark.sources.remote_read import (
                            CONTENT_TYPE_SAMPLES,
                            serve_read_negotiated,
                        )

                        try:
                            payload, ctype = serve_read_negotiated(
                                api.engine.samples, raw
                            )
                        except Exception as e:  # noqa: BLE001 — API boundary
                            self.send_response(400)
                            self.end_headers()
                            self.wfile.write(str(e).encode())
                            return
                        self.send_response(200)
                        self.send_header("Content-Type", ctype)
                        if ctype == CONTENT_TYPE_SAMPLES:
                            self.send_header("Content-Encoding", "snappy")
                        self.send_header(
                            "Content-Length", str(len(payload))
                        )
                        self.end_headers()
                        self.wfile.write(payload)
                        return
                    for k, vs in parse_qs(raw.decode()).items():
                        params.setdefault(k, []).extend(vs)
                if parsed.path in ("/-/healthy", "/-/ready"):
                    # web.go:  GET /-/healthy | /-/ready — plain text
                    word = "Healthy" if parsed.path == "/-/healthy" else "Ready"
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; charset=utf-8")
                    self.end_headers()
                    self.wfile.write(
                        f"Prometheus Server is {word}.\n".encode()
                    )
                    return
                if parsed.path in ("/-/reload", "/-/quit"):
                    # lifecycle endpoints are opt-in (--web.enable-lifecycle)
                    if self.command != "POST" and self.command != "PUT":
                        self.send_error(405)
                        return
                    if not getattr(api, "lifecycle_enabled", False):
                        self.send_response(403)
                        self.end_headers()
                        self.wfile.write(
                            b"Lifecycle API is not enabled.\n"
                        )
                        return
                    if parsed.path == "/-/reload":
                        fn = getattr(api, "reload_fn", None)
                        try:
                            if fn is not None:
                                fn()
                        except Exception as e:  # noqa: BLE001 — surface
                            self.send_response(500)
                            self.end_headers()
                            self.wfile.write(str(e).encode())
                            return
                        self.send_response(200)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"Requesting termination.\n")
                    import threading as _threading

                    _threading.Thread(
                        target=self.server.shutdown, daemon=True
                    ).start()
                    return
                if parsed.path == "/metrics":
                    # the server's own telemetry (self-scrape surface)
                    body = api.metrics_text().encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if parsed.path == "/federate":
                    from prometheus_spark.parser import parse_expr
                    from prometheus_spark.sources.federate import federate

                    matcher_dicts = []
                    for m in params.get("match[]", []):
                        node = parse_expr(m)
                        matcher_dicts.append(
                            {mm.name: mm.value for mm in node.matchers}
                        )
                    now_ms = (
                        _parse_time_ms(params["time"][0])
                        if "time" in params
                        else 0
                    )
                    # protobuf negotiation serves native histograms;
                    # text cannot carry them (federate.go:190-200)
                    accept = self.headers.get("Accept", "")
                    if "application/vnd.google.protobuf" in accept:
                        from prometheus_spark.sources.federate import (
                            federate_protobuf,
                        )

                        body = federate_protobuf(
                            api.engine.samples, matcher_dicts, now_ms
                        )
                        self.send_response(200)
                        self.send_header(
                            "Content-Type",
                            "application/vnd.google.protobuf; "
                            "proto=io.prometheus.client.MetricFamily; "
                            "encoding=delimited",
                        )
                        self.end_headers()
                        self.wfile.write(body)
                        return
                    lines = federate(
                        api.engine.samples, matcher_dicts, now_ms
                    ).collect()
                    text = "\n".join(r["line"] for r in lines) + "\n"
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                    self.end_headers()
                    self.wfile.write(text.encode())
                    return
                if parsed.path == "/api/v1/notifications/live":
                    # api.go:2044 notificationsSSE: text/event-stream of
                    # notification JSON; 204 when subscriber cap reached
                    nc = getattr(api, "notification_center", None)
                    sub = nc.subscribe() if nc is not None else None
                    if sub is None:
                        self.send_response(204)
                        self.end_headers()
                        return
                    import queue as _queue

                    q, unsubscribe = sub
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    try:
                        while True:
                            try:
                                n = q.get(timeout=15.0)
                                self.wfile.write(
                                    f"data: {json.dumps(n)}\n\n".encode()
                                )
                            except _queue.Empty:  # keep-alive comment
                                self.wfile.write(b": keepalive\n\n")
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError, OSError):
                        pass
                    finally:
                        unsubscribe()
                    return
                code, resp = api.handle(parsed.path, params)
                if isinstance(resp, dict) and "__text__" in resp:
                    payload = resp["__text__"].encode()
                    self.send_response(code)
                    self.send_header(
                        "Content-Type",
                        resp.get("__content_type__", "text/plain"),
                    )
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                if isinstance(resp, dict) and "__ndjson__" in resp:
                    # search stream contract: one JSON document per line
                    payload = (
                        "\n".join(json.dumps(ln) for ln in resp["__ndjson__"])
                        + "\n"
                    ).encode()
                    self.send_response(code)
                    self.send_header("Content-Type", "application/x-ndjson")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                payload = json.dumps(resp).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            do_GET = do_POST = _respond

            def log_message(self, *a):
                pass

        class Server(socketserver.ThreadingMixIn, http.server.HTTPServer):
            daemon_threads = True

        return Server((host, port), Handler)
