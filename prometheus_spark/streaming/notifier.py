"""Alertmanager notification delivery.

Mirrors the reference notifier (notifier/manager.go:90 ``NewManager``,
notifier/sendloop.go:48 ``newSendLoop``, notifier/alert.go:25 ``Alert``):
per-alertmanager bounded queues with oldest-first eviction, batched
HTTP POSTs to ``/api/v2/alerts``, alert relabeling + external labels
applied once on Send (notifier/alert.go:71 ``relabelAlerts``), and the
rules-manager side ``needsSending`` / ``ValidUntil`` resend logic
(rules/alerting.go:102,618; rules/manager.go:473 ``SendAlerts``).

Alert cardinality is inherently small (it is the firing set, not the
sample stream), so this is a driver-side component by design — the same
stance the reference takes by keeping active alerts in rule-manager
memory.  The heavy path (rule expression evaluation) stays distributed
in ``streaming/rules.py``.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Optional

from prometheus_spark.sources.relabel import RelabelConfig, process_labels


def _rfc3339(ms: Optional[int]) -> str:
    if ms is None:
        ms = 0
    s, rem = divmod(int(ms), 1000)
    return time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(s)) + f".{rem:03d}Z"


@dataclass
class Alert:
    """notifier/alert.go:25 — labels define identity; annotations don't."""

    labels: dict
    annotations: dict = field(default_factory=dict)
    starts_at_ms: Optional[int] = None
    ends_at_ms: Optional[int] = None
    generator_url: str = ""

    def resolved_at(self, ts_ms: int) -> bool:
        return self.ends_at_ms is not None and self.ends_at_ms <= ts_ms

    def to_v2(self) -> dict:
        out = {
            "labels": dict(self.labels),
            "annotations": dict(self.annotations),
            "startsAt": _rfc3339(self.starts_at_ms),
        }
        # unresolved alerts must NOT send a concrete past endsAt — the
        # reference marshals Go's zero time, which Alertmanager reads as
        # "still firing, apply resend timeout"; the epoch would read as
        # already-resolved.  Omitting the field has the same semantics.
        if self.ends_at_ms is not None:
            out["endsAt"] = _rfc3339(self.ends_at_ms)
        if self.generator_url:
            out["generatorURL"] = self.generator_url
        return out


class _SendLoop:
    """One queue + drain loop per alertmanager (notifier/sendloop.go:48).

    The queue is capacity-bounded; when full the OLDEST alerts are
    evicted (sendloop.go:94-99) — resolved/newer state beats stale state.
    """

    def __init__(
        self,
        url: str,
        queue_capacity: int = 10_000,
        max_batch_size: int = 256,
        timeout_s: float = 10.0,
        post_fn: Optional[Callable[[str, bytes], int]] = None,
    ):
        self.url = url.rstrip("/")
        self.post_url = self.url + "/api/v2/alerts"  # alertmanager.go:87 postPath
        self.queue_capacity = queue_capacity
        self.max_batch_size = max_batch_size
        self.timeout_s = timeout_s
        self._post_fn = post_fn or self._http_post
        self._queue: list[Alert] = []
        self._lock = threading.Lock()
        self.sent = 0
        self.errors = 0
        self.dropped = 0

    def _http_post(self, url: str, body: bytes) -> int:
        req = urllib.request.Request(
            url, data=body, method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.status

    def add(self, alerts: list[Alert]) -> None:
        with self._lock:
            if len(alerts) > self.queue_capacity:
                # batch alone exceeds capacity: keep the newest
                # (sendloop.go:86-90)
                self.dropped += len(alerts) - self.queue_capacity
                alerts = alerts[len(alerts) - self.queue_capacity:]
            overflow = len(self._queue) + len(alerts) - self.queue_capacity
            if overflow > 0:  # evict oldest (sendloop.go:94-99)
                self.dropped += overflow
                self._queue = self._queue[overflow:]
            self._queue.extend(alerts)

    def _next_batch(self) -> list[Alert]:
        with self._lock:
            batch = self._queue[: self.max_batch_size]
            self._queue = self._queue[self.max_batch_size:]
        return batch

    def queue_len(self) -> int:
        with self._lock:
            return len(self._queue)

    def flush(self) -> None:
        """Drain synchronously (sendloop.go:146 drainQueue)."""
        while self.queue_len() > 0:
            batch = self._next_batch()
            body = json.dumps([a.to_v2() for a in batch]).encode()
            try:
                status = self._post_fn(self.post_url, body)
                if 200 <= status < 300:
                    self.sent += len(batch)
                else:
                    self.errors += len(batch)
            except Exception:
                self.errors += len(batch)


class NotifierManager:
    """notifier/manager.go:90 — fans alerts out to every configured
    alertmanager after relabeling; exposes Alertmanagers() /
    DroppedAlertmanagers() for the /api/v1/alertmanagers endpoint."""

    def __init__(
        self,
        alertmanager_urls: list[str],
        external_labels: Optional[dict] = None,
        relabel_configs: Optional[list[RelabelConfig]] = None,
        alertmanager_relabel: Optional[list[RelabelConfig]] = None,
        queue_capacity: int = 10_000,
        max_batch_size: int = 256,
        post_fn: Optional[Callable[[str, bytes], int]] = None,
        alertmanager_sets: Optional[list[tuple[list[str], list]]] = None,
    ):
        self.external_labels = dict(external_labels or {})
        self.relabel_configs = list(relabel_configs or [])
        self.loops: list[_SendLoop] = []
        self.dropped_ams: list[str] = []
        # alertmanager-set relabeling decides which AMs participate
        # (alertmanagerset.go; acts on {"__address__": host}).  Each SET
        # carries its own relabel list — one entry's rules never drop
        # another entry's targets.  The flat (urls, shared-relabel) form
        # is kept as the single-set special case.
        sets = (
            [(list(urls), list(rls or [])) for urls, rls in alertmanager_sets]
            if alertmanager_sets is not None
            else [(list(alertmanager_urls), list(alertmanager_relabel or []))]
        )
        for urls, rls in sets:
            for url in urls:
                host = url.split("://", 1)[-1].split("/", 1)[0]
                kept = process_labels({"__address__": host}, rls)
                if kept is None:
                    self.dropped_ams.append(url)
                    continue
                self.loops.append(
                    _SendLoop(url, queue_capacity, max_batch_size, post_fn=post_fn)
                )
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- manager.go:259 Send ------------------------------------------------
    def send(self, *alerts: Alert) -> None:
        relabeled: list[Alert] = []
        for a in alerts:
            lset = dict(a.labels)
            # external labels fill only unset names (alert.go:76-81)
            for k, v in self.external_labels.items():
                lset.setdefault(k, v)
            lset = process_labels(lset, self.relabel_configs)
            if lset is None:
                continue
            relabeled.append(
                Alert(lset, a.annotations, a.starts_at_ms, a.ends_at_ms,
                      a.generator_url)
            )
        if not relabeled:
            return
        for loop in self.loops:
            loop.add(relabeled)

    def flush(self) -> None:
        for loop in self.loops:
            loop.flush()

    def alertmanagers(self) -> list[str]:
        return [l.post_url for l in self.loops]

    def dropped_alertmanagers(self) -> list[str]:
        return list(self.dropped_ams)

    # -- background drain (sendloop.go:115 notifyWork) ----------------------
    def start(self, interval_s: float = 1.0) -> threading.Thread:
        def run():
            while not self._stop.is_set():
                self.flush()
                self._stop.wait(interval_s)
            self.flush()  # drain on shutdown (sendloop.go:124 stop)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self._thread

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)


def send_alerts(
    notifier: NotifierManager,
    rule_alerts: list,
    ts_ms: int,
    interval_ms: int,
    resend_delay_ms: int = 60_000,
    last_sent: Optional[dict] = None,
    external_url: str = "",
) -> dict:
    """rules/manager.go:473 ``SendAlerts`` + rules/alerting.go:618
    ``sendAlerts``: convert the rules-engine alert tuples
    (name, labels, annotations, state, active_since_ms, value) into
    notifier Alerts, applying the needsSending resend gate
    (alerting.go:102) and ``ValidUntil = ts + 4*max(interval,
    resend_delay)`` as EndsAt for still-firing alerts
    (alerting.go:625, manager.go:488).

    ``last_sent`` carries {labels-sig: last_sent_ms} across ticks;
    the updated map is returned.
    """
    from prometheus_spark.model.labels import sig_for

    last_sent = dict(last_sent or {})
    out: list[Alert] = []
    valid_until = ts_ms + 4 * max(interval_ms, resend_delay_ms)
    for name, labels, annotations, state, active_since, value in rule_alerts:
        if state == "pending":  # alerting.go:103-105
            continue
        sig = sig_for(labels)
        prev = last_sent.get(sig)
        if (state != "resolved" and prev is not None
                and ts_ms - prev < resend_delay_ms):
            continue
        last_sent[sig] = ts_ms
        out.append(
            Alert(
                labels=dict(labels),
                annotations=dict(annotations),
                starts_at_ms=active_since,
                ends_at_ms=ts_ms if state == "resolved" else valid_until,
                generator_url=external_url,
            )
        )
    if out:
        notifier.send(*out)
    return last_sent
