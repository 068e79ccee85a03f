"""Server notification center — startup/config-reload banners pushed to
the UI (reference util/notifications/notifications.go: Notification
{text, date, active}, live subscribers over channels, capped subscriber
count; served by /api/v1/notifications and streamed by
/api/v1/notifications/live as server-sent events)."""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional


def _now_rfc3339() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


class NotificationCenter:
    def __init__(self, max_subscribers: int = 16):
        self.max_subscribers = max_subscribers
        self._lock = threading.Lock()
        self._active: list[dict] = []
        self._subs: list["queue.Queue[dict]"] = []

    def add(self, text: str) -> None:
        """notifications.go AddNotification: record an active
        notification and fan it out to live subscribers."""
        n = {"text": text, "date": _now_rfc3339(), "active": True}
        with self._lock:
            self._active.append(n)
            subs = list(self._subs)
        for q in subs:
            q.put(n)

    def delete(self, text: str) -> None:
        """notifications.go:122 DeleteNotification: drop the first match
        and notify subscribers with active=false."""
        n = {"text": text, "date": _now_rfc3339(), "active": False}
        with self._lock:
            for i, existing in enumerate(self._active):
                if existing["text"] == text:
                    del self._active[i]
                    break
            subs = list(self._subs)
        for q in subs:
            q.put(n)

    def active(self) -> list[dict]:
        with self._lock:
            return list(self._active)

    def subscribe(self) -> Optional[tuple["queue.Queue[dict]", callable]]:
        """Returns (queue pre-seeded with current actives, unsubscribe)
        or None when the subscriber cap is reached
        (notifications.go:158)."""
        q: "queue.Queue[dict]" = queue.Queue()
        with self._lock:
            if len(self._subs) >= self.max_subscribers:
                return None
            for n in self._active:
                q.put(n)
            self._subs.append(q)

        def unsubscribe():
            with self._lock:
                if q in self._subs:
                    self._subs.remove(q)

        return q, unsubscribe
