"""Active-query tracker — crash-diagnostic log of in-flight queries.

Mirrors promql/query_logger.go: a fixed-size slotted mmap file
(entrySize=1000 bytes per slot, query_logger.go:48) holding one JSON
``{"query": ..., "timestamp_sec": ...},`` entry per in-flight query;
slots are zeroed on completion, so after a crash the surviving non-zero
slots are exactly the queries that were running
(query_logger.go:90 ``logUnfinishedQueries`` / ``parseBrokenJSON``).
Also caps query concurrency via the slot pool, like the reference's
``getNextIndex`` channel."""

from __future__ import annotations

import json
import mmap
import os
import queue
import time
from typing import Optional

ENTRY_SIZE = 1000  # query_logger.go:48
FILENAME = "queries.active"


def parse_broken_json(data: bytes) -> list[dict]:
    """query_logger.go:51 parseBrokenJSON: strip NUL padding, close the
    JSON array, tolerate a dangling comma."""
    text = data.decode("utf-8", errors="replace").replace("\x00", "")
    if len(text) <= 1:
        return []
    text = text[:-1] + "]"
    try:
        return json.loads(text)
    except ValueError:
        return []


class ActiveQueryTracker:
    def __init__(self, storage_dir: str, max_concurrent: int = 20):
        os.makedirs(storage_dir, exist_ok=True)
        self.path = os.path.join(storage_dir, FILENAME)
        self.max_concurrent = max_concurrent
        # queries left over from a crashed previous run
        self.unfinished: list[dict] = []
        if os.path.exists(self.path):
            with open(self.path, "rb") as f:
                self.unfinished = parse_broken_json(f.read())
        size = 1 + ENTRY_SIZE * (max_concurrent + 1)
        with open(self.path, "wb") as f:
            f.write(b"\x00" * size)
        self._f = open(self.path, "r+b")
        self._mm = mmap.mmap(self._f.fileno(), size)
        self._mm[0:1] = b"["
        self._slots: "queue.Queue[int]" = queue.Queue()
        for i in range(max_concurrent):
            self._slots.put(1 + i * ENTRY_SIZE)

    def insert(self, query: str, timeout_s: Optional[float] = None) -> int:
        """Claim a slot (blocks when max_concurrent queries are active —
        the concurrency gate, engine.go:768) and write the entry."""
        offset = self._slots.get(timeout=timeout_s)
        ts = int(time.time())

        def encode(q: str) -> bytes:
            return json.dumps({"query": q, "timestamp_sec": ts}).encode() + b","

        entry = encode(query)
        # The limit is BYTES of encoded JSON, not characters of the query:
        # escapes (quotes, backslashes, \uXXXX) expand, so trim the query
        # until the encoded entry fits — a char-count trim can still spill
        # into the neighbouring slot (the reference trims by byte budget).
        q = query
        while len(entry) > ENTRY_SIZE and q:
            overshoot = len(entry) - ENTRY_SIZE
            q = q[: max(0, len(q) - max(overshoot, 1))]
            entry = encode(q)
        self._mm[offset:offset + len(entry)] = entry
        return offset

    def delete(self, offset: int) -> None:
        self._mm[offset:offset + ENTRY_SIZE] = b"\x00" * ENTRY_SIZE
        self._slots.put(offset)

    def active(self) -> list[dict]:
        return parse_broken_json(self._mm[:])

    def close(self) -> None:
        self._mm.flush()
        self._mm.close()
        self._f.close()
