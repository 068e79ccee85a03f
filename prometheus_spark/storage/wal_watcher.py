"""Live WAL tailing for the remote-write sender.

Reference: ``tsdb/wlog/watcher.go`` (the remote-write queue manager's
WAL consumer) — behavior re-derived, not translated.  The reference
watcher follows the write-ahead log as it grows: it reads the OPEN
segment incrementally (new records become visible as the writer
appends/fsyncs), rolls to the next segment when one appears, and
resumes from its persisted position after a restart with at-least-once
delivery (anything after the last committed position is re-read).

The agent's spool forwarder (``prometheus_spark.agent``) ships whole
files on a tick; this watcher removes that granularity: a sample
appended MID-segment forwards on the next poll, without waiting for
the segment to complete.

Incremental framing: ``incremental_records`` parses as many complete
records as the bytes allow and reports the committed offset — the
start of the first incomplete record (or unwritten/zero-padded tail),
so a later re-read from that offset never loses or splits a record.
Page padding (a zero type byte) is only committed once a subsequent
record completes past it; at the true tail it is indistinguishable
from unwritten space and is simply re-examined next poll.

Scale note: the watcher is the LATENCY path — it decodes only the
fresh tail bytes driver-side and hands small row batches to the
forward callback.  Bulk WAL ingestion (replay, backfill) stays on the
distributed ``storage.wal.read_wal`` path.
"""

from __future__ import annotations

import json
import os
import struct
import threading
from typing import Callable, Optional

from prometheus_spark.storage.wal import (
    _FRAG_FIRST,
    _FRAG_FULL,
    _FRAG_LAST,
    _SNAPPY_FLAG,
    _ZSTD_FLAG,
    REC_SAMPLES,
    REC_SERIES,
    WAL_PAGE,
    decode_samples_record,
    decode_series_record,
    wal_series_map,
)


def incremental_records(buf: bytes, start: int = 0) -> tuple[list[bytes], int]:
    """Complete records in ``buf[start:]`` → (records, committed).

    ``committed`` is the offset up to which records are durably parsed:
    re-reading from it later re-yields nothing already returned and
    recovers any record that was only partially written at ``len(buf)``.
    Offsets are absolute segment positions (page arithmetic needs them).
    """
    recs: list[bytes] = []
    pos = committed = start
    partial = bytearray()
    compressed = False
    n = len(buf)
    while pos < n:
        page_end = min(pos - pos % WAL_PAGE + WAL_PAGE, n)
        while pos < page_end:
            t = buf[pos]
            if t == 0:  # rest of page: padding or unwritten tail
                pos = page_end
                break
            if pos + 7 > n:
                return recs, committed  # truncated fragment header
            frag = t & 0x07
            if t & _ZSTD_FLAG:
                raise ValueError("zstd-compressed WAL is not supported")
            ln = struct.unpack_from(">H", buf, pos + 1)[0]
            if pos + 7 + ln > n:
                return recs, committed  # truncated fragment payload
            data = buf[pos + 7 : pos + 7 + ln]
            pos += 7 + ln
            if frag in (_FRAG_FULL, _FRAG_FIRST):
                partial = bytearray(data)
                compressed = bool(t & _SNAPPY_FLAG)
            else:
                partial += data
            if frag in (_FRAG_FULL, _FRAG_LAST):
                rec = bytes(partial)
                if compressed or (t & _SNAPPY_FLAG):
                    from prometheus_spark.sources.remote_write import (
                        snappy_decode,
                    )

                    rec = snappy_decode(rec)
                recs.append(rec)
                committed = pos  # record complete — safe resume point
    return recs, committed


def _live_segments(data_dir: str) -> list[tuple[int, str]]:
    """Numbered live segments (no checkpoint dirs) as (index, path)."""
    wal_dir = os.path.join(data_dir, "wal")
    if not os.path.isdir(wal_dir):
        wal_dir = data_dir
    out = []
    for name in sorted(os.listdir(wal_dir)):
        if name.isdigit():
            out.append((int(name), os.path.join(wal_dir, name)))
    return out


class WALWatcher:
    """Tail a wlog directory and forward new samples incrementally.

    ``forward(rows)`` receives ``[(labels, t_ms, value_or_hist_dict)]``
    — directly encodable by ``remote_write.encode_write_request``
    (stale markers arrive as NaN values, exactly what the reference
    watcher ships).  The position checkpoint persists AFTER a
    successful forward: a crash between send and persist re-sends that
    batch on restart — at-least-once, the reference's stance.
    """

    def __init__(
        self,
        data_dir: str,
        forward: Callable,
        position_path: Optional[str] = None,
        from_start: bool = True,
    ):
        self.data_dir = data_dir
        self.forward = forward
        self.position_path = position_path or os.path.join(
            data_dir, ".watcher_position"
        )
        # series refs resolve against EVERY series record written so
        # far (older segments + checkpoint dirs hold live series state)
        self._series: dict[int, dict] = {}
        self._series_scanned = False
        self._seg = -1
        self._offset = 0
        self._from_start = from_start
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._load_position()

    # -- position ---------------------------------------------------------
    def _load_position(self) -> None:
        try:
            with open(self.position_path) as f:
                p = json.load(f)
            self._seg, self._offset = int(p["segment"]), int(p["offset"])
        except (OSError, ValueError, KeyError):
            self._seg, self._offset = -1, 0

    def _persist_position(self) -> None:
        tmp = self.position_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"segment": self._seg, "offset": self._offset}, f)
        os.replace(tmp, self.position_path)

    # -- polling ------------------------------------------------------------
    def _ensure_series(self) -> None:
        if not self._series_scanned:
            # one full scan resolves refs born before our position
            # (watcher.go reads series records from the last checkpoint
            # and every segment it tails for the same reason)
            try:
                self._series.update(wal_series_map(self.data_dir))
            except FileNotFoundError:
                pass
            self._series_scanned = True

    def poll(self) -> int:
        """Read everything new, forward it, persist position.
        → number of sample rows forwarded."""
        segs = _live_segments(self.data_dir)
        if not segs:
            return 0
        self._ensure_series()
        if self._seg < 0:
            if self._from_start:
                self._seg, self._offset = segs[0][0], 0
            else:  # tail-only: start at the end of the open segment
                idx, path = segs[-1]
                self._seg = idx
                self._offset = os.path.getsize(path)
        rows: list = []
        new_seg, new_offset = self._seg, self._offset
        for idx, path in segs:
            if idx < self._seg:
                continue
            start = self._offset if idx == self._seg else 0
            with open(path, "rb") as f:
                buf = f.read()
            recs, committed = incremental_records(buf, start)
            for rec in recs:
                self._dispatch(rec, rows)
            if idx == segs[-1][0]:
                new_seg, new_offset = idx, committed
            else:
                # closed segment fully consumed — roll forward
                new_seg, new_offset = idx + 1, 0
        # position advances only AFTER a successful forward: a failed or
        # crashed send re-reads from the old position (at-least-once)
        if rows:
            self.forward(rows)
        self._seg, self._offset = new_seg, new_offset
        self._persist_position()
        return len(rows)

    def _dispatch(self, rec: bytes, rows: list) -> None:
        from prometheus_spark.storage.wal import (
            REC_FLOAT_HISTOGRAM_SAMPLES,
            REC_HISTOGRAM_SAMPLES,
            decode_histogram_samples_record,
        )

        if not rec:
            return
        rt = rec[0]
        if rt == REC_SERIES:
            for ref, labels in decode_series_record(rec):
                self._series[ref] = labels
        elif rt == REC_SAMPLES:
            for ref, t, v in decode_samples_record(rec):
                labels = self._series.get(ref)
                if labels is not None:
                    rows.append((labels, t, v))
        elif rt in (REC_HISTOGRAM_SAMPLES, REC_FLOAT_HISTOGRAM_SAMPLES):
            for ref, t, h in decode_histogram_samples_record(rec):
                labels = self._series.get(ref)
                if labels is not None:
                    rows.append((labels, t, h))
        # tombstones/exemplars/metadata are not remote-write payloads

    # -- lifecycle ----------------------------------------------------------
    def start(self, interval_s: float = 0.25) -> threading.Thread:
        def loop():
            while not self._stop.wait(interval_s):
                try:
                    self.poll()
                except Exception:
                    pass  # transient IO/network — retried next poll

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self._thread

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)


def remote_write_forwarder(url: str) -> Callable:
    """forward-callback shipping rows as one v1 WriteRequest POST."""
    import urllib.request

    from prometheus_spark.sources.remote_write import encode_write_request

    def forward(rows) -> None:
        body = encode_write_request(rows)
        req = urllib.request.Request(
            url,
            data=body,
            headers={
                "Content-Encoding": "snappy",
                "Content-Type": "application/x-protobuf",
                "X-Prometheus-Remote-Write-Version": "0.1.0",
            },
        )
        urllib.request.urlopen(req, timeout=30).read()

    return forward
