"""WAL watcher: live tailing + at-least-once resume.

Mirrors tsdb/wlog/watcher_test.go scenarios (TestWatcher_Tail,
TestReadToEndNoCheckpoint, TestReadToEndWithCheckpoint and the restart
semantics) against the Python segment framing.  Pure driver-side — no
SparkSession needed.
"""

from __future__ import annotations

import os

from prometheus_spark.storage.wal import (
    encode_samples_record,
    encode_series_record,
    write_wal_segment,
)
from prometheus_spark.storage.wal_watcher import (
    WALWatcher,
    incremental_records,
)


def _mk_wal(tmp_path):
    d = tmp_path / "data" / "wal"
    d.mkdir(parents=True)
    return str(tmp_path / "data"), d


def _series_rec(ref, name):
    return encode_series_record([(ref, {"__name__": name, "job": "j"})])


def _samples_rec(items):
    return encode_samples_record(items)


def _collecting_watcher(data_dir, **kw):
    got = []
    w = WALWatcher(data_dir, forward=got.extend, **kw)
    return w, got


def test_incremental_records_partial_tail(tmp_path):
    recs = [b"\x02" + b"a" * 100, b"\x02" + b"b" * 200]
    seg = tmp_path / "00000000"
    write_wal_segment(str(seg), recs)
    buf = seg.read_bytes()
    full, committed = incremental_records(buf, 0)
    assert full == recs and committed == len(buf)
    # truncate inside the second record: only the first parses, and the
    # committed offset re-reads the second once it completes
    out, c1 = incremental_records(buf[: len(buf) - 10], 0)
    assert out == [recs[0]]
    out2, c2 = incremental_records(buf, c1)
    assert out2 == [recs[1]] and c2 == len(buf)


def test_read_to_end_no_checkpoint(tmp_path):
    data_dir, wal = _mk_wal(tmp_path)
    write_wal_segment(
        str(wal / "00000000"),
        [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0), (1, 2000, 2.0)])],
    )
    write_wal_segment(
        str(wal / "00000001"),
        [_series_rec(2, "m2"), _samples_rec([(2, 3000, 3.0)])],
    )
    w, got = _collecting_watcher(data_dir)
    assert w.poll() == 3
    assert [(l["__name__"], t, v) for l, t, v in got] == [
        ("m1", 1000, 1.0), ("m1", 2000, 2.0), ("m2", 3000, 3.0)
    ]
    # nothing new → nothing re-forwarded
    assert w.poll() == 0


def test_tail_mid_segment_append(tmp_path):
    """A sample appended to the OPEN segment forwards on the next poll —
    no waiting for segment completion (TestWatcher_Tail)."""
    data_dir, wal = _mk_wal(tmp_path)
    base = [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0)])]
    write_wal_segment(str(wal / "00000000"), base)
    w, got = _collecting_watcher(data_dir)
    assert w.poll() == 1
    # the segment writer is deterministic, so re-encoding base+new has
    # the old bytes as an exact prefix — equivalent to a live append
    write_wal_segment(
        str(wal / "00000000"), base + [_samples_rec([(1, 5000, 5.0)])]
    )
    assert w.poll() == 1
    assert got[-1] == ({"__name__": "m1", "job": "j"}, 5000, 5.0)
    assert w.poll() == 0


def test_partially_written_record_not_lost_or_duplicated(tmp_path):
    data_dir, wal = _mk_wal(tmp_path)
    base = [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0)])]
    write_wal_segment(str(wal / "00000000"), base)
    full = (wal / "00000000").read_bytes()
    write_wal_segment(
        str(wal / "00000000"), base + [_samples_rec([(1, 2000, 2.0)])]
    )
    appended = (wal / "00000000").read_bytes()
    # simulate a torn write: half the new record's bytes on disk
    cut = len(full) + (len(appended) - len(full)) // 2
    (wal / "00000000").write_bytes(appended[:cut])
    w, got = _collecting_watcher(data_dir)
    assert w.poll() == 1  # only the complete sample
    (wal / "00000000").write_bytes(appended)
    assert w.poll() == 1  # the torn record, exactly once
    assert [(t, v) for _, t, v in got] == [(1000, 1.0), (2000, 2.0)]


def test_restart_resumes_from_position(tmp_path):
    data_dir, wal = _mk_wal(tmp_path)
    write_wal_segment(
        str(wal / "00000000"),
        [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0)])],
    )
    w1, got1 = _collecting_watcher(data_dir)
    w1.poll()
    assert len(got1) == 1
    # append + restart: a NEW watcher (same position file) forwards only
    # the new rows — committed work is not re-sent
    write_wal_segment(
        str(wal / "00000000"),
        [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0)]),
         _samples_rec([(1, 2000, 2.0)])],
    )
    w2, got2 = _collecting_watcher(data_dir)
    assert w2.poll() == 1
    assert got2 == [({"__name__": "m1", "job": "j"}, 2000, 2.0)]


def test_crash_before_position_persist_resends(tmp_path):
    """At-least-once: a crash between forward and position persist
    re-forwards that batch on restart."""
    data_dir, wal = _mk_wal(tmp_path)
    write_wal_segment(
        str(wal / "00000000"),
        [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0)])],
    )

    class Boom(Exception):
        pass

    sent = []

    def exploding(rows):
        sent.extend(rows)
        raise Boom()

    w = WALWatcher(data_dir, forward=exploding)
    try:
        w.poll()
    except Boom:
        pass
    assert len(sent) == 1
    # restart: position never persisted → the same rows forward again
    w2, got2 = _collecting_watcher(data_dir)
    assert w2.poll() == 1
    assert got2[0][1:] == (1000, 1.0)


def test_segment_roll(tmp_path):
    data_dir, wal = _mk_wal(tmp_path)
    write_wal_segment(
        str(wal / "00000000"),
        [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0)])],
    )
    w, got = _collecting_watcher(data_dir)
    w.poll()
    # writer rolls to a new segment; series from segment 0 still resolve
    write_wal_segment(str(wal / "00000001"), [_samples_rec([(1, 9000, 9.0)])])
    assert w.poll() == 1
    assert got[-1][1:] == (9000, 9.0)


def test_forward_latency_under_one_poll_interval(tmp_path):
    """The running watcher forwards a mid-segment append within one
    poll interval (the 'under one tick' bar)."""
    import time

    data_dir, wal = _mk_wal(tmp_path)
    base = [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.0)])]
    write_wal_segment(str(wal / "00000000"), base)
    got = []
    w = WALWatcher(data_dir, forward=got.extend)
    w.start(interval_s=0.05)
    try:
        deadline = time.monotonic() + 2
        while len(got) < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        write_wal_segment(
            str(wal / "00000000"), base + [_samples_rec([(1, 7000, 7.0)])]
        )
        t0 = time.monotonic()
        while len(got) < 2 and time.monotonic() - t0 < 2:
            time.sleep(0.01)
        latency = time.monotonic() - t0
    finally:
        w.stop()
    assert len(got) == 2
    assert latency < 1.0  # well under the agent's 5 s whole-file tick


def test_roundtrip_through_remote_write_encoding(tmp_path):
    """Watcher rows encode directly as a v1 WriteRequest and decode back."""
    from prometheus_spark.sources.remote_write import (
        decode_write_request,
        encode_write_request,
    )

    data_dir, wal = _mk_wal(tmp_path)
    write_wal_segment(
        str(wal / "00000000"),
        [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.5)])],
    )
    w, got = _collecting_watcher(data_dir)
    w.poll()
    body = encode_write_request(got)
    decoded = decode_write_request(body)
    series = decoded[0] if isinstance(decoded, tuple) else decoded
    assert any(
        s[0].get("__name__") == "m1" and (s[1], s[2]) == (1000, 1.5)
        for s in series
    )


def test_end_to_end_http_forward(tmp_path):
    """watcher → remote_write_forwarder → HTTP receiver spool: the live
    tail reaches a real remote-write endpoint."""
    import json as _json
    import threading

    from prometheus_spark.sources.remote_write import RemoteWriteReceiver
    from prometheus_spark.storage.wal_watcher import remote_write_forwarder

    spool = tmp_path / "spool"
    spool.mkdir()
    recv = RemoteWriteReceiver(str(spool))
    srv = recv.server()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/api/v1/write"
        data_dir, wal = _mk_wal(tmp_path)
        write_wal_segment(
            str(wal / "00000000"),
            [_series_rec(1, "m1"), _samples_rec([(1, 1000, 1.5)])],
        )
        w = WALWatcher(data_dir, forward=remote_write_forwarder(url))
        assert w.poll() == 1
        rows = []
        for p in spool.iterdir():
            if p.suffix == ".json":
                rows += [_json.loads(l) for l in p.read_text().splitlines()]
        assert any(
            r["labels"].get("__name__") == "m1"
            and r["t"] == 1000 and r["value"] == 1.5
            for r in rows
        )
    finally:
        srv.shutdown()
