"""Agent mode — scrape + durable spool + remote-write forward, no local
query engine (reference: tsdb/agent/db.go; cmd/prometheus --agent).

The reference's agent keeps a WAL-only TSDB whose sole consumer is the
remote-write queue manager.  The Spark-native shape: the scrape loop's
atomic JSON-lines spool IS the WAL (same durability contract — a file
appears only when complete), and each forward tick reads the spool
files that arrived since the last tick as ONE batch DataFrame and ships
them through the distributed remote-write sender
(``send_samples_df`` — per-partition shards, retries, backoff).  No
samples ever pass through the driver; the driver only moves file names
and a high-water mark.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Optional


class AgentForwarder:
    """Forward the scrape/receiver spool to remote-write endpoints.

    ``tick()`` is idempotent per file: files are processed in name order
    past a persisted high-water mark (``.agent_hwm`` in the spool dir),
    so a crashed agent resumes without re-sending — the same at-least-
    once stance as the reference's WAL-watcher checkpoints
    (tsdb/agent + storage/remote WAL watcher)."""

    def __init__(
        self,
        spark,
        spool_dir: str,
        remote_write_urls: list[str],
        max_batch: int = 500,
        v2: bool = False,
        remote_writes: list | None = None,
    ):
        self.spark = spark
        self.spool_dir = spool_dir
        self.urls = list(remote_write_urls)
        self.max_batch = max_batch
        self.v2 = v2
        # full config.RemoteWriteConfig entries (write_relabel_configs,
        # auth, headers, queue tuning, send_native_histograms) — when
        # given they take precedence over the bare URL list
        self.remote_writes = list(remote_writes or [])
        self._hwm_path = os.path.join(spool_dir, ".agent_hwm")
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _hwm(self) -> str:
        try:
            with open(self._hwm_path) as f:
                return f.read().strip()
        except OSError:
            return ""

    def _pending_files(self) -> list[str]:
        hwm = self._hwm()
        names = sorted(
            n for n in os.listdir(self.spool_dir)
            if n.endswith(".json") and not n.startswith(".") and n > hwm
        )
        return names

    def tick(self) -> int:
        """Forward every spool file past the high-water mark; returns the
        number of files shipped."""
        names = self._pending_files()
        if not names:
            return 0
        paths = [os.path.join(self.spool_dir, n) for n in names]
        from prometheus_spark.sources.remote_write import (
            send_samples_df,
            spool_to_samples,
        )

        # one batch frame over exactly the new files — the heavy path
        # (parse, shard, send) is distributed; float AND native-histogram
        # rows forward (the sender encodes dict values onto the wire's
        # histograms field, round-7 parity with send_native_histograms)
        df = spool_to_samples(self.spark, paths)
        if "hist" in df.columns:
            # stale markers forward too — they become StaleNaN samples
            # on the wire (the reference's WAL watcher ships them)
            df = df.filter("value IS NOT NULL OR hist IS NOT NULL OR stale")
        else:
            df = df.filter("value IS NOT NULL")
        if self.remote_writes:
            from prometheus_spark.sources.remote_write import forward_samples

            for rw in self.remote_writes:
                if rw.v2:
                    self._send_v2(df, rw.url)
                else:
                    forward_samples(df, rw)
        else:
            for url in self.urls:
                send_samples_df(
                    df, url, max_batch=self.max_batch
                ) if not self.v2 else self._send_v2(df, url)
        tmp = self._hwm_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(names[-1])
        os.replace(tmp, self._hwm_path)
        return len(names)

    def _send_v2(self, df, url: str) -> None:
        """v2 forward: per-partition symbol-table batches."""
        from prometheus_spark.sources.remote_write import send_write_request_v2

        max_batch = self.max_batch

        def _part(rows_iter):
            import struct as _struct

            stale_nan = _struct.unpack(
                "<d", _struct.pack("<Q", 0x7FF0000000000002)
            )[0]
            batch: list = []
            for r in rows_iter:
                if "hist" in r.__fields__ and r["hist"] is not None:
                    v = r["hist"].asDict(recursive=True)
                elif "stale" in r.__fields__ and r["stale"]:
                    v = stale_nan  # staleness marker on the wire
                else:
                    v = float(r["value"])
                batch.append((dict(r["labels"]), int(r["t"]), v))
                if len(batch) >= max_batch:
                    try:
                        send_write_request_v2(url, list(batch))
                    except Exception:  # noqa: BLE001 — drop like 4xx
                        pass
                    batch.clear()
            if batch:
                try:
                    send_write_request_v2(url, batch)
                except Exception:  # noqa: BLE001
                    pass

        cols = ["labels", "t", "value"]
        for optional in ("hist", "stale"):
            if optional in df.columns:
                cols.append(optional)
        df.select(*cols).foreachPartition(_part)

    def start(self, interval_s: float = 5.0) -> threading.Thread:
        def loop():
            while not self._stop.wait(interval_s):
                try:
                    self.tick()
                except Exception:  # noqa: BLE001 — keep the loop alive
                    pass

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self._thread

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)


def build_agent(spark, cfg, spool_dir: str = "/tmp/prom_agent_spool"):
    """Assemble agent mode from a loaded PromConfig: discovery + scrape
    manager feeding the spool, forwarder shipping it to every
    remote_write URL — and NO query engine (the agent-mode contract;
    cmd/prometheus --agent rejects query APIs)."""
    from prometheus_spark.config import build_server

    srv = build_server(spark, cfg, samples=None, spool_dir=spool_dir)
    forwarder = AgentForwarder(
        spark,
        spool_dir,
        cfg.remote_write_urls,
        remote_writes=getattr(cfg, "remote_writes", []),
    )
    return {
        "discovery": srv["discovery"],
        "scrape_manager": srv["scrape_manager"],
        "forwarder": forwarder,
    }
