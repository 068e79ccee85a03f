"""Deterministic cycle collection for py4j handle hygiene.

Every py4j ``JavaObject`` is born into a reference CYCLE: the object
holds its ``_methods`` dict, each cached ``JavaMember`` holds
``container`` back to the object.  CPython refcounting therefore NEVER
frees a JVM handle — only the cycle collector does, and the cycles are
promoted to gen2 within milliseconds of creation, where CPython's
full-collection heuristic (long-lived growth > 25%) effectively never
fires against PySpark's ~1M-object module graph.

The JVM-side cost of one stale handle used to be a detached logical
plan (cheap).  Since the split frame contract, an executed plan pins
its broadcast dim exchanges — each a hashed relation with MB-scale
``long[]`` pages — measured ~50 MB pinned per classic-histogram eval.
A long-lived driver running concurrent query streams (the corpus
worker at ``parallel_evals=24``, a months-lived rules manager, the
query API) accumulates those until the 8 GiB driver heap GC-storms
(round-11 forced-path ``histograms.test`` kill: old gen 97.9%, one
full JVM GC per second, zero progress — all of it Python garbage the
cycle collector had simply not been asked to collect).

Fix: count completed query executions and run ``gc.collect()`` every
``PROMSPARK_GC_EVERY`` completions (default 32).  A full collection
on a loaded PySpark driver measures ~30-80 ms; amortized over 32
query executions it is noise, and it deterministically releases the
py4j handles → JVM plans → broadcast pages chain.

Reference analogue: the Go engine has no such problem (no FFI handle
graph), but Spark itself ships the same medicine JVM-side as
``spark.cleaner.periodicGC.interval``.
"""

from __future__ import annotations

import gc
import os
import threading

_every = int(os.environ.get("PROMSPARK_GC_EVERY", "32"))
_debug = os.environ.get("PROMSPARK_GC_DEBUG", "") == "1"
_lock = threading.Lock()
_pending = 0


def _collect_logged() -> None:
    if not _debug:
        gc.collect()
        return
    import sys
    import time

    t0 = time.monotonic()
    n = gc.collect()
    print(
        f"PYGC collected={n} in {time.monotonic() - t0:.3f}s "
        f"gen2={len(gc.get_objects(2))}",
        file=sys.stderr,
        flush=True,
    )


def tick(n: int = 1) -> None:
    """Record ``n`` completed query executions; collect when due.

    Call after a query's results have been consumed (``collect()``/
    ``toPandas()`` done, references dropped) — that is the moment the
    eval's py4j handles become cycle-garbage.  Thread-safe; the
    collection itself runs outside the counter lock so concurrent
    callers never serialize on it.
    """
    global _pending
    if _every <= 0:
        return
    with _lock:
        _pending += n
        if _pending < _every:
            return
        _pending = 0
    _collect_logged()


def collect_now() -> int:
    """Immediate full cycle collection (session teardown, tests)."""
    global _pending
    with _lock:
        _pending = 0
    return gc.collect()
