"""Concurrent range-query smoke — mirror of TestConcurrentRangeQueries
(/root/reference/promql/promql_test.go:40): every BenchmarkRangeQuery
case run against ONE engine/session from 4 worker threads, with the
reference's skips (count_values at steps>10, [1d] at steps>100).

Beyond the reference's no-error assertion, a spread of cases is first
evaluated serially and the concurrent results must match exactly — the
engine's per-session caches (samples cache, plan cache, tracing
contextvars) must not leak state across in-flight queries.
"""

import importlib.util
import os
import queue as pyqueue
import threading

import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "bench_promql.py")
_spec = importlib.util.spec_from_file_location("bench_promql", _TOOLS)
bp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bp)

NUM_INTERVALS = 600  # scaled-down storage; the reference uses 18640
CONCURRENCY = 4


def _cases():
    out = []
    for expr, steps in bp.expand_cases():
        # promql_test.go:71-75 skips
        if "count_values" in expr and steps > 10:
            continue
        if "[1d]" in expr and steps > 100:
            continue
        steps_eff = min(steps, NUM_INTERVALS // 2)
        start = (NUM_INTERVALS - steps_eff) * bp.INTERVAL_MS
        end = NUM_INTERVALS * bp.INTERVAL_MS
        out.append((expr, start, end, bp.INTERVAL_MS))
    return out


def _key(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


@pytest.mark.slow
def test_concurrent_range_queries(spark):
    samples = bp.build_storage(spark, NUM_INTERVALS).persist()
    samples.count()
    from prometheus_spark.engine.engine import PromQLEngine

    eng = PromQLEngine(spark, samples)
    cases = _cases()
    assert len(cases) > 100  # the full reference case list, minus skips

    # serial baselines for a spread of cases (every 12th)
    compare = {i for i in range(0, len(cases), 12)}
    serial = {}
    for i in compare:
        expr, start, end, step = cases[i]
        serial[i] = _key(eng.range_query(expr, start, end, step).collect())

    work: "pyqueue.Queue[tuple[int, tuple]]" = pyqueue.Queue()
    for i, c in enumerate(cases):
        work.put((i, c))
    errors: list = []
    mismatches: list = []
    lock = threading.Lock()

    def worker():
        while True:
            try:
                i, (expr, start, end, step) = work.get_nowait()
            except pyqueue.Empty:
                return
            try:
                df = eng.range_query(expr, start, end, step)
                if i in compare:
                    got = _key(df.collect())
                    if got != serial[i]:
                        with lock:
                            mismatches.append(expr)
                else:
                    df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001 — collected for assert
                with lock:
                    errors.append((expr, repr(e)))

    threads = [threading.Thread(target=worker) for _ in range(CONCURRENCY)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    samples.unpersist()
    assert not errors, errors[:5]
    assert not mismatches, mismatches
