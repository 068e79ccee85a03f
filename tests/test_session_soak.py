"""One-session soak: a long-lived engine must run hundreds of mixed
queries with bounded JVM heap and no per-eval slowdown curve.

Mirrors the reference's long-lived query-server lifecycle
(promql/engine.go:392-470 — one engine instance serves every query for
the process lifetime).  Round 10 found the Spark engine GC-storming
after ~150 classic-histogram evals in one session; the root cause was
the plan cache retaining every eval's analyzed Catalyst tree (each
classic-histogram plan is 10-100x a selector's).  The fix bounds the
cache by plan-construction cost (engine.py `_plan_cache_put`); this
soak pins the behavior: 500 distinct queries (so every one is a cache
miss) through ONE engine, heap delta and latency curve both bounded.
"""

from __future__ import annotations

import statistics
import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from prometheus_spark.engine import PromQLEngine
from prometheus_spark.storage import samples_from_rows


def _mk_samples(spark):
    rows = []
    # classic histogram: 2 instances x 4 le buckets + sum + count,
    # cumulative counters over 2h at 1m resolution
    for inst in ("a", "b"):
        for le, rate in (("0.1", 3), ("1", 7), ("10", 9), ("+Inf", 10)):
            rows.extend(
                (
                    {
                        "__name__": "h_bucket",
                        "instance": inst,
                        "le": le,
                    },
                    t * 60_000,
                    float(t * rate),
                )
                for t in range(120)
            )
        rows.extend(
            ({"__name__": "h_sum", "instance": inst}, t * 60_000, t * 22.5)
            for t in range(120)
        )
        rows.extend(
            ({"__name__": "h_count", "instance": inst}, t * 60_000, float(t * 10))
            for t in range(120)
        )
    # a counter and a gauge, 4 series each
    for i in range(4):
        rows.extend(
            (
                {"__name__": "c_total", "job": "j", "idx": str(i)},
                t * 60_000,
                float(t * (i + 1)),
            )
            for t in range(120)
        )
        rows.extend(
            (
                {"__name__": "g", "job": "j", "idx": str(i)},
                t * 60_000,
                float((t * 7 + i) % 13),
            )
            for t in range(120)
        )
    return samples_from_rows(spark, rows).localCheckpoint(eager=False)


def _used_heap(spark) -> int:
    jvm = spark.sparkContext._jvm
    for _ in range(3):
        jvm.System.gc()
        time.sleep(0.3)
    rt = jvm.java.lang.Runtime.getRuntime()
    return int(rt.totalMemory()) - int(rt.freeMemory())


# 10 templates x 50 variants = 500 distinct query strings: every eval is
# a plan-cache MISS, the worst case for retention.  Two templates are
# classic-histogram pivots (the plans that stormed round 10).
TEMPLATES = [
    "g + {i}",
    "sum by (idx) (g) * {i}",
    "rate(c_total[5m]) + {i}",
    "sum(rate(c_total[5m])) * {i}",
    "avg_over_time(g[10m]) - {i}",
    "topk(2, g + {i})",
    "g > bool {i}",
    "c_total offset 1m + {i}",
    "histogram_quantile(0.9, rate(h_bucket[5m])) + {i}",
    "histogram_quantile(0.{i}1, sum by (le) (rate(h_bucket[10m])))",
]


@pytest.mark.slow
def test_soak_500_mixed_evals_one_engine(spark):
    samples = _mk_samples(spark)
    engine = PromQLEngine(spark, samples, ordered=False)
    queries = [
        tpl.format(i=i) for i in range(50) for tpl in TEMPLATES
    ]
    assert len(queries) == 500
    assert len(set(queries)) == 500

    heap_before = _used_heap(spark)
    durations: list[float] = []
    t_ms = 115 * 60_000

    def run_one(q: str) -> float:
        t0 = time.monotonic()
        engine.instant_query(q, t_ms).collect()
        return time.monotonic() - t0

    with ThreadPoolExecutor(8) as pool:
        durations = list(pool.map(run_one, queries))

    # cache respected both bounds the whole way (nothing over-retained)
    assert len(engine._plan_cache) <= engine._plan_cache_max
    assert engine._plan_cache_cost_ms <= engine._plan_cache_budget_ms

    # no slowdown curve: the round-10 storm showed ~5x growth by eval
    # ~150; allow generous shared-box noise but catch the runaway
    first = statistics.median(durations[:100])
    last = statistics.median(durations[-100:])
    assert last <= max(0.05, first) * 5, (first, last)

    # bounded heap: the storm retained multiple GiB of analyzed trees.
    # Post-GC delta stays well under that; 3 GiB is the alarm line.
    heap_after = _used_heap(spark)
    assert heap_after - heap_before < 3 * 1024**3, (heap_before, heap_after)

    # releasing plans must zero the accounted cost
    engine.release_plans()
    assert len(engine._plan_cache) == 0
    assert engine._plan_cache_cost_ms == 0.0


@pytest.mark.slow
def test_soak_forced_path_classic_histograms(spark, monkeypatch):
    """Round-11 regression pin: a long-lived session streaming
    classic-histogram queries through the PREFIX fast path (the
    default route for wide-ratio queries like ``rate(h[1d])`` at a
    10s step) must not accumulate pinned JVM state.

    The round-11 storm had two stacked causes, both fixed and both
    pinned here: (1) py4j handles self-cycle, so finished evals'
    plans — and since the split contract, their broadcast dim hash
    relations — were only freeable by Python's cycle collector,
    which effectively never ran (prometheus_spark/pygc.py); (2) each
    tiny broadcast relation paid a full Tungsten page (16 MB at the
    default heuristic — spark.buffer.pageSize=1m in conftest).
    150 distinct forced-path evals through ONE engine, concurrent
    like the corpus worker, then post-GC heap delta bounded."""
    monkeypatch.setenv("PROMSPARK_PREFIX_RANGE_THRESHOLD", "0")
    monkeypatch.setenv("PROMSPARK_HIST_ASOF_THRESHOLD", "0")
    # tick on the corpus cadence even though this loop drives the
    # engine directly (the server endpoints / test runner own ticking)
    from prometheus_spark import pygc

    samples = _mk_samples(spark)
    engine = PromQLEngine(
        spark, samples, ordered=False, plan_cache_size=0
    )
    queries = [
        tpl.format(i=i)
        for i in range(50)
        for tpl in (
            "histogram_quantile(0.9, rate(h_bucket[5m])) + {i}",
            "histogram_quantile(0.{i}1, sum by (le) (rate(h_bucket[10m])))",
            "sum(increase(h_bucket[15m])) by (le) + {i}",
        )
    ]
    assert len(set(queries)) == 150

    heap_before = _used_heap(spark)
    t_ms = 115 * 60_000

    def run_one(q: str) -> None:
        engine.range_query(q, t_ms - 10 * 60_000, t_ms, 60_000).collect()
        pygc.tick()

    with ThreadPoolExecutor(8) as pool:
        list(pool.map(run_one, queries))

    heap_after = _used_heap(spark)
    # round-11: ~50 MB pinned per uncollected eval; 150 evals would
    # show multiple GiB.  Post-fix the delta is near-zero; 1.5 GiB is
    # the alarm line (shared-session noise headroom).
    assert heap_after - heap_before < 1536 * 1024**2, (
        heap_before,
        heap_after,
    )
