"""Plan-time probe budget pins (round 13).

Plan construction used to launch up to four synchronous probe actions
per uncached strict query (result-sort row probe, name-drop collision
probe, two binop msig-dup probes) — a cold-latency floor the driver
bench flagged (cold_ratio warn).  These tests pin the fused/memoized
contract by counting probe executions (new ``_probe_memo`` entries;
one entry == one driver-blocking probe action — a single action may
span several AQE sub-jobs, so raw job counts are not the right meter):

- a name-dropping strict query runs EXACTLY ONE probe at plan time
  (the fused ``_nd_stats`` pass also supplies the sort-size row count);
- re-planning over the same dim shape runs ZERO probes (memo keyed by
  analyzed-plan semanticHash survives plan-cache eviction).
"""

import pytest

from prometheus_spark.engine import PromQLEngine
from prometheus_spark.storage import samples_from_rows


@pytest.fixture(scope="module")
def engine(spark):
    rows = []
    for name in ("m_a", "m_b"):
        for i in range(4):
            rows.append(
                ({"__name__": name, "instance": str(i)}, 60_000, float(i))
            )
    eng = PromQLEngine(spark, samples_from_rows(spark, rows).cache())
    eng.series_dim  # materialize: init jobs don't count against queries
    return eng


def _probes_during(engine, fn):
    before = len(engine._probe_memo)
    fn()
    return len(engine._probe_memo) - before


def test_name_dropping_query_plans_with_one_probe(engine):
    engine.release_plans()
    engine._probe_memo.clear()
    n = _probes_during(
        engine, lambda: engine.instant_query("rate(m_a[1m])", 120_000)
    )
    assert n == 1, f"expected exactly one fused probe, saw {n}"


def test_same_dim_shape_replans_with_zero_probes(engine):
    engine.release_plans()  # drop the plan cache, keep the probe memo
    n = _probes_during(
        engine, lambda: engine.instant_query("rate(m_a[1m])", 180_000)
    )
    assert n == 0, f"expected memoized probes (zero executions), saw {n}"


def test_binop_probes_fused_and_memoized(engine):
    engine.release_plans()
    engine._probe_memo.clear()
    first = _probes_during(
        engine, lambda: engine.instant_query("m_a / m_b", 120_000)
    )
    engine.release_plans()
    again = _probes_during(
        engine, lambda: engine.instant_query("m_a / m_b", 180_000)
    )
    # first plan: one fused finalize probe + one msig-dup probe per side
    assert first <= 3, f"probe count grew past the fused budget: {first}"
    assert again == 0, f"expected memoized probes (zero executions), saw {again}"
