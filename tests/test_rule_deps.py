"""Rule dependency analysis + concurrent evaluation.

Mirrors the reference's rules/manager_test.go: TestDependencyMap,
TestDependenciesEdgeCases, TestSplitGroupIntoBatches shapes, and
TestAsyncRuleEvaluation (concurrent results bit-identical to
sequential, and concurrency actually observed)."""

import threading
import time

import pytest

from prometheus_spark.storage import samples_from_rows
from prometheus_spark.streaming import AlertingRule, RecordingRule, RuleGroup, RulesEngine
from prometheus_spark.streaming.rule_deps import (
    ConcurrentRuleEvalController,
    build_dependency_map,
    dependencies,
    dependents,
    is_independent,
    split_group_into_batches,
)

M = 60_000


# --- dependency map (manager_test.go TestDependencyMap) ----------------------
def test_dependency_map():
    r1 = RecordingRule("user:requests:rate1m", "sum by (user) (rate(requests[1m]))")
    r2 = AlertingRule("ZeroRequests", "user:requests:rate1m <= 0")
    r3 = RecordingRule("user:requests:rate5m", "sum by (user) (rate(requests[5m]))")
    r4 = RecordingRule("user:requests:increase1h", "increase(user:requests:rate1m[1h])")
    r5 = RecordingRule(
        "user:requests:sum5m", 'sum by (user) ({__name__=~"user:requests.+5m"})'
    )
    rules = [r1, r2, r3, r4, r5]
    dm = build_dependency_map(rules)

    assert dependencies(dm, 0) == []
    assert dependents(dm, 0) == [1, 3]
    assert not is_independent(dm, 0)

    assert dependents(dm, 1) == []
    assert dependencies(dm, 1) == [0]
    assert not is_independent(dm, 1)

    assert dependents(dm, 2) == [4]
    assert dependencies(dm, 2) == []
    assert not is_independent(dm, 2)

    assert dependents(dm, 3) == []
    assert dependencies(dm, 3) == [0]
    assert not is_independent(dm, 3)

    assert dependents(dm, 4) == []
    assert dependencies(dm, 4) == [2]
    assert not is_independent(dm, 4)


def test_dependency_edge_cases():
    # ≤1 rule → empty map, queries don't blow up
    only = RecordingRule("user:requests:rate1m", "sum(rate(requests[1m]))")
    assert build_dependency_map([only]) == {}
    assert build_dependency_map([]) == {}
    assert is_independent({}, 0)

    # rules referencing no other rule's series are independent
    dm = build_dependency_map(
        [RecordingRule("1", "one"), RecordingRule("2", "two")]
    )
    assert is_independent(dm, 0) and is_independent(dm, 1)

    # regexp name matcher that matches an earlier rule → dependency
    dm = build_dependency_map(
        [
            RecordingRule("first", "sum(requests)"),
            RecordingRule("second", 'sum({__name__=~"fir.+"})'),
        ]
    )
    assert dependents(dm, 0) == [1]

    # name-less (wildcard) selector → indeterminate: whole group sequential
    dm = build_dependency_map(
        [
            RecordingRule("first", "sum(requests)"),
            RecordingRule("second", 'sum({cluster="prod"})'),
        ]
    )
    assert dm is None
    assert not is_independent(dm, 0)

    # later-defined rules are NOT strict dependencies (definition order
    # is the execution contract — group.go:1180)
    dm = build_dependency_map(
        [
            RecordingRule("uses_later", "sum(comes_later)"),
            RecordingRule("comes_later", "sum(requests)"),
        ]
    )
    assert dependencies(dm, 0) == []


def test_dependency_on_alerts_meta_series():
    # querying ALERTS{alertname="X"} depends on the alerting rule X
    a = AlertingRule("HighErrors", "errors_total > 100")
    r = RecordingRule("alert:count", 'count(ALERTS{alertname="HighErrors"})')
    dm = build_dependency_map([a, r])
    assert dependents(dm, 0) == [1]

    # no alertname matcher → depends on EVERY earlier alerting rule
    a2 = AlertingRule("Other", "x > 1")
    r2 = RecordingRule("alert:count", "count(ALERTS)")
    dm = build_dependency_map([a, a2, r2])
    assert dependents(dm, 0) == [2] and dependents(dm, 1) == [2]

    # non-matching alertname → no dependency
    r3 = RecordingRule("alert:count", 'count(ALERTS_FOR_STATE{alertname="Nope"})')
    dm = build_dependency_map([a, r3])
    assert dm == {}


# --- batching (manager.go SplitGroupIntoBatches) -----------------------------
def test_split_group_into_batches():
    rules = [
        RecordingRule("a", "sum(x)"),          # no deps, has dependent
        RecordingRule("b", "sum(a)"),          # dep on a, dependent of c
        RecordingRule("c", "sum(b)"),          # dep on b, no dependents
        RecordingRule("d", "sum(y)"),          # independent
    ]
    dm = build_dependency_map(rules)
    order = split_group_into_batches(rules, dm)
    # batch 1: no dependencies {a, d}; middle: b sequential; tail: {c}
    assert order == [[0, 3], [1], [2]]

    # all independent → single concurrent batch
    rules = [RecordingRule(str(i), f"sum(m{i})") for i in range(8)]
    order = split_group_into_batches(rules, build_dependency_map(rules))
    assert order == [list(range(8))]

    # indeterminate → None
    assert split_group_into_batches(rules, None) is None


def test_controller_semaphore():
    c = ConcurrentRuleEvalController(2)
    assert c.allow() and c.allow()
    assert not c.allow()  # try-acquire, non-blocking
    c.done()
    assert c.allow()
    c.done()
    c.done()


# --- concurrent evaluation (manager_test.go TestAsyncRuleEvaluation) ---------
@pytest.fixture()
def dep_samples(spark):
    rows = []
    for i in range(11):
        rows.append(({"__name__": "requests", "user": "u1"}, i * M, float(i * 10)))
        rows.append(({"__name__": "requests", "user": "u2"}, i * M, float(i * 20)))
    return samples_from_rows(spark, rows).cache()


class _CountingEngine(RulesEngine):
    """Instrumented engine: tracks max concurrently-inflight rule evals
    (the test's analogue of the reference's inflightQueries counter)."""

    def __init__(self, *args, delay=0.15, **kwargs):
        super().__init__(*args, **kwargs)
        self._inflight = 0
        self.max_inflight = 0
        self._mtx = threading.Lock()
        self._delay = delay

    def _eval_recording(self, group, rule, ts):
        with self._mtx:
            self._inflight += 1
            self.max_inflight = max(self.max_inflight, self._inflight)
        try:
            time.sleep(self._delay)
            return super()._eval_recording(group, rule, ts)
        finally:
            with self._mtx:
                self._inflight -= 1


def _group():
    return RuleGroup(
        "g",
        M,
        [
            RecordingRule("user:requests:rate2m", "sum by (user) (rate(requests[2m]))"),
            RecordingRule("user:requests:rate5m", "sum by (user) (rate(requests[5m]))"),
            RecordingRule("user:requests:total", "sum by (user) (requests)"),
            RecordingRule("all:requests:total", "sum(user:requests:total)"),
        ],
    )


def test_concurrent_eval_matches_sequential(spark, dep_samples):
    seq = RulesEngine(spark, dep_samples)
    con = _CountingEngine(spark, dep_samples, concurrent_eval=True, max_concurrent=4)

    out_seq, _ = seq.eval_tick(_group(), 10 * M)
    out_con, _ = con.eval_tick(_group(), 10 * M)

    rows_seq = sorted(
        (r["name"], tuple(sorted(r["labels"].items())), r["t"], r["value"])
        for r in out_seq.collect()
    )
    rows_con = sorted(
        (r["name"], tuple(sorted(r["labels"].items())), r["t"], r["value"])
        for r in out_con.collect()
    )
    # 3 independent rules × 2 users; the dependent all:requests:total reads
    # this tick's storage (outputs append after the tick) → empty first tick
    assert rows_seq == rows_con and len(rows_seq) == 6
    # the three independent rules overlapped
    assert con.max_inflight >= 2


def test_sequential_controller_never_overlaps(spark, dep_samples):
    eng = _CountingEngine(spark, dep_samples)  # default sequential controller
    eng.eval_tick(_group(), 10 * M)
    assert eng.max_inflight == 1


def test_insufficient_concurrency_still_correct(spark, dep_samples):
    # 8 independent rules, 2 slots: overflow evaluates inline; all outputs land
    rules = [
        RecordingRule(f"rec{i}", "sum by (user) (requests)") for i in range(8)
    ]
    group = RuleGroup("g8", M, rules)
    eng = _CountingEngine(
        spark, dep_samples, concurrent_eval=True, max_concurrent=2, delay=0.05
    )
    out, _ = eng.eval_tick(group, 10 * M)
    names = {r["name"] for r in out.collect()}
    assert names == {f"rec{i}" for i in range(8)}
    # at most 2 concurrent slots + 1 inline caller thread
    assert 2 <= eng.max_inflight <= 3


def test_mixed_recording_alerting_group_unions(spark, dep_samples):
    """Recording + alerting rules in ONE group produce a single coherent
    samples frame (regression: the ALERTS frame carried the r7 ``st``
    start-timestamp column and broke the union with recording output)."""
    group = RuleGroup(
        "mix",
        M,
        [
            RecordingRule("user:total", "sum by (user) (requests)"),
            AlertingRule("High", "requests > 150"),
        ],
    )
    eng = RulesEngine(spark, dep_samples)
    out, alerts = eng.eval_tick(group, 10 * M)
    names = {r["name"] for r in out.collect()}
    assert names == {"user:total", "ALERTS", "ALERTS_FOR_STATE"}
    assert [a[0] for a in alerts] == ["High"]


def test_dependent_rule_sees_ordering(spark, dep_samples):
    """all:requests:total depends on user:requests:total; with dependency
    batching it must evaluate in a later batch (strict ordering), and the
    group's batches reflect manager.go's 3-bucket split."""
    eng = RulesEngine(spark, dep_samples, concurrent_eval=True, max_concurrent=4)
    order = eng._group_batches(_group())
    assert order == [[0, 1, 2], [3]]


# --- query_offset / limit (rulefmt.go:162-163, rules/group.go:693) ----------
def test_rule_query_offset(spark, dep_samples):
    """query_offset shifts the query AND output timestamps into the past
    (recording.go:87, group.go:623)."""
    g = RuleGroup(
        "off", M, [RecordingRule("user:total", "sum by (user) (requests)")],
        query_offset_ms=2 * M,
    )
    eng = RulesEngine(spark, dep_samples)
    out, _ = eng.eval_tick(g, 10 * M)
    rows = out.collect()
    assert all(r["t"] == 8 * M for r in rows)
    # value is the one at t=8m (i=8): u1 80, u2 160
    vals = {r["labels"]["user"]: r["value"] for r in rows}
    assert vals == {"u1": 80.0, "u2": 160.0}

    # global default applies when the group doesn't set one
    eng2 = RulesEngine(spark, dep_samples, default_rule_query_offset_ms=M)
    g2 = RuleGroup("off2", M, [RecordingRule("user:total", "sum by (user) (requests)")])
    out2, _ = eng2.eval_tick(g2, 10 * M)
    assert all(r["t"] == 9 * M for r in out2.collect())


def test_rule_group_limit(spark, dep_samples):
    """A rule producing more series than the group limit appends nothing
    (recording.go:110 / alerting.go:528 'exceeded limit')."""
    g = RuleGroup(
        "lim", M,
        [
            RecordingRule("user:total", "sum by (user) (requests)"),  # 2 series
            AlertingRule("Any", "requests > 0"),  # 2 alerts
        ],
        limit=1,
    )
    eng = RulesEngine(spark, dep_samples)
    out, alerts = eng.eval_tick(g, 10 * M)
    assert alerts == []
    assert (out is None) or out.count() == 0
    # limit=2 admits both rules
    g2 = RuleGroup("lim2", M, list(g.rules), limit=2)
    out2, alerts2 = eng.eval_tick(g2, 10 * M)
    assert len(alerts2) == 2
    assert out2.filter("name = 'user:total'").count() == 2


def test_rulefmt_parses_query_offset_and_limit():
    from prometheus_spark.streaming import parse_rule_groups

    groups = parse_rule_groups(
        """
groups:
  - name: g
    interval: 30s
    query_offset: 2m
    limit: 7
    rules:
      - record: a
        expr: up
"""
    )
    assert groups[0].query_offset_ms == 120_000
    assert groups[0].limit == 7
    assert groups[0].interval_ms == 30_000


def test_config_rule_query_offset(tmp_path):
    from prometheus_spark.config import load_config

    p = tmp_path / "c.yml"
    p.write_text("global:\n  rule_query_offset: 1m\n")
    assert load_config(str(p)).rule_query_offset_ms == 60_000


# --- RulesManager (rules/manager.go Run/Update) ------------------------------
def test_rules_manager_staggered_scheduling(spark, dep_samples):
    from prometheus_spark.streaming import RulesManager

    eng = RulesEngine(spark, dep_samples)
    appended = []

    def append(df, alerts):
        appended.append((df, alerts))

    mgr = RulesManager(eng, append, now_fn=lambda: 0)
    g1 = RuleGroup("fast", M, [RecordingRule("r1", "sum(requests)")])
    g2 = RuleGroup("slow", 5 * M, [RecordingRule("r2", "sum(requests)")])
    mgr.update([g1, g2])

    # hash-staggered timestamps: aligned to the interval grid + offset
    ts1 = mgr.eval_timestamp(g1, 10 * M + 7)
    assert (ts1 - mgr._group_offset_ms(g1)) % M == 0
    assert ts1 <= 10 * M + 7

    # first tick arms deadlines; subsequent ticks fire each group at
    # most once per elapsed interval: over 10 simulated minutes the
    # 1m group evaluates ~10x, the 5m group ~2x
    mgr.tick(now_ms=0)
    total = 0
    for now in range(M, 13 * M + 1, M):
        total += mgr.tick(now_ms=now)
    fast_evals = sum(
        1 for df, _ in appended if df.filter("name = 'r1'").count() > 0
    )
    slow_evals = len(appended) - fast_evals
    assert fast_evals >= 10 and slow_evals >= 2
    assert total == len(appended)


def test_rules_manager_update_preserves_state(spark, dep_samples):
    from prometheus_spark.streaming import RulesManager

    eng = RulesEngine(spark, dep_samples)
    out = []
    mgr = RulesManager(eng, lambda df, a: out.append((df, a)))
    g = RuleGroup("g", M, [AlertingRule("High", "requests > 150")])
    mgr.update([g])
    mgr.tick(now_ms=10 * M)
    mgr.tick(now_ms=11 * M + 1)
    assert any(a for _df, a in out for a in [a] if a)  # alert fired
    state_before = dict(eng._alert_state)
    # update with the SAME group (by name) keeps engine state
    mgr.update([RuleGroup("g", M, list(g.rules))])
    assert eng._alert_state == state_before
    # removed group drops its schedule
    mgr.update([])
    assert mgr._next_due == {}
    assert mgr.tick(now_ms=20 * M) == 0


def test_rules_manager_concurrent_groups(spark, dep_samples):
    """Due groups evaluate concurrently (manager.go:236 one goroutine
    per group) with deterministic name-ordered appends."""
    from prometheus_spark.streaming import RulesManager

    eng = _CountingEngine(spark, dep_samples, delay=0.2)
    order = []
    mgr = RulesManager(eng, lambda df, a: order.append(df))
    groups = [
        RuleGroup(f"g{i}", M, [RecordingRule(f"r{i}", "sum by (user) (requests)")])
        for i in range(3)
    ]
    mgr.update(groups)
    mgr.tick(now_ms=10 * M)  # arm
    n = mgr.tick(now_ms=12 * M)  # all three due
    assert n == 3
    assert eng.max_inflight >= 2  # groups overlapped
    names = [df.select("name").first()["name"] for df in order]
    assert names == ["r0", "r1", "r2"]  # name-ordered appends


def test_recording_rule_records_native_histograms(spark):
    """A rule whose expression yields native histograms records the hist
    struct (recording.go Eval appends whatever the vector carries) —
    previously the hist column was silently dropped."""
    h = {
        "schema": 0, "zero_threshold": 0.001, "zero_count": 1.0,
        "count": 5.0, "sum": 10.0,
        "pos_spans": [{"offset": 0, "length": 2}],
        "pos_buckets": [2.0, 2.0],
        "neg_spans": [], "neg_buckets": [], "custom_values": [],
        "counter_reset_hint": 0,
    }
    rows = [
        ({"__name__": "nh", "job": "a"}, 10 * M, h),
        ({"__name__": "nh", "job": "b"}, 10 * M, h),
    ]
    eng = RulesEngine(spark, samples_from_rows(spark, rows))
    g = RuleGroup("g", M, [RecordingRule("nh:sum", "sum(nh)")])
    out, _ = eng.eval_tick(g, 10 * M)
    r = out.collect()
    assert len(r) == 1
    assert r[0]["name"] == "nh:sum" and r[0]["value"] is None
    assert r[0]["hist"]["count"] == 10.0 and r[0]["hist"]["sum"] == 20.0
    # float rules still union cleanly alongside (7-column layout)
    g2 = RuleGroup(
        "g2", M,
        [RecordingRule("nh:count", "histogram_count(sum(nh))"),
         RecordingRule("nh:sum2", "sum(nh)")],
    )
    out2, _ = eng.eval_tick(g2, 10 * M)
    by = {x["name"]: x for x in out2.collect()}
    assert by["nh:count"]["value"] == 10.0 and by["nh:count"]["hist"] is None
    assert by["nh:sum2"]["hist"] is not None


def test_rules_manager_error_containment_and_missed_skip(spark, dep_samples):
    """Regression (code review): one failing group neither kills the
    tick nor blocks other groups; stalls skip missed intervals instead
    of replaying them at stale timestamps."""
    from prometheus_spark.streaming import RulesManager

    eng = RulesEngine(spark, dep_samples)
    out = []
    mgr = RulesManager(eng, lambda df, a: out.append(df))
    good = RuleGroup("good", M, [RecordingRule("ok", "sum(requests)")])
    bad = RuleGroup("bad", M, [RecordingRule("boom", "sum(requests")])  # parse err
    mgr.update([bad, good])
    mgr.tick(now_ms=10 * M)  # arm
    n = mgr.tick(now_ms=11 * M + 1)
    assert n == 2
    assert len(out) == 1  # good group appended
    assert mgr.eval_failures.get("bad") == 1
    assert "bad" in mgr.last_error
    # stall: 10 intervals pass → ONE evaluation, missed counted, next_due
    # lands in the future
    before_missed = mgr.iterations_missed
    mgr.tick(now_ms=21 * M + 1)
    assert mgr.iterations_missed - before_missed >= 9 * 2  # both groups stalled
    assert all(due > 21 * M for due in mgr._next_due.values())


def test_rules_manager_update_releases_state(spark, dep_samples):
    """Regression (code review): removing a group releases its engine
    state (persisted prev frames, alert maps, batch cache)."""
    from prometheus_spark.streaming import RulesManager

    eng = RulesEngine(spark, dep_samples)
    mgr = RulesManager(eng, lambda df, a: None)
    g = RuleGroup(
        "gone", M,
        [RecordingRule("r", "sum(requests)"), AlertingRule("A", "requests > 0")],
    )
    mgr.update([g])
    mgr.tick(now_ms=10 * M)
    mgr.tick(now_ms=11 * M + 1)
    assert any(k.startswith("gone/") for k in eng._prev_series)
    assert any(k.startswith("gone/") for k in eng._alert_state)
    mgr.update([])
    assert not any(k.startswith("gone/") for k in eng._prev_series)
    assert not any(k.startswith("gone/") for k in eng._alert_state)
    assert not any(k[0] == "gone" for k in eng._batch_cache)


def test_rules_manager_restores_for_state(spark):
    """restore=True pulls active_since back from the stored
    ALERTS_FOR_STATE after each group's first eval (group.go:272)."""
    from prometheus_spark.streaming import RulesManager

    # alert active since t=2m persisted before the "restart"
    rows = [
        ({"__name__": "m"}, i * M, 500.0) for i in range(11)
    ] + [
        ({"__name__": "ALERTS_FOR_STATE", "alertname": "Hot"}, 9 * M, 120.0)
    ]
    eng = RulesEngine(spark, samples_from_rows(spark, rows))
    g = RuleGroup("g", M, [AlertingRule("Hot", "m > 100", for_ms=30 * M)])
    mgr = RulesManager(eng, lambda df, a: None, restore=True)
    mgr.update([g])
    mgr.tick(now_ms=10 * M)  # arm
    mgr.tick(now_ms=11 * M + 1)  # first eval + restore
    st = eng._alert_state["g/0/Hot"]
    (alert_state,) = st.values()
    # restored activation = stored 120 s (2m) + downtime shift, NOT the
    # fresh re-arm at 11m
    assert alert_state["active_since"] < 11 * M


def test_rules_manager_restore_failure_keeps_output(spark, dep_samples):
    """Regression (code review): a failing restore_for_state must not
    discard the successful eval's samples, and retries next tick."""
    from prometheus_spark.streaming import RulesManager

    eng = RulesEngine(spark, dep_samples)
    calls = {"n": 0}
    orig = eng.restore_for_state

    def flaky(group, ts, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return orig(group, ts, **kw)

    eng.restore_for_state = flaky
    out = []
    mgr = RulesManager(eng, lambda df, a: out.append(df), restore=True)
    g = RuleGroup("g", M, [RecordingRule("r", "sum(requests)")])
    mgr.update([g])
    mgr.tick(now_ms=10 * M)  # arm
    mgr.tick(now_ms=11 * M + 1)  # eval ok, restore raises
    assert len(out) == 1  # samples still appended
    assert "g" not in mgr._restored and "g" in mgr.last_error
    mgr.tick(now_ms=12 * M + 1)  # restore retried and succeeds
    assert "g" in mgr._restored and calls["n"] == 2
