"""Alert 'for'-state restoration — reference scenario parity.

Replays the reference's ``TestForStateRestore``
(rules/manager_test.go:362) verbatim: same load block, same rule
(``for: 25m``), same OutageTolerance (30m) / ForGracePeriod (10m), the
same four scenarios × queryOffset ∈ {0, 1m}, and the same ActiveAt
arithmetic assertions."""

import pytest

from prometheus_spark.storage import samples_from_rows
from prometheus_spark.streaming import AlertingRule, RuleGroup, RulesEngine

M = 60_000
EXPR = 'http_requests{group="canary", job="app-server"} < 100'
FOR_MS = 25 * M
OUTAGE_MS = 30 * M
GRACE_MS = 10 * M

V0 = [75, 85, 50, 0, 0, 25, 0, 0, 40, 0, 120]
V1 = [125, 90, 60, 0, 0, 25, 0, 0, 40, 0, 130]


def _base_rows():
    rows = []
    for i, (a, b) in enumerate(zip(V0, V1)):
        t = i * 5 * M
        rows.append(({"__name__": "http_requests", "job": "app-server",
                      "instance": "0", "group": "canary",
                      "severity": "overwrite-me"}, t, float(a)))
        rows.append(({"__name__": "http_requests", "job": "app-server",
                      "instance": "1", "group": "canary",
                      "severity": "overwrite-me"}, t, float(b)))
    return rows


def _rule():
    return AlertingRule("HTTPRequestRateLow", EXPR, for_ms=FOR_MS,
                        labels={"severity": "critical"})


KEY = "default/0/HTTPRequestRateLow"

# (name, restore_min, pre_down_evals_min, kind)
SCENARIOS = [
    ("normal restore", 15, [0, 5], "restored"),
    ("outage tolerance", 40, [0, 5], "no_restore"),
    ("no active alerts", 50, [0, 5], "empty"),
    ("grace period", 25, [0, 5, 10, 15, 20], "grace"),
]


@pytest.mark.parametrize("qoff_min", [0, 1], ids=["queryOffset=0", "queryOffset=1m"])
@pytest.mark.parametrize("name,restore_min,evals_min,kind",
                         SCENARIOS, ids=[s[0] for s in SCENARIOS])
def test_for_state_restore(spark, name, restore_min, evals_min, kind,
                           qoff_min):
    base = _base_rows()

    # phase 1: the original group runs before prometheus "goes down";
    # its ALERTS / ALERTS_FOR_STATE output is appended to storage
    eng1 = RulesEngine(spark, samples_from_rows(spark, base))
    g1 = RuleGroup("default", 1000, [_rule()])
    appended = []
    expected_active = None
    for m in evals_min:
        df, _ = eng1.eval_tick(g1, m * M)
        if df is not None:
            appended += [
                (dict(r["labels"]), r["t"], r["value"])
                for r in df.collect() if not r["stale"]
            ]
        if m == 5:  # the reference snapshots expectedAlerts after the
            # two initial runs (manager_test.go:432 rule.ActiveAlerts())
            expected_active = {
                sig: st["active_since"]
                for sig, st in eng1._alert_state[KEY].items()
            }

    # phase 2: restart — fresh engine over base + appended series
    eng2 = RulesEngine(spark, samples_from_rows(spark, base + appended))
    qoff = qoff_min * M
    g2 = RuleGroup("default", 1000, [_rule()], query_offset_ms=qoff)
    restore_ts = restore_min * M + qoff
    # first eval before restoration — alert series suppressed until the
    # rule is restored (alerting.go:539)
    df, _ = eng2.eval_tick(g2, restore_ts, emit_alert_series=False)
    assert df is None or df.filter("name = 'ALERTS_FOR_STATE'").count() == 0
    eng2.restore_for_state(g2, restore_ts, outage_tolerance_ms=OUTAGE_MS,
                           for_grace_period_ms=GRACE_MS)
    got = eng2._alert_state.get(KEY, {})

    if kind == "empty":
        assert got == {}
        return
    assert len(got) == 2
    if kind == "no_restore":
        # the stored 'for' state is older than the outage tolerance:
        # alerts re-arm at the restore eval timestamp
        for st in got.values():
            assert st["active_since"] == restore_ts
        return
    if kind == "grace":
        # ActiveAt + holdDuration - restoreTime == ForGracePeriod
        for st in got.values():
            assert st["active_since"] + FOR_MS - restore_ts == GRACE_MS
        return
    # normal restore: got.ActiveAt == expected.ActiveAt + downDuration
    # (+ queryOffset), downDuration = restoreTime - downAt = 10m
    down = 10 * M
    assert set(got) == set(expected_active)
    for sig, st in got.items():
        assert st["active_since"] == expected_active[sig] + down + qoff, sig
