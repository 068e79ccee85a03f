"""Rule unit testing — the reference's ``promtool test rules``
(cmd/promtool/unittest.go) over the Spark rules engine.

A test file declares rule files, an evaluation interval and test groups;
each test group loads ``input_series`` (promqltest series notation),
ticks the rule groups over the eval grid, and asserts

- ``alert_rule_test``: the firing alerts (labels + templated
  annotations) for an alertname at an ``eval_time``
  (unittest.go:330-460), and
- ``promql_expr_test``: instant-query results at an ``eval_time``
  against expected samples (unittest.go:470-520).

Rules inside a group are evaluated sequentially with their output
appended before the next rule runs (rules/group.go Eval), so chained
recording rules inside one group work; groups run in
``group_eval_order``.  Expected histogram samples are not supported yet
(float values only — the promqltest corpus covers histogram semantics).

Usage::

    errs = run_rule_test_file(spark, "tests.yml")   # [] = success
    python -m prometheus_spark.testing.rule_unittest tests.yml
"""

from __future__ import annotations

import glob as _glob
import math
import os
from typing import Optional

import yaml

from prometheus_spark.parser.lexer import parse_duration_ms
from prometheus_spark.parser.printer import format_duration_ms
from prometheus_spark.testing.promqltest import (
    LoadCmd,
    parse_series_labels,
    parse_test_text,
)

DEFAULT_EVAL_INTERVAL_MS = 60_000


def _dur_ms(v, default: int = 0) -> int:
    if v is None or v == "":
        return default
    s = str(v)
    if s == "0":
        return 0
    return parse_duration_ms(s)


def _load_rows(input_series: list[dict], interval_ms: int) -> tuple[list, list]:
    """input_series → (value_rows, stale_rows) via the promqltest
    series/values grammar (unittest.go:562 seriesLoadingString)."""
    text = f"load {format_duration_ms(interval_ms)}\n"
    for s in input_series:
        text += f"  {s['series']} {s.get('values', '')}\n"
    cmds = parse_test_text(text)
    rows: list = []
    stale_rows: list = []
    for cmd in cmds:
        if not isinstance(cmd, LoadCmd):
            continue
        for series in cmd.series:
            for idx, v in series.points:
                t = idx * cmd.interval_ms
                if v is None:
                    continue
                if isinstance(v, str) and v == "stale":
                    stale_rows.append((series.labels, t))
                else:
                    rows.append((series.labels, t, v))
    return rows, stale_rows


def _split_sequential(groups):
    """One synthetic single-rule group per rule, preserving the group
    name (RulesEngine keys state by group-name/rule) — gives the
    reference's sequential append-within-group semantics."""
    from prometheus_spark.streaming.rules import RuleGroup

    out = []
    for g in groups:
        for rule in g.rules:
            out.append(RuleGroup(g.name, 1, [rule]))
    return out


def _almost(a: float, b: float) -> bool:
    if math.isnan(a) and math.isnan(b):
        return True
    if a == b:
        return True
    return math.isclose(a, b, rel_tol=1e-10, abs_tol=1e-12)


def _fmt_alert(labels: dict, annotations: dict) -> str:
    ls = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
    as_ = ",".join(f'{k}="{v}"' for k, v in sorted(annotations.items()))
    return "{" + ls + "}" + (" annotations {" + as_ + "}" if as_ else "")


class _TestGroupRunner:
    def __init__(self, spark, tg: dict, eval_interval_ms: int, rule_groups):
        self.spark = spark
        self.tg = tg
        self.interval_ms = _dur_ms(tg.get("interval"), eval_interval_ms)
        self.eval_interval_ms = eval_interval_ms
        self.rule_groups = _split_sequential(rule_groups)
        self.base_rows, self.base_stale = _load_rows(
            tg.get("input_series") or [], self.interval_ms
        )
        self.rule_rows: list = []  # accumulated rule outputs
        self.rule_stale: list = []

    def _engine_samples(self):
        from prometheus_spark.storage import samples_from_rows

        return samples_from_rows(
            self.spark,
            self.base_rows + self.rule_rows,
            self.base_stale + self.rule_stale,
        )

    def run(self) -> list[str]:
        from prometheus_spark.engine import PromQLEngine
        from prometheus_spark.streaming.rules import RulesEngine

        errs: list[str] = []
        alert_tests: dict[int, list] = {}
        for at in self.tg.get("alert_rule_test") or []:
            if not at.get("alertname"):
                return [
                    "an item under alert_rule_test misses required "
                    f"attribute alertname at eval_time {at.get('eval_time')}"
                ]
            alert_tests.setdefault(_dur_ms(at.get("eval_time")), []).append(at)

        expr_tests = self.tg.get("promql_expr_test") or []
        max_eval = max(
            [t for t in alert_tests]
            + [_dur_ms(t.get("eval_time")) for t in expr_tests]
            + [0]
        )

        eng = RulesEngine(self.spark, self._engine_samples())
        alert_times = sorted(alert_tests)
        curr = 0
        ts = 0
        while ts <= max_eval:
            tick_alerts: list = []
            for group in self.rule_groups:
                eng.engine = PromQLEngine(self.spark, self._engine_samples())
                out, alerts = eng.eval_tick(group, ts)
                tick_alerts += alerts
                if out is not None:
                    # rule output is tiny in unit tests — accumulate
                    # driver-side so the next rule sees it immediately
                    for r in out.collect():
                        if r["stale"]:
                            self.rule_stale.append((dict(r["labels"]), r["t"]))
                        else:
                            self.rule_rows.append(
                                (dict(r["labels"]), r["t"], r["value"])
                            )
            while (
                curr < len(alert_times)
                and ts <= alert_times[curr] < ts + self.eval_interval_ms
            ):
                errs += self._check_alerts(
                    alert_tests[alert_times[curr]], tick_alerts
                )
                curr += 1
            ts += self.eval_interval_ms

        # promql_expr_test (unittest.go:470)
        final_engine = PromQLEngine(self.spark, self._engine_samples())
        for t in expr_tests:
            errs += self._check_expr(final_engine, t)
        return errs

    def _check_alerts(self, cases: list, tick_alerts: list) -> list[str]:
        errs = []
        for case in cases:
            name = case["alertname"]
            key = lambda a: (sorted(a[0].items()), sorted(a[1].items()))  # noqa: E731
            got = sorted(
                (
                    (dict(labels), dict(annots))
                    for (aname, labels, annots, state, _since, _v) in tick_alerts
                    if aname == name and state == "firing"
                ),
                key=key,
            )
            exp = []
            for e in case.get("exp_alerts") or []:
                labels = {
                    str(k): str(v) for k, v in (e.get("exp_labels") or {}).items()
                }
                labels["alertname"] = name
                exp.append((
                    labels,
                    {str(k): str(v)
                     for k, v in (e.get("exp_annotations") or {}).items()},
                ))
            exp.sort(key=key)
            if got != exp:
                errs.append(
                    f"    alertname: {name}, time: "
                    f"{format_duration_ms(_dur_ms(case.get('eval_time')))}, \n"
                    f"        exp: [{', '.join(_fmt_alert(*a) for a in exp)}]\n"
                    f"        got: [{', '.join(_fmt_alert(*a) for a in got)}]"
                )
        return errs

    def _check_expr(self, engine, case: dict) -> list[str]:
        expr = case["expr"]
        at = _dur_ms(case.get("eval_time"))
        try:
            df = engine.instant_query(expr, at)
            rows = df.collect()
        except Exception as e:  # noqa: BLE001 — report as test failure
            return [f"    expr: {expr!r}, time: {at}ms, err: {e}"]
        from prometheus_spark.testing.histogram_literal import (
            parse_histogram_literal,
        )
        from prometheus_spark.testing.promqltest import _values_equal

        got = []
        for r in rows:
            labels = dict(r["labels"]) if "labels" in r.__fields__ else {}
            hv = r["hist"] if "hist" in r.__fields__ else None
            v = hv.asDict(recursive=True) if hv is not None else r["value"]
            got.append((sorted(labels.items()), v))
        exp = []
        for s in case.get("exp_samples") or []:
            labels = parse_series_labels(s.get("labels") or "{}")
            if s.get("histogram"):
                # exp_samples may carry a native-histogram literal
                # (unittest.go parses the same {{...}} spec)
                exp.append((
                    sorted(labels.items()),
                    parse_histogram_literal(str(s["histogram"])),
                ))
            else:
                exp.append((sorted(labels.items()), float(s.get("value", 0))))
        got.sort(key=lambda x: x[0])
        exp.sort(key=lambda x: x[0])
        ok = len(got) == len(exp) and all(
            g[0] == e[0] and _values_equal(e[1], g[1])
            for g, e in zip(got, exp)
        )
        if not ok:
            return [
                f"    expr: {expr!r}, time: {format_duration_ms(at)},\n"
                f"        exp: {exp}\n        got: "
                f"{[(l, v) for l, v in got]}"
            ]
        return []


def run_rule_test_text(spark, text: str, base_dir: str = ".") -> list[str]:
    """Run one unit-test file body; returns error strings ([] = pass)."""
    from prometheus_spark.streaming.rulefmt import load_rule_file

    doc = yaml.safe_load(text) or {}
    eval_interval = _dur_ms(
        doc.get("evaluation_interval"), DEFAULT_EVAL_INTERVAL_MS
    )
    rule_files: list[str] = []
    for pat in doc.get("rule_files") or []:
        if not os.path.isabs(pat):
            pat = os.path.join(base_dir, pat)
        rule_files += sorted(_glob.glob(pat))
    groups = []
    for f in rule_files:
        groups += load_rule_file(f)
    order = {n: i for i, n in enumerate(doc.get("group_eval_order") or [])}
    groups.sort(key=lambda g: order.get(g.name, len(order)))

    errs: list[str] = []
    for i, tg in enumerate(doc.get("tests") or []):
        name = tg.get("name") or f"unnamed#{i}"
        try:
            group_errs = _TestGroupRunner(
                spark, tg, eval_interval, groups
            ).run()
        except Exception as e:  # noqa: BLE001 — surface, keep testing
            group_errs = [f"    test {name}: error: {e}"]
        errs += group_errs
    return errs


def run_rule_test_file(spark, path: str) -> list[str]:
    with open(path) as f:
        text = f.read()
    return run_rule_test_text(spark, text, base_dir=os.path.dirname(path) or ".")


def main(argv: Optional[list] = None) -> int:
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m prometheus_spark.testing.rule_unittest "
              "<test-file.yml> [...]")
        return 2
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rc = 0
    for path in argv:
        errs = run_rule_test_file(spark, path)
        if errs:
            print(f"{path}:  FAILED:")
            for e in errs:
                print(e)
            rc = 1
        else:
            print(f"{path}:  SUCCESS")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
