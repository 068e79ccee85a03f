"""Differential parity: JVM fast-path exposition parse vs Python parser.

The hybrid `parse_exposition_df` routes backslash-free classic lines
through Catalyst expressions; these tests pin that both paths produce
identical rows across the grammar the classifier accepts, and that
classifier rejects (escapes, quoted names, exotic floats) still parse
correctly via the Python fallback inside the same hybrid plan.
"""

from __future__ import annotations

import math
import random

import pytest

from prometheus_spark.sources.promtext import (
    _FAST_LINE_RE,
    _parse_python,
    parse_exposition_df,
    to_samples,
)


def _norm(rows):
    out = []
    for r in rows:
        v = r["value"]
        v = "NaN" if v is not None and math.isnan(v) else v
        out.append(
            (tuple(r["label_keys"]), tuple(r["label_values"]), r["t"], v)
        )
    return sorted(out)


def _both(spark, lines, ts=None):
    rows = [(ln, 777) for ln in lines] if ts else [(ln,) for ln in lines]
    schema = "line string, ts long" if ts else "line string"
    df = spark.createDataFrame(rows, schema)
    hybrid = parse_exposition_df(df, ts_col="ts" if ts else None)
    python = _parse_python(
        df.select(*(["line", "ts"] if ts else ["line"])),
        "line",
        "ts" if ts else None,
    )
    return _norm(hybrid.collect()), _norm(python.collect())


FAST_VALUES = [
    "0", "1", "-1", "42.5", "-0.25", ".5", "5.", "1e3", "-2.5E-2",
    "+inf", "inf", "Inf", "-Inf", "NaN", "nan", "-nan", "+NAN", "1e400",
]
TS = ["", " 0", " 1700000000123", " -5"]


def _fast_lines():
    rng = random.Random(11)
    lines = []
    for i, v in enumerate(FAST_VALUES):
        lines.append(f"metric_{i} {v}{TS[i % len(TS)]}")
    # label-block shapes: spaces, trailing commas, tricky values
    lines += [
        'm0{} 1',
        'm1{a="b"} 2 123',
        'm2{a="b",c="d"} 3',
        'm3{ a = "b" , c = "d" } 4',
        'm4{a="b",} 5 -9',
        'm5{a=""} 6',
        'm6{a=" x y "} 7',
        'm7{a="x=y"} 8',
        'm8{a="v{w}",b="}"} 9',
        'm9{a="comma, inside"} 10',
        'm10{a="tab\tchar"} 11',
        "  spaced_line 12 13  ",
        'colon:name{a="b"} 14',
        '_underscore 15',
    ]
    for i in range(60):
        nl = rng.randint(0, 4)
        pairs = ",".join(
            f'k{j}="v{rng.randint(0, 9)} {rng.randint(0, 9)}"'
            for j in range(nl)
        )
        body = f"{{{pairs}}}" if nl else ""
        lines.append(f"gen_{i}{body} {rng.uniform(-100, 100):.6g}")
    return lines


SLOW_LINES = [
    r'esc{a="x\"y"} 1',
    r'esc2{a="line\nbreak"} 2 5',
    r'esc3{a="back\\slash"} 3',
    '{"utf8.name","l.x"="v"} 4',
    '{"just.name"} 5',
    "under_val 1_0",
    "longts 1 123456789012345678901",
]


def test_fast_lines_match_python(spark):
    lines = _fast_lines()
    # every intended-fast line must actually classify fast
    import re

    cre = re.compile(_FAST_LINE_RE)
    for ln in lines:
        assert cre.match(ln.strip()), f"expected fast: {ln!r}"
    got, want = _both(spark, lines)
    assert got == want
    assert len(got) == len(lines)


def test_fast_lines_match_python_with_ts_col(spark):
    got, want = _both(spark, _fast_lines(), ts=True)
    assert got == want
    # a ts-less line picked up the default from the ts column
    assert any(t == 777 for (_, _, t, _) in got)


def test_slow_lines_fall_back(spark):
    import re

    cre = re.compile(_FAST_LINE_RE)
    parseable = SLOW_LINES[:5]  # the last two raise downstream/at Arrow
    for ln in parseable:
        assert not cre.match(ln.strip()), f"expected slow: {ln!r}"
    got, want = _both(spark, parseable)
    assert got == want
    assert len(got) == len(parseable)


def test_comments_and_blanks_skipped(spark):
    lines = ["# HELP m help", "# TYPE m counter", "", "   ", "m 1"]
    got, want = _both(spark, lines)
    assert got == want
    assert len(got) == 1


def test_invalid_line_still_errors(spark):
    df = spark.createDataFrame([("not a metric !!",)], "line string")
    with pytest.raises(Exception, match="invalid exposition line"):
        parse_exposition_df(df).collect()


def test_to_samples_roundtrip_on_fast_path(spark):
    df = spark.createDataFrame(
        [('m{a="1"} 2.5 1000',)], "line string"
    )
    rows = to_samples(parse_exposition_df(df)).collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "m"
    assert rows[0]["labels"] == {"__name__": "m", "a": "1"}
    assert rows[0]["t"] == 1000 and rows[0]["value"] == 2.5
