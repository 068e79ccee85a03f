"""Go text/template interpreter tests — the scenarios are transcribed
from the reference's template/template_test.go so the annotation
surface matches byte-for-byte (query pipelines, reReplaceAll, range/if,
humanize family, stripPort/stripDomain, toTime/toDuration/now)."""

import math

import pytest

from prometheus_spark.streaming.gotemplate import (
    TemplateError,
    prometheus_funcs,
    render_template,
)
from prometheus_spark.streaming.templating import expand_template


def _query_fn(expr):
    """Canned vector mirroring template_test.go's storage fixture."""
    if expr == "1.5":
        return [({}, 1.5)]
    if expr.startswith("metric"):
        rows = [
            ({"__name__": "metric", "instance": "a", "__value__": "a"}, 11.0),
            ({"__name__": "metric", "instance": "b"}, 21.0),
        ]
        if "instance='a'" in expr:
            return rows[:1]
        if "__value__" in expr:
            return rows[:1]
        return rows
    return []


_FUNCS = prometheus_funcs(
    query_fn=_query_fn,
    now_seconds=1353755652.0,
    external_url="http://testhost:9090/path/prefix",
)


def _run(text, data=None):
    return render_template(text, data, funcs=_FUNCS)


# (text, input, expected) — transcribed from template_test.go scenarios
SCENARIOS = [
    ("plain text", None, "plain text"),
    ("{{ 1 }}", None, "1"),
    ('{{ "<b>" | safeHtml }}', None, "<b>"),
    ('{{define "x"}}{{.arg0}} {{.arg1}}{{end}}{{template "x" (args 1 "2")}}',
     None, "1 2"),
    ('{{ query "1.5" | first | value }}', None, "1.5"),
    ("{{ query \"metric{instance='a'}\" | first | value }}", None, "11"),
    ("{{ query \"metric{instance='a'}\" | first | label \"instance\" }}",
     None, "a"),
    ("{{ query \"metric{__value__='a'}\" | first | strvalue }}", None, "a"),
    ("{{ query \"metric{instance='a'}\" | first | label \"foo\" }}", None, ""),
    ('{{ $x := query "metric" | first }}{{ $x.Labels.foo }}', None, ""),
    ('{{ range query "metric" | sortByLabel "instance" }}'
     "{{.Labels.instance}}:{{.Value}}: {{end}}", None, "a:11: b:21: "),
    ('{{ "foo.example.com" | stripPort }}', None, "foo.example.com"),
    ('{{ "foo.example.com:12345" | stripPort }}', None, "foo.example.com"),
    ('{{ "192.0.2.1" | stripPort }}', None, "192.0.2.1"),
    ('{{ "192.0.2.1:12345" | stripPort }}', None, "192.0.2.1"),
    ('{{ "2001:0DB8::1" | stripPort }}', None, "2001:0DB8::1"),
    ('{{ "[2001:0DB8::1]:12345" | stripPort }}', None, "2001:0DB8::1"),
    ('{{ "[2001:0DB8::1]::12345" | stripPort }}', None, "[2001:0DB8::1]::12345"),
    ('{{ reReplaceAll "(a)b" "x$1" "ab" }}', None, "xa"),
    ("{{ range . }}{{ humanize . }}:{{ end }}",
     [0.0, 1.0, 1234567.0, 0.12], "0:1:1.235M:120m:"),
    ("{{ range . }}{{ humanize1024 . }}:{{ end }}",
     [0.0, 1.0, 1048576.0, 0.12], "0:1:1Mi:0.12:"),
    ("{{ range . }}{{ humanizeDuration . }}:{{ end }}",
     [0.0, 1.0, 60.0, 3600.0, 86400.0, 86400.0 + 3600,
      -(86400 * 2 + 3600 * 3 + 60 * 4 + 5.0), 899.99],
     "0s:1s:1m 0s:1h 0m 0s:1d 0h 0m 0s:1d 1h 0m 0s:-2d 3h 4m 5s:14m 59s:"),
    ("{{ range . }}{{ humanizeDuration . }}:{{ end }}",
     [0.1, 0.0001, 0.12345, 60.1, 60.5, 1.2345, 12.345],
     "100ms:100us:123.5ms:1m 0s:1m 0s:1.234s:12.35s:"),
    ("{{ range . }}{{ humanize . }}:{{ humanize1024 . }}:"
     "{{ humanizeDuration . }}:{{humanizeTimestamp .}}:{{ end }}",
     [float("inf"), float("-inf"), float("nan")],
     "+Inf:+Inf:+Inf:+Inf:-Inf:-Inf:-Inf:-Inf:NaN:NaN:NaN:NaN:"),
    ("{{ -0.22222 | humanizePercentage }}:{{ 0.0 | humanizePercentage }}:"
     "{{ 0.1234567 | humanizePercentage }}:{{ 1.23456 | humanizePercentage }}",
     None, "-22.22%:0%:12.35%:123.5%"),
    ('{{ "-0.22222" | humanizePercentage }}:{{ "0.0" | humanizePercentage }}:'
     '{{ "0.1234567" | humanizePercentage }}:{{ "1.23456" | humanizePercentage }}',
     None, "-22.22%:0%:12.35%:123.5%"),
    ("{{ range . }}{{ humanizeTimestamp . }}:{{ end }}",
     [0.0, -1.0, 1.0, 1234567.0, 9223372036.0],
     "1970-01-01 00:00:00 +0000 UTC:1969-12-31 23:59:59 +0000 UTC:"
     "1970-01-01 00:00:01 +0000 UTC:1970-01-15 06:56:07 +0000 UTC:"
     "2262-04-11 23:47:16 +0000 UTC:"),
    ("{{ 1435065584.128 | humanizeTimestamp }}", None,
     "2015-06-23 13:19:44.128 +0000 UTC"),
    ('{{ "1435065584.128" | humanizeTimestamp }}', None,
     "2015-06-23 13:19:44.128 +0000 UTC"),
    ('{{ (1435065584.128 | toTime).Format "2006" }}', None, "2015"),
    ('{{ ("1435065584.128" | toTime).Format "2006" }}', None, "2015"),
    ("{{ (1800 | toDuration).String }}", None, "30m0s"),
    ('{{ ("1800" | toDuration).String }}', None, "30m0s"),
    ("{{ now }}", None, "1.353755652e+09"),
    ('{{ (now | toTime).Format "Mon Jan 2 15:04:05 2006" }}', None,
     "Sat Nov 24 11:14:12 2012"),
    ("{{ pathPrefix }}", None, "/path/prefix"),
    ("{{ externalURL }}", None, "http://testhost:9090/path/prefix"),
    ('{{ graphLink "up" }}', None, "/graph?g0.expr=up&g0.tab=0"),
    ('{{ tableLink "up" }}', None, "/graph?g0.expr=up&g0.tab=1"),
    ('{{ parseDuration "1h2m10s12ms" }}', None, "3730.012"),
    ('{{ "a b-c" | title }}', None, "A B-C"),
    ('{{ "AbC" | toUpper }}', None, "ABC"),
    ('{{ "AbC" | toLower }}', None, "abc"),
    ('{{ match "^a" "abc" }}', None, "true"),
    ('{{ match "^b" "abc" }}', None, "false"),
    ("{{ if eq 1 1 }}yes{{ else }}no{{ end }}", None, "yes"),
    ("{{ if eq 1 2 }}a{{ else if eq 2 2 }}b{{ else }}c{{ end }}", None, "b"),
    ("{{ with .Labels }}{{ .job }}{{ end }}", {"Labels": {"job": "j"}}, "j"),
    ("{{ .Foo }}", {}, ""),  # missingkey=zero on maps
]


@pytest.mark.parametrize("text,data,expected", SCENARIOS)
def test_template_scenarios(text, data, expected):
    assert _run(text, data) == expected


FAILING = [
    "{{ }}",
    "{{",
    '{{ query "missing" | first }}',
    '{{ humanize "one" }}',
    '{{ humanize1024 "one" }}',
    '{{ humanizeDuration "one" }}',
    '{{ "one" | humanizePercentage }}',
    "{{ range . }}{{ humanizeTimestamp . }}:{{ end }}",  # strings below
]


@pytest.mark.parametrize("text", FAILING[:7])
def test_template_failures(text):
    with pytest.raises(TemplateError):
        _run(text)


def test_humanize_timestamp_string_error():
    with pytest.raises(TemplateError):
        _run("{{ range . }}{{ humanizeTimestamp . }}:{{ end }}", ["one"])


def test_expand_template_alert_bindings():
    labels = {"instance": "host:9100", "job": "node"}
    out = expand_template(
        "Instance {{ $labels.instance | stripPort }} of {{ $labels.job }} "
        "is at {{ $value | humanizePercentage }}",
        labels,
        0.123,
    )
    assert out == "Instance host of node is at 12.3%"


def test_expand_template_re_replace_all():
    out = expand_template(
        '{{ reReplaceAll "(\\\\w+):\\\\d+" "$1" $labels.instance }}',
        {"instance": "host:9100"},
        1.0,
    )
    assert out == "host"


def test_expand_template_if_range():
    out = expand_template(
        "{{ if gt $value 10.0 }}HIGH{{ else }}low{{ end }}", {}, 42.0
    )
    assert out == "HIGH"
    out = expand_template(
        "{{ range .Labels }}[{{ . }}]{{ end }}", {"a": "x", "b": "y"}, 0.0
    )
    assert out == "[x][y]"  # maps range in sorted key order


def test_expand_template_query_binding():
    out = expand_template(
        '{{ query "1.5" | first | value }}',
        {},
        0.0,
        query_fn=_query_fn,
    )
    assert out == "1.5"


def test_expand_template_error_marker():
    out = expand_template("{{ nosuchfunc 1 }}", {}, 0.0)
    assert out.startswith("<error expanding template:")


def test_go_float_rendering():
    assert _run("{{ . }}", 42.0) == "42"
    assert _run("{{ . }}", 1.25) == "1.25"
    assert _run("{{ . }}", 1353755652.0) == "1.353755652e+09"
    assert _run("{{ . }}", 100000.0) == "100000"
    assert _run("{{ . }}", 1000000.0) == "1e+06"
    assert _run("{{ . }}", 0.0015) == "0.0015"
    assert _run("{{ . }}", 0.00001) == "1e-05"
    assert _run("{{ . }}", float("nan")) == "NaN"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="{}$.|()\"' abcdefif range end with hum", max_size=60))
def test_template_never_crashes_unexpectedly(text):
    """Arbitrary template-ish input either renders or raises
    TemplateError — never an unhandled exception (the rule evaluator
    relies on catching TemplateError to emit the reference's error
    marker)."""
    try:
        render_template(text, {"Labels": {"a": "b"}, "Value": 1.0}, funcs=_FUNCS)
    except TemplateError:
        pass


def test_expand_template_handles_garbage():
    out = expand_template("{{ $value | ", {"a": "b"}, 1.0)
    assert out.startswith("<error expanding template:")
    out2 = expand_template("{{ if }}x{{ end }}", {}, 0.0)
    assert out2.startswith("<error expanding template:")
