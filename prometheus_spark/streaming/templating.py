"""Alert label/annotation template expansion.

The reference expands alert rule labels and annotations as Go templates
with the convenience bindings ``$labels``, ``$value``, ``$externalLabels``
and ``$externalURL`` (rules/alerting.go:406-433, template/template.go:299
AlertTemplateData) plus formatting helpers (template.go ``humanize*``).

We implement the subset those bindings cover — which is the overwhelming
majority of real rule files — as a direct string expansion; arbitrary Go
template programs (range/if/printf) are out of scope and are left
untouched in the output.
"""

from __future__ import annotations

import math
import re

__all__ = ["expand_template", "go_value_string"]


def go_value_string(v: float) -> str:
    """Render a float the way Go's %v does (strconv 'g', shortest form):
    integral values lose the trailing .0; specials spell out."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    s = repr(v)
    if "e" in s:
        m, e = s.split("e")
        s = f"{m}e{int(e):+03d}"
    return s


_SI_PREFIXES = ["", "k", "M", "G", "T", "P", "E", "Z", "Y"]
_SI_FRACTIONS = ["", "m", "u", "n", "p", "f", "a", "z", "y"]


def _humanize(v: float) -> str:
    """template.go humanize: SI-prefixed, 4 significant digits."""
    if math.isnan(v) or math.isinf(v):
        return go_value_string(v)
    if v == 0:
        return "0"
    sign = "-" if v < 0 else ""
    v = abs(v)
    if v >= 1:
        i = 0
        while v >= 1000 and i < len(_SI_PREFIXES) - 1:
            v /= 1000
            i += 1
        return f"{sign}{v:.4g}{_SI_PREFIXES[i]}"
    i = 0
    while v < 1 and i < len(_SI_FRACTIONS) - 1:
        v *= 1000
        i += 1
    return f"{sign}{v:.4g}{_SI_FRACTIONS[i]}"


def _humanize1024(v: float) -> str:
    if math.isnan(v) or math.isinf(v) or abs(v) < 1024:
        return f"{v:.4g}"
    prefixes = ["", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi", "Yi"]
    sign = "-" if v < 0 else ""
    v = abs(v)
    i = 0
    while v >= 1024 and i < len(prefixes) - 1:
        v /= 1024
        i += 1
    return f"{sign}{v:.4g}{prefixes[i]}"


def _humanize_percentage(v: float) -> str:
    return f"{v * 100:.4g}%"


def _humanize_duration(v: float) -> str:
    """template.go humanizeDuration: days/hours/minutes/seconds."""
    if math.isnan(v) or math.isinf(v):
        return go_value_string(v)
    if v == int(v):
        t = int(abs(v))
        sign = "-" if v < 0 else ""
        d, rem = divmod(t, 86400)
        h, rem = divmod(rem, 3600)
        m, s = divmod(rem, 60)
        if d:
            return f"{sign}{d}d {h}h {m}m {s}s"
        if h:
            return f"{sign}{h}h {m}m {s}s"
        if m:
            return f"{sign}{m}m {s}s"
        return f"{sign}{s}s"
    if abs(v) >= 1:
        return f"{v:.4g}s"
    # sub-second: milli/micro/nano
    sign = "-" if v < 0 else ""
    a = abs(v)
    for unit in ("ms", "us", "ns"):
        a *= 1000
        if a >= 1:
            return f"{sign}{a:.4g}{unit}"
    return f"{sign}{a:.4g}ns"


_PIPES = {
    "humanize": _humanize,
    "humanize1024": _humanize1024,
    "humanizePercentage": _humanize_percentage,
    "humanizeDuration": _humanize_duration,
}

_EXPR_RE = re.compile(
    r"\{\{-?\s*"
    r"(?:(?P<pipe>\w+)\s+)?"  # optional leading pipeline fn: {{ humanize $value }}
    r"(?P<var>\$labels\.(?P<lname>[a-zA-Z_][a-zA-Z0-9_]*)"
    r"|\$externalLabels\.(?P<ename>[a-zA-Z_][a-zA-Z0-9_]*)"
    r"|\$value|\$externalURL|\.Labels\.(?P<dotl>[a-zA-Z_][a-zA-Z0-9_]*)|\.Value)"
    r"(?:\s*\|\s*(?P<pipe2>\w+))?"  # trailing pipeline: {{ $value | humanize }}
    r"\s*-?\}\}"
)


def expand_template(
    text: str,
    labels: dict[str, str],
    value: float,
    external_labels: dict[str, str] | None = None,
    external_url: str = "",
) -> str:
    """Expand the supported ``{{ ... }}`` expressions in ``text``.

    Unsupported template constructs are left verbatim (the reference
    would render a template error string; leaving the source visible is
    the more debuggable behavior for a non-Go engine).
    """
    if "{{" not in text:
        return text
    ext = external_labels or {}

    def sub(m: re.Match) -> str:
        var = m.group("var")
        if var == "$value" or var == ".Value":
            base = value
        elif var == "$externalURL":
            return external_url
        elif m.group("lname") is not None:
            return labels.get(m.group("lname"), "")
        elif m.group("dotl") is not None:
            return labels.get(m.group("dotl"), "")
        elif m.group("ename") is not None:
            return ext.get(m.group("ename"), "")
        else:  # pragma: no cover — regex exhausts the cases above
            return m.group(0)
        fn = m.group("pipe") or m.group("pipe2")
        if fn:
            impl = _PIPES.get(fn)
            if impl is None:
                return m.group(0)
            return impl(base)
        return go_value_string(base)

    return _EXPR_RE.sub(sub, text)
