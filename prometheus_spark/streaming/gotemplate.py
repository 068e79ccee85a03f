"""A small Go ``text/template`` interpreter for alert/console templates.

The reference expands rule labels/annotations through Go's template
engine with Prometheus' function map (template/template.go:110-293).
This module re-derives the subset that engine exposes to rule authors:

- actions with pipelines ``{{ expr | fn arg | fn2 }}``, parenthesized
  sub-pipelines, variables (``$x := ...``), field chains (``.Labels.job``),
  string/number/bool literals, and trim markers ``{{-`` / ``-}}``
- control structures ``if``/``else if``/``else``, ``range`` (with
  ``$i, $v :=`` declarations and ``else`` on empty), ``with``, and
  ``define``/``template`` invocation with the ``args`` helper
- the Prometheus function map: query/first/label/value/strvalue,
  sortByLabel, reReplaceAll, match, title, toUpper/toLower,
  stripPort/stripDomain, humanize/humanize1024/humanizeDuration/
  humanizePercentage/humanizeTimestamp, toTime/toDuration, now,
  parseDuration, graphLink/tableLink, pathPrefix/externalURL,
  urlQueryEscape, safeHtml, args
- Go builtins used by real rule files: printf, len, index, eq/ne/lt/
  le/gt/ge, and/or/not

Execution errors surface as :class:`TemplateError`; callers mirror the
reference's alerting behavior of substituting
``<error expanding template: ...>`` (rules/alerting.go:427-430).
Numbers render with Go's ``%v`` semantics (strconv 'g' shortest form,
e-notation when the decimal exponent is < -4 or >= 6).
"""

from __future__ import annotations

import math
import re
from decimal import Decimal
from typing import Any, Callable, Optional

__all__ = ["TemplateError", "render_template", "prometheus_funcs"]


class TemplateError(Exception):
    pass


# --- Go %v float formatting -------------------------------------------------


def go_float_string(v: float) -> str:
    """strconv.FormatFloat(v, 'g', -1, 64) — shortest digits, e-form
    when exp10 < -4 or exp10 >= 6 (ftoa.go caps eprec at 6 for
    shortest 'g')."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == 0:
        return "0"
    sign = "-" if v < 0 or (v == 0 and math.copysign(1, v) < 0) else ""
    d = Decimal(repr(abs(v))).normalize()
    sign_, digits, dexp = d.as_tuple()
    nd = len(digits)
    exp10 = dexp + nd - 1
    ds = "".join(map(str, digits))
    if exp10 < -4 or exp10 >= 6:
        mant = ds[0] + ("." + ds[1:] if nd > 1 else "")
        return f"{sign}{mant}e{exp10:+03d}"
    if dexp >= 0:
        return f"{sign}{ds}{'0' * dexp}"
    if -dexp < nd:
        return f"{sign}{ds[:dexp]}.{ds[dexp:]}"
    return f"{sign}0.{'0' * (-dexp - nd)}{ds}"


def _to_string(v: Any) -> str:
    if v is None:
        return "<no value>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_float_string(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple)):
        return "[" + " ".join(_to_string(x) for x in v) + "]"
    if isinstance(v, dict):
        items = " ".join(f"{k}:{_to_string(x)}" for k, x in sorted(v.items()))
        return f"map[{items}]"
    if hasattr(v, "go_string"):
        return v.go_string()
    return str(v)


def _to_float(v: Any) -> float:
    """common_templates.ConvertToFloat — numbers and numeric strings."""
    if isinstance(v, bool) or v is None:
        raise TemplateError(f"can't convert {v!r} to float")
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError as exc:
            raise TemplateError(f"error parsing {v!r}: not a number") from exc
    raise TemplateError(f"can't convert {type(v).__name__} to float")


def _truth(v: Any) -> bool:
    if v is None:
        return False
    if isinstance(v, (list, tuple, dict, str)):
        return len(v) > 0
    if isinstance(v, (int, float)):
        return v != 0
    return bool(v)


# --- lexer ------------------------------------------------------------------

_ACTION_RE = re.compile(r"\{\{(-)?((?:[^{}\"`]|\"(?:[^\"\\]|\\.)*\"|`[^`]*`|\}[^}]|\{[^{])*?)(-)?\}\}")

_TOKEN_RE = re.compile(
    r"""\s*(
      "(?:[^"\\]|\\.)*"          # interpreted string
    | `[^`]*`                    # raw string
    | -?\d+\.\d*(?:[eE][-+]?\d+)?  # float
    | -?\.\d+(?:[eE][-+]?\d+)?   # float .5
    | -?\d+(?:[eE][-+]?\d+)?     # int / exp
    | \$[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*  # $var.path
    | \$                          # bare $ (root var)
    | \.[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*  # .Field.Path
    | \.                          # bare dot
    | :=
    | =
    | \|
    | \(
    | \)
    | ,
    | [A-Za-z_][A-Za-z0-9_]*     # ident
    )""",
    re.VERBOSE,
)


def _tokenize_action(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise TemplateError(f"bad token in action: {src[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _unquote(tok: str) -> str:
    if tok.startswith("`"):
        return tok[1:-1]
    body = tok[1:-1]
    return (
        body.replace("\\\\", "\x00")
        .replace('\\"', '"')
        .replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\\r", "\r")
        .replace("\x00", "\\")
    )


# --- parser -----------------------------------------------------------------
#
# Node shapes (plain tuples keep the tree cheap to build and walk):
#   ("text", s)
#   ("action", pipeline)
#   ("if", [(pipeline, body), ...], else_body)
#   ("range", decls, pipeline, body, else_body)
#   ("with", decls, pipeline, body, else_body)
#   ("template", name_pipeline_args)
# pipeline = ("pipe", decls, assign, [command, ...]); command = [operand,...]
# operand  = ("str"|"num"|"bool"|"nil", v) | ("var", name, path)
#          | ("field", path) | ("fn", name) | ("paren", pipeline)


def _parse_pipeline(tokens: list[str], pos: int = 0):
    decls: list[str] = []
    assign = False
    if (
        pos + 1 < len(tokens)
        and tokens[pos].startswith("$")
        and tokens[pos + 1] in (":=", "=")
    ):
        decls = [tokens[pos]]
        assign = tokens[pos + 1] == "="
        pos += 2
    elif (
        pos + 3 < len(tokens)
        and tokens[pos].startswith("$")
        and tokens[pos + 1] == ","
        and tokens[pos + 2].startswith("$")
        and tokens[pos + 3] in (":=", "=")
    ):
        decls = [tokens[pos], tokens[pos + 2]]
        assign = tokens[pos + 3] == "="
        pos += 4
    commands: list[list] = []
    cur: list = []
    while pos < len(tokens):
        tok = tokens[pos]
        if tok == "|":
            if not cur:
                raise TemplateError("empty command in pipeline")
            commands.append(cur)
            cur = []
            pos += 1
            continue
        if tok == ")":
            break
        operand, pos = _parse_operand(tokens, pos)
        cur.append(operand)
    if cur:
        commands.append(cur)
    if not commands:
        raise TemplateError("missing value for command")
    return ("pipe", decls, assign, commands), pos


def _parse_operand(tokens: list[str], pos: int):
    tok = tokens[pos]
    if tok == "(":
        pipe, pos = _parse_pipeline(tokens, pos + 1)
        if pos >= len(tokens) or tokens[pos] != ")":
            raise TemplateError("unclosed parenthesis")
        pos += 1
        # field access on a paren group: (expr).Field
        if pos < len(tokens) and tokens[pos].startswith("."):
            path = tokens[pos][1:].split(".") if tokens[pos] != "." else []
            return ("parenfield", pipe, path), pos + 1
        return ("paren", pipe), pos
    if tok.startswith('"') or tok.startswith("`"):
        return ("str", _unquote(tok)), pos + 1
    if re.fullmatch(r"-?(\d+\.\d*|\.\d+|\d+)([eE][-+]?\d+)?", tok):
        if "." in tok or "e" in tok or "E" in tok:
            return ("num", float(tok)), pos + 1
        return ("num", int(tok)), pos + 1
    if tok.startswith("$"):
        parts = tok[1:].split(".")
        return ("var", parts[0], parts[1:]), pos + 1
    if tok == ".":
        return ("field", []), pos + 1
    if tok.startswith("."):
        return ("field", tok[1:].split(".")), pos + 1
    if tok == "nil":
        return ("nil", None), pos + 1
    if tok in ("true", "false"):
        return ("bool", tok == "true"), pos + 1
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok):
        return ("fn", tok), pos + 1
    raise TemplateError(f"unexpected token {tok!r}")


def parse_template(text: str):
    """Template text → (node list, {define_name: node list})."""
    nodes: list = []
    defines: dict[str, list] = {}
    # stack of (kind, header, body_nodes, branches) for if/range/with/define
    stack: list[tuple] = []
    cur = nodes
    last = 0
    pending_trim = False

    def emit_text(s: str):
        if pending_trim:
            s = s.lstrip()
        if s:
            cur.append(("text", s))

    for m in _ACTION_RE.finditer(text):
        raw = text[last : m.start()]
        if "{{" in raw:
            raise TemplateError("unclosed action")
        if pending_trim:
            raw = raw.lstrip()
        if m.group(1):
            raw = raw.rstrip()
        if raw:
            cur.append(("text", raw))
        pending_trim = bool(m.group(3))
        last = m.end()
        action = m.group(2).strip()
        if not action:
            raise TemplateError("missing value for command")
        tokens = _tokenize_action(action)
        if not tokens:
            raise TemplateError("missing value for command")
        head = tokens[0]
        if head == "if":
            pipe, _ = _parse_pipeline(tokens, 1)
            stack.append(("if", [(pipe, [])], None, cur))
            cur = stack[-1][1][0][1]
        elif head == "else":
            if not stack:
                raise TemplateError("unexpected {{else}}")
            kind, data, _else, parent = stack[-1]
            if len(tokens) > 1 and tokens[1] == "if":
                if kind != "if":
                    raise TemplateError("unexpected {{else if}}")
                pipe, _ = _parse_pipeline(tokens, 2)
                data.append((pipe, []))
                cur = data[-1][1]
            else:
                new_else: list = []
                stack[-1] = (kind, data, new_else, parent)
                cur = new_else
        elif head == "end":
            if not stack:
                raise TemplateError("unexpected {{end}}")
            kind, data, else_body, parent = stack.pop()
            if kind == "if":
                parent.append(("if", data, else_body or []))
            elif kind == "range":
                decls, pipe, body = data
                parent.append(("range", decls, pipe, body, else_body or []))
            elif kind == "with":
                decls, pipe, body = data
                parent.append(("with", decls, pipe, body, else_body or []))
            elif kind == "define":
                defines[data[0]] = data[1]
            cur = parent
        elif head == "range":
            pipe, _ = _parse_pipeline(tokens, 1)
            body: list = []
            stack.append(("range", (pipe[1], pipe, body), None, cur))
            cur = body
        elif head == "with":
            pipe, _ = _parse_pipeline(tokens, 1)
            body = []
            stack.append(("with", (pipe[1], pipe, body), None, cur))
            cur = body
        elif head == "define":
            if len(tokens) < 2 or not tokens[1].startswith('"'):
                raise TemplateError("define needs a quoted name")
            body = []
            stack.append(("define", (_unquote(tokens[1]), body), None, cur))
            cur = body
        elif head == "template":
            if len(tokens) < 2 or not tokens[1].startswith('"'):
                raise TemplateError("template needs a quoted name")
            arg_pipe = None
            if len(tokens) > 2:
                arg_pipe, _ = _parse_pipeline(tokens, 2)
            cur.append(("template", _unquote(tokens[1]), arg_pipe))
        else:
            pipe, _ = _parse_pipeline(tokens, 0)
            cur.append(("action", pipe))
    if stack:
        raise TemplateError("unclosed {{if}}/{{range}}/{{with}}/{{define}}")
    tail = text[last:]
    if "{{" in tail:
        raise TemplateError("unclosed action")
    if pending_trim:
        tail = tail.lstrip()
    if tail:
        nodes.append(("text", tail))
    return nodes, defines


# --- evaluator ---------------------------------------------------------------


class _Exec:
    def __init__(self, funcs: dict, defines: dict):
        self.funcs = funcs
        self.defines = defines

    def walk(self, nodes: list, dot: Any, vars_: dict, out: list) -> None:
        for node in nodes:
            kind = node[0]
            if kind == "text":
                out.append(node[1])
            elif kind == "action":
                pipe = node[1]
                val = self.pipeline(pipe, dot, vars_)
                if not pipe[1]:  # no variable declaration → print
                    out.append(_to_string(val))
            elif kind == "if":
                done = False
                for pipe, body in node[1]:
                    if _truth(self.pipeline(pipe, dot, vars_)):
                        self.walk(body, dot, vars_, out)
                        done = True
                        break
                if not done:
                    self.walk(node[2], dot, vars_, out)
            elif kind == "range":
                _decls, pipe, body, else_body = node[1], node[2], node[3], node[4]
                val = self.pipeline_value(pipe, dot, vars_)
                decls = pipe[1]
                items: list
                if val is None:
                    items = []
                elif isinstance(val, dict):
                    items = [(k, val[k]) for k in sorted(val)]
                elif isinstance(val, (list, tuple)):
                    items = list(enumerate(val))
                else:
                    raise TemplateError(
                        f"range can't iterate over {_to_string(val)}"
                    )
                if not items:
                    self.walk(else_body, dot, vars_, out)
                    continue
                for k, item in items:
                    inner = dict(vars_)
                    if len(decls) == 2:
                        inner[decls[0][1:]] = k
                        inner[decls[1][1:]] = item
                    elif len(decls) == 1:
                        inner[decls[0][1:]] = item
                    self.walk(body, item, inner, out)
            elif kind == "with":
                _decls, pipe, body, else_body = node[1], node[2], node[3], node[4]
                val = self.pipeline_value(pipe, dot, vars_)
                decls = pipe[1]
                if _truth(val):
                    inner = dict(vars_)
                    if decls:
                        inner[decls[0][1:]] = val
                    self.walk(body, val, inner, out)
                else:
                    self.walk(else_body, dot, vars_, out)
            elif kind == "template":
                name, arg_pipe = node[1], node[2]
                if name not in self.defines:
                    raise TemplateError(f"no such template {name!r}")
                sub_dot = (
                    self.pipeline_value(arg_pipe, dot, vars_)
                    if arg_pipe is not None
                    else None
                )
                self.walk(self.defines[name], sub_dot, {"": sub_dot}, out)

    def pipeline_value(self, pipe, dot, vars_):
        """Pipeline value ignoring declarations (if/range/with headers)."""
        _kind, _decls, _assign, commands = pipe
        val = None
        for i, cmd in enumerate(commands):
            val = self.command(cmd, dot, vars_, val if i else None, bool(i))
        return val

    def pipeline(self, pipe, dot, vars_):
        _kind, decls, assign, commands = pipe
        val = None
        for i, cmd in enumerate(commands):
            val = self.command(cmd, dot, vars_, val if i else None, bool(i))
        if decls:
            if len(decls) != 1:
                raise TemplateError("too many declarations")
            vars_[decls[0][1:]] = val
        return val

    def command(self, cmd, dot, vars_, piped, has_piped):
        op = cmd[0]
        args = [self.operand(a, dot, vars_) for a in cmd[1:]]
        if has_piped:
            args.append(piped)
        if op[0] == "fn":
            fn = self.funcs.get(op[1])
            if fn is None:
                raise TemplateError(f"function {op[1]!r} not defined")
            return fn(*args)
        # a method head keeps its args un-applied during resolution
        base = self.operand(op, dot, vars_, autocall=not args)
        if args:
            if callable(base):
                return base(*args)
            raise TemplateError(f"can't give arguments to {op!r}")
        return base

    def operand(self, op, dot, vars_, autocall: bool = True):
        kind = op[0]
        if kind in ("str", "num", "bool", "nil"):
            return op[1]
        if kind == "var":
            name, path = op[1], op[2]
            if name not in vars_:
                raise TemplateError(f"undefined variable ${name}")
            return self.resolve_path(vars_[name], path, autocall)
        if kind == "field":
            return self.resolve_path(dot, op[1], autocall)
        if kind == "paren":
            return self.pipeline_value(op[1], dot, vars_)
        if kind == "parenfield":
            return self.resolve_path(
                self.pipeline_value(op[1], dot, vars_), op[2], autocall
            )
        if kind == "fn":
            fn = self.funcs.get(op[1])
            if fn is None:
                raise TemplateError(f"function {op[1]!r} not defined")
            return fn()
        raise TemplateError(f"bad operand {op!r}")

    def resolve_path(self, base: Any, path: list[str], autocall: bool = True) -> Any:
        cur = base
        for i, part in enumerate(path):
            if isinstance(cur, dict):
                # missingkey=zero: absent map keys read as the zero value
                cur = cur.get(part, "")
            elif hasattr(cur, part):
                cur = getattr(cur, part)
                # Go invokes niladic methods during field evaluation; the
                # LAST element stays un-called when the command applies args
                if callable(cur) and (autocall or i < len(path) - 1):
                    cur = cur()
            elif cur is None:
                raise TemplateError(f"nil pointer evaluating .{part}")
            else:
                raise TemplateError(
                    f"can't evaluate field {part} in type {type(cur).__name__}"
                )
        return cur


# --- Go time/duration shims ---------------------------------------------------

_GO_LAYOUT_MAP = [
    ("2006", "%Y"), ("01", "%m"), ("02", "%d"), ("15", "%H"),
    ("04", "%M"), ("05", "%S"), ("Jan", "%b"), ("January", "%B"),
    ("Mon", "%a"), ("Monday", "%A"), ("PM", "%p"), ("03", "%I"),
    ("-07:00", "%z"), ("Z07:00", "%z"), ("MST", "%Z"), ("2", "%-d"),
]


class GoTime:
    """Minimal time.Time: .Format(go_layout) + Go String() rendering."""

    def __init__(self, epoch_seconds: float):
        self.epoch = float(epoch_seconds)

    def Format(self, layout: str) -> str:
        import datetime as _dt

        dt = _dt.datetime.fromtimestamp(self.epoch, tz=_dt.timezone.utc)
        out = layout
        for go, py in _GO_LAYOUT_MAP:
            out = out.replace(go, py)
        s = dt.strftime(out)
        return s

    def go_string(self) -> str:
        import datetime as _dt

        ns = round(self.epoch * 1e9)
        sec, nsec = divmod(ns, 1_000_000_000)
        dt = _dt.datetime.fromtimestamp(sec, tz=_dt.timezone.utc)
        frac = ""
        if nsec:
            frac = f".{nsec:09d}".rstrip("0")
        return dt.strftime("%Y-%m-%d %H:%M:%S") + frac + " +0000 UTC"


class GoDuration:
    """Minimal time.Duration with Go's String() format."""

    def __init__(self, seconds: float):
        self.seconds = float(seconds)

    def String(self) -> str:
        ns = round(self.seconds * 1e9)
        if ns == 0:
            return "0s"
        sign = "-" if ns < 0 else ""
        ns = abs(ns)
        if ns < 1_000_000_000:  # sub-second: ns/us/ms
            for unit, div in (("ns", 1), ("µs", 1_000), ("ms", 1_000_000)):
                if ns < div * 1000 or unit == "ms":
                    v = ns / div
                    s = f"{v:g}"
                    return f"{sign}{s}{unit}"
        secs, frac_ns = divmod(ns, 1_000_000_000)
        m, s = divmod(secs, 60)
        h, m = divmod(m, 60)
        s_str = f"{s + frac_ns / 1e9:g}"
        out = f"{s_str}s"
        if m or h:
            out = f"{m}m{out}"
        if h:
            out = f"{h}h{out}"
        return sign + out

    def go_string(self) -> str:
        return self.String()


def _go_re(pattern: str) -> "re.Pattern":
    try:
        return re.compile(pattern)
    except re.error as exc:
        raise TemplateError(f"bad regexp {pattern!r}: {exc}") from exc


def _go_replacement(repl: str) -> str:
    """Go Regexp.ReplaceAllString templates ($1, ${name}) → Python."""
    out = []
    i = 0
    while i < len(repl):
        c = repl[i]
        if c == "\\":
            out.append("\\\\")
            i += 1
        elif c == "$":
            if i + 1 < len(repl) and repl[i + 1] == "$":
                out.append("$")
                i += 2
            elif i + 1 < len(repl) and repl[i + 1] == "{":
                j = repl.index("}", i + 2)
                out.append(f"\\g<{repl[i + 2 : j]}>")
                i = j + 1
            else:
                m = re.match(r"[A-Za-z0-9_]+", repl[i + 1 :])
                if m:
                    out.append(f"\\g<{m.group(0)}>")
                    i += 1 + m.end()
                else:
                    out.append("$")
                    i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


# --- the Prometheus function map ----------------------------------------------


def _g4(v: float) -> str:
    """%.4g with Go's special-value spellings (+Inf/-Inf/NaN)."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    return f"{v:.4g}"


def _humanize(i: Any) -> str:
    v = _to_float(i)
    if v == 0 or math.isnan(v) or math.isinf(v):
        return _g4(v)
    if abs(v) >= 1:
        prefix = ""
        for p in ["k", "M", "G", "T", "P", "E", "Z", "Y"]:
            if abs(v) < 1000:
                break
            prefix = p
            v /= 1000
        return f"{v:.4g}{prefix}"
    prefix = ""
    for p in ["m", "u", "n", "p", "f", "a", "z", "y"]:
        if abs(v) >= 1:
            break
        prefix = p
        v *= 1000
    return f"{v:.4g}{prefix}"


def _humanize1024(i: Any) -> str:
    v = _to_float(i)
    if abs(v) <= 1 or math.isnan(v) or math.isinf(v):
        return _g4(v)
    prefix = ""
    for p in ["ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi", "Yi"]:
        if abs(v) < 1024:
            break
        prefix = p
        v /= 1024
    return f"{v:.4g}{prefix}"


def _humanize_duration(i: Any) -> str:
    """prometheus/common HumanizeDuration: >= 1s truncates to integer
    d/h/m/s fields when any minute-or-larger field is non-zero,
    otherwise 4 significant digits of the original value."""
    v = _to_float(i)
    if math.isnan(v) or math.isinf(v):
        return _g4(v)
    if v == 0:
        return "0s"
    sign = "-" if v < 0 else ""
    v = abs(v)
    if v >= 1:
        duration = int(v)
        seconds = duration % 60
        minutes = (duration // 60) % 60
        hours = (duration // 3600) % 24
        days = duration // 86400
        if days:
            return f"{sign}{days}d {hours}h {minutes}m {seconds}s"
        if hours:
            return f"{sign}{hours}h {minutes}m {seconds}s"
        if minutes:
            return f"{sign}{minutes}m {seconds}s"
        return f"{sign}{v:.4g}s"
    for unit in ("ms", "us", "ns"):
        v *= 1000
        if v >= 1:
            return f"{sign}{v:.4g}{unit}"
    return f"{sign}{v:.4g}ns"


def _humanize_percentage(i: Any) -> str:
    return f"{_to_float(i) * 100:.4g}%"


def _humanize_timestamp(i: Any) -> str:
    v = _to_float(i)
    if math.isnan(v) or math.isinf(v):
        return _g4(v)
    return GoTime(v).go_string()


def _strip_port(host_port: str) -> str:
    """net.SplitHostPort semantics: returns host only when a valid
    port separator exists; IPv6 hosts use [..]:port."""
    if host_port.startswith("["):
        end = host_port.find("]")
        if end != -1 and host_port[end + 1 : end + 2] == ":" and ":" not in host_port[end + 2 :]:
            return host_port[1:end]
        return host_port
    if host_port.count(":") == 1:
        return host_port.split(":")[0]
    return host_port


def _strip_domain(host_port: str) -> str:
    host, port = host_port, ""
    stripped = _strip_port(host_port)
    if stripped != host_port:
        host = stripped
        port = host_port.rsplit(":", 1)[1]
    # IPs pass through unchanged
    if re.fullmatch(r"[0-9.]+", host) or ":" in host:
        return host_port
    host = host.split(".")[0]
    return f"{host}:{port}" if port else host


def _go_printf(fmt: str, *args: Any) -> str:
    """Go fmt.Sprintf subset: %v/%s/%d/%f/%g/%x/%q/%%, widths allowed."""
    out = []
    i = 0
    argi = 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        m = re.match(r"%([-+ #0]*)(\d*)(?:\.(\d+))?([vsdfgexXqt%])", fmt[i:])
        if not m:
            raise TemplateError(f"unsupported printf verb in {fmt!r}")
        flags, width, prec, verb = m.groups()
        i += m.end()
        if verb == "%":
            out.append("%")
            continue
        if argi >= len(args):
            out.append(f"%!{verb}(MISSING)")
            continue
        arg = args[argi]
        argi += 1
        if verb == "v":
            s = _to_string(arg)
        elif verb == "t":
            s = "true" if arg else "false"
        elif verb == "q":
            s = '"' + str(arg).replace("\\", "\\\\").replace('"', '\\"') + '"'
        else:
            pyfmt = "%" + flags + width + (("." + prec) if prec else "") + verb
            try:
                s = pyfmt % (arg,)
            except TypeError as exc:
                raise TemplateError(str(exc)) from exc
        if width and verb == "v":
            w = int(width)
            s = s.rjust(w) if "-" not in flags else s.ljust(w)
        out.append(s)
    return "".join(out)


def prometheus_funcs(
    query_fn: Optional[Callable[[str], list]] = None,
    now_seconds: float = 0.0,
    external_url: str = "",
) -> dict:
    """The reference's template FuncMap (template/template.go:110-293)
    plus the Go builtins rule files use.  ``query_fn(expr)`` returns
    [(labels_dict, value)] rows; omitted → ``query`` raises."""
    import urllib.parse

    def query(q: str) -> list:
        if query_fn is None:
            raise TemplateError("query is not available in this context")
        return [
            {"Labels": dict(labels), "Value": v} for labels, v in query_fn(q)
        ]

    def first(v: list) -> dict:
        if v:
            return v[0]
        raise TemplateError("first() called on vector with no elements")

    def parse_duration(d: str) -> float:
        from prometheus_spark.parser.lexer import parse_duration_ms

        neg = d.startswith("-")
        ms = parse_duration_ms(d[1:] if neg else d)
        return (-ms if neg else ms) / 1000.0

    funcs: dict[str, Callable] = {
        "query": query,
        "first": first,
        "label": lambda label, s: s["Labels"].get(label, ""),
        "value": lambda s: s["Value"],
        "strvalue": lambda s: s["Labels"].get("__value__", ""),
        "args": lambda *a: {f"arg{i}": x for i, x in enumerate(a)},
        "reReplaceAll": lambda pattern, repl, text: _go_re(pattern).sub(
            _go_replacement(repl), text
        ),
        "safeHtml": lambda text: text,
        "match": lambda pattern, s: _go_re(pattern).search(s) is not None,
        "title": lambda s: re.sub(
            r"[A-Za-z0-9']+", lambda m: m.group(0)[0].upper() + m.group(0)[1:], s
        ),
        "toUpper": lambda s: s.upper(),
        "toLower": lambda s: s.lower(),
        "graphLink": lambda expr: "/graph?g0.expr="
        + urllib.parse.quote_plus(expr)
        + "&g0.tab=0",
        "tableLink": lambda expr: "/graph?g0.expr="
        + urllib.parse.quote_plus(expr)
        + "&g0.tab=1",
        "sortByLabel": lambda label, v: sorted(
            v, key=lambda s: s["Labels"].get(label, "")
        ),
        "stripPort": _strip_port,
        "stripDomain": _strip_domain,
        "humanize": _humanize,
        "humanize1024": _humanize1024,
        "humanizeDuration": _humanize_duration,
        "humanizePercentage": _humanize_percentage,
        "humanizeTimestamp": _humanize_timestamp,
        "toTime": lambda i: GoTime(_to_float(i)),
        "toDuration": lambda i: GoDuration(_to_float(i)),
        "now": lambda: now_seconds,
        "pathPrefix": lambda: urllib.parse.urlparse(external_url).path,
        "externalURL": lambda: external_url,
        "parseDuration": parse_duration,
        "urlQueryEscape": urllib.parse.quote_plus,
        # Go template builtins
        "printf": _go_printf,
        "print": lambda *a: "".join(_to_string(x) for x in a),
        "len": lambda v: len(v),
        "index": lambda base, *keys: _index(base, keys),
        "eq": lambda a, *rest: any(a == r for r in rest),
        "ne": lambda a, b: a != b,
        "lt": lambda a, b: a < b,
        "le": lambda a, b: a <= b,
        "gt": lambda a, b: a > b,
        "ge": lambda a, b: a >= b,
        "and": lambda *a: next((x for x in a if not _truth(x)), a[-1]),
        "or": lambda *a: next((x for x in a if _truth(x)), a[-1]),
        "not": lambda v: not _truth(v),
    }
    return funcs


def _index(base: Any, keys: tuple) -> Any:
    cur = base
    for k in keys:
        if isinstance(cur, dict):
            cur = cur.get(k, "")
        elif isinstance(cur, (list, tuple)):
            cur = cur[int(k)]
        else:
            raise TemplateError(f"can't index {type(cur).__name__}")
    return cur


def render_template(
    text: str,
    data: Any,
    funcs: Optional[dict] = None,
    extra_vars: Optional[dict] = None,
) -> str:
    """Parse and execute ``text`` with ``.`` bound to ``data``.  Raises
    :class:`TemplateError` on parse or execution failure."""
    nodes, defines = parse_template(text)
    ex = _Exec(funcs or prometheus_funcs(), defines)
    vars_ = {"": data}
    if extra_vars:
        vars_.update(extra_vars)
    out: list[str] = []
    ex.walk(nodes, data, vars_, out)
    return "".join(out)
