"""PromQL lexer.

Token inventory follows the reference lexer (promql/parser/lex.go); this is
a fresh regex-based implementation, not a translation of its state machine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class ParseError(Exception):
    pass


@dataclass(frozen=True)
class Token:
    kind: str  # NUMBER DURATION STRING IDENT OP EOF
    text: str
    pos: int


_DURATION_RE = re.compile(r"(?:\d+(?:\.\d+)?(?:ms|s|m|h|d|w|y))+")
_NUMBER_RE = re.compile(
    r"0[xX][0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?|[iI][nN][fF]|[nN][aA][nN]"
)
# identifiers may contain colons (recording-rule names) but not start with one
_IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_:]*")
_OPS = [
    "==", "!=", "=~", "!~", "<=", ">=", "</", ">/",
    "+", "-", "*", "/", "%", "^",
    "(", ")", "{", "}", "[", "]", ",", "@", ":", "<", ">", "=",
]
_STRING_RE = re.compile(
    r'"(?:\\.|[^"\\])*"' r"|'(?:\\.|[^'\\])*'" r"|`[^`]*`"
)
_WS_RE = re.compile(r"(?:\s+|#[^\n]*)+")

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'", "a": "\a",
            "b": "\b", "f": "\f", "v": "\v"}

_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
            "d": 86_400_000, "w": 604_800_000, "y": 31_536_000_000}
_DUR_PART = re.compile(r"(\d+(?:\.\d+)?)(ms|s|m|h|d|w|y)")


def parse_duration_ms(text: str) -> int:
    """``1h30m`` → milliseconds.  A bare number is seconds (3.x syntax)."""
    if _DURATION_RE.fullmatch(text):
        return int(sum(float(n) * _UNIT_MS[u] for n, u in _DUR_PART.findall(text)))
    try:
        return int(float(text) * 1000)
    except ValueError:
        raise ParseError(f"invalid duration: {text!r}")


def unquote(text: str) -> str:
    if text.startswith("`"):
        return text[1:-1]
    body = text[1:-1]
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "x" and i + 3 < len(body):
                out.append(chr(int(body[i + 2 : i + 4], 16)))
                i += 4
                continue
            if n in "uU":
                width = 4 if n == "u" else 8
                out.append(chr(int(body[i + 2 : i + 2 + width], 16)))
                i += 2 + width
                continue
            out.append(n)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    while i < n:
        m = _WS_RE.match(src, i)
        if m:
            i = m.end()
            continue
        m = _STRING_RE.match(src, i)
        if m:
            toks.append(Token("STRING", m.group(), i))
            i = m.end()
            continue
        m = _DURATION_RE.match(src, i)
        # durations win over numbers only when a unit is present and the
        # next char doesn't extend an identifier (e.g. `5m` yes, `5mx` no)
        if m and not _IDENT_RE.match(src, m.end() - 1 if src[m.end() - 1].isalpha() else m.end()):
            pass  # fallthrough to simpler check below
        if m:
            nxt = src[m.end()] if m.end() < n else ""
            if not (nxt.isalnum() or nxt == "_"):
                toks.append(Token("DURATION", m.group(), i))
                i = m.end()
                continue
        m = _NUMBER_RE.match(src, i)
        if m:
            nxt = src[m.end()] if m.end() < n else ""
            is_word = m.group()[0].isalpha()
            if not (is_word and nxt and (nxt.isalnum() or nxt in "_:")):
                toks.append(Token("NUMBER", m.group(), i))
                i = m.end()
                continue
        m = _IDENT_RE.match(src, i)
        if m:
            toks.append(Token("IDENT", m.group(), i))
            i = m.end()
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(Token("OP", op, i))
                i += len(op)
                break
        else:
            raise ParseError(f"unexpected character {src[i]!r} at position {i}")
    toks.append(Token("EOF", "", n))
    return toks
