"""promqltest native-histogram literal parsing + NHCB conversion.

Literal grammar (promqltest/README + unit_testing_rules.md):
``{{schema:1 sum:-0.3 count:3.1 z_bucket:7.1 z_bucket_w:0.05
   buckets:[5.1 10 7] offset:-3 n_buckets:[4.1 5] n_offset:-5
   custom_values:[...] counter_reset_hint:gauge}}``
"""

from __future__ import annotations

import math
import re

_HINTS = {"unknown": 0, "reset": 1, "not_reset": 2, "gauge": 3}

_FIELD_RE = re.compile(
    r"(?P<key>[a-z_]+):\s*(?P<val>\[[^\]]*\]|[^\s}]+)"
)


def _num(s: str) -> float:
    ls = s.lower()
    if ls in ("inf", "+inf"):
        return math.inf
    if ls == "-inf":
        return -math.inf
    if ls == "nan":
        return math.nan
    return float(s)


def parse_histogram_literal(text: str) -> dict:
    """``{{...}}`` body → dict matching model.schema.HISTOGRAM_TYPE."""
    body = text.strip()
    if body.startswith("{{"):
        body = body[2:]
    if body.endswith("}}"):
        body = body[:-2]
    fields: dict = {}
    for m in _FIELD_RE.finditer(body):
        key, val = m.group("key"), m.group("val")
        if val.startswith("["):
            fields[key] = [_num(x) for x in val[1:-1].split()]
        elif key == "counter_reset_hint":
            fields[key] = val
        else:
            fields[key] = _num(val)

    pos_buckets = fields.get("buckets", [])
    neg_buckets = fields.get("n_buckets", [])
    pos_offset = int(fields.get("offset", 0))
    neg_offset = int(fields.get("n_offset", 0))
    # one contiguous span; the literal's `offset` is the index of the
    # first bucket, which is exactly the reference's span-offset meaning
    pos_spans = [(pos_offset, len(pos_buckets))] if pos_buckets else []
    neg_spans = [(neg_offset, len(neg_buckets))] if neg_buckets else []

    return {
        "schema": int(fields.get("schema", 0)),
        "zero_threshold": float(fields.get("z_bucket_w", 0.0)),
        "zero_count": float(fields.get("z_bucket", 0.0)),
        "count": float(fields.get("count", 0.0)),
        "sum": float(fields.get("sum", 0.0)),
        "pos_spans": [{"offset": o, "length": l} for o, l in pos_spans],
        "pos_buckets": pos_buckets,
        "neg_spans": [{"offset": o, "length": l} for o, l in neg_spans],
        "neg_buckets": neg_buckets,
        "custom_values": fields.get("custom_values", []),
        "counter_reset_hint": _HINTS.get(fields.get("counter_reset_hint", "unknown"), 0),
    }


def nhcb_from_buckets(le_counts: list[tuple[float, float]], total: float, ssum: float) -> dict:
    """Classic cumulative ``le`` buckets → native histogram with custom
    buckets (schema −53), mirroring model/textparse/nhcbparse.go intent:
    custom_values = finite le bounds; bucket counts de-cumulated; +Inf
    becomes the implicit overflow bucket."""
    finite = [(le, c) for le, c in sorted(le_counts) if not math.isinf(le)]
    inf_count = None
    for le, c in le_counts:
        if math.isinf(le) and le > 0:
            inf_count = c
    custom_values = [le for le, _ in finite]
    abs_counts = []
    prev = 0.0
    for _, c in finite:
        abs_counts.append(max(c - prev, 0.0))
        prev = c
    if inf_count is not None:
        abs_counts.append(max(inf_count - prev, 0.0))
    count = inf_count if inf_count is not None else prev
    return {
        "schema": -53,
        "zero_threshold": 0.0,
        "zero_count": 0.0,
        "count": float(total if total is not None else count),
        "sum": float(ssum or 0.0),
        "pos_spans": [{"offset": 0, "length": len(abs_counts)}] if abs_counts else [],
        "pos_buckets": abs_counts,
        "neg_spans": [],
        "neg_buckets": [],
        "custom_values": custom_values,
        "counter_reset_hint": 0,
    }
