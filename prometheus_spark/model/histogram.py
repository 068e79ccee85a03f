"""Native-histogram math — sparse exponential-bucket histograms.

Semantics re-derived from the reference's float histogram model
(model/histogram/float_histogram.go, promql/quantile.go:225
``HistogramQuantile`` / quantile.go:400 ``HistogramFraction``):

- ``schema`` n ∈ [−4, 8]: bucket i spans (2^(2^−n·(i−1)), 2^(2^−n·i)];
  negative buckets mirror.  ``schema`` −53: custom bounds from
  ``custom_values`` (NHCB — classic histograms in native form).
- buckets are span-encoded: runs of (offset, length) over bucket indexes;
  float histograms store absolute per-bucket counts.

This module is driver/worker-side Python: it executes inside Arrow-batched
pandas UDFs (one call per vector row), mirroring case (b) of the custom-
operator guidance — the bucket walk is irreducibly sequential per sample.
"""

from __future__ import annotations

import math
from bisect import bisect_left
from dataclasses import dataclass, field
from typing import Iterator, Optional

CUSTOM_BUCKETS_SCHEMA = -53

# counter_reset_hint values (reference: model/histogram/histogram.go:26-34)
UNKNOWN_RESET = 0
COUNTER_RESET = 1
NOT_COUNTER_RESET = 2
GAUGE_TYPE = 3


class HistIncompatibleSchema(Exception):
    """Mix of exponential and custom-bucket schemas in one operation
    (reference: float_histogram.go ``checkSchemaAndBounds``)."""


def _fdiv(a: float, b: float) -> float:
    """IEEE-754 float division (Go semantics; Python raises on /0)."""
    if b != 0:
        return a / b
    if a == 0 or math.isnan(a):
        return math.nan
    return math.copysign(math.inf, a) * math.copysign(1.0, b)


@dataclass
class FloatHist:
    schema: int = 0
    zero_threshold: float = 0.0
    zero_count: float = 0.0
    count: float = 0.0
    sum: float = 0.0
    pos_spans: list = field(default_factory=list)  # [(offset, length)]
    pos_buckets: list = field(default_factory=list)  # absolute counts
    neg_spans: list = field(default_factory=list)
    neg_buckets: list = field(default_factory=list)
    custom_values: list = field(default_factory=list)
    counter_reset_hint: int = 0  # 0 unknown 1 reset 2 not_reset 3 gauge

    # ------------------------------------------------------------------
    def uses_custom_buckets(self) -> bool:
        return self.schema == CUSTOM_BUCKETS_SCHEMA

    def _indexes(self, spans) -> list[int]:
        # reference wire format: a span's offset positions its first bucket
        # index directly (first span absolute, later spans relative gaps)
        out, idx = [], 0
        for off, length in spans:
            idx += off
            for _ in range(int(length)):
                out.append(idx)
                idx += 1
        return out

    def _exp_bounds(self, idx: int) -> tuple[float, float]:
        # bucket idx: (base^(idx-1), base^idx] with base = 2^(2^-schema)
        frac = 2.0**-self.schema
        return 2.0 ** (frac * (idx - 1)), 2.0 ** (frac * idx)

    def _custom_bounds(self, idx: int) -> tuple[float, float]:
        # custom buckets (0-based): idx 0 → (-Inf, cv[0]];
        # idx i → (cv[i-1], cv[i]]; past the last bound → (cv[-1], +Inf)
        cv = self.custom_values
        lower = -math.inf if idx <= 0 else cv[idx - 1]
        upper = cv[idx] if idx < len(cv) else math.inf
        return lower, upper

    def all_buckets(self) -> list[tuple[float, float, float]]:
        """[(lower, upper, count)] in ascending value order: negative
        buckets (descending index → ascending value), zero bucket,
        positive buckets."""
        out = []
        if not self.uses_custom_buckets():
            neg = list(zip(self._indexes(self.neg_spans), self.neg_buckets))
            for idx, c in reversed(neg):
                lo, up = self._exp_bounds(idx)
                out.append((-up, -lo, float(c)))
            if self.zero_count or self.zero_threshold:
                out.append((-self.zero_threshold, self.zero_threshold, float(self.zero_count)))
            for idx, c in zip(self._indexes(self.pos_spans), self.pos_buckets):
                lo, up = self._exp_bounds(idx)
                out.append((lo, up, float(c)))
        else:
            for idx, c in zip(self._indexes(self.pos_spans), self.pos_buckets):
                lo, up = self._custom_bounds(idx)
                out.append((lo, up, float(c)))
        return out

    # ------------------------------------------------------------------
    def go_string(self) -> str:
        """The reference's FloatHistogram.String() rendering
        (model/histogram/float_histogram.go:177): ``{count:%g, sum:%g``
        then non-empty buckets ascending — negative ``[−u,−l)``, zero
        ``[−zt,zt]``, positive ``(l,u]`` — with Go %g number formatting.
        Used by count_values label values."""

        def g(v: float) -> str:
            if math.isnan(v):
                return "NaN"
            if v == math.inf:
                return "+Inf"
            if v == -math.inf:
                return "-Inf"
            if v == int(v) and abs(v) < 1e21:
                return str(int(v))
            return repr(v)

        parts = [f"{{count:{g(self.count)}, sum:{g(self.sum)}"]
        if not self.uses_custom_buckets():
            neg = list(zip(self._indexes(self.neg_spans), self.neg_buckets))
            for idx, c in reversed(neg):
                if c == 0:
                    continue
                lo, up = self._exp_bounds(idx)
                parts.append(f"[{g(-up)},{g(-lo)}):{g(float(c))}")
            if self.zero_count != 0:
                parts.append(
                    f"[{g(-self.zero_threshold)},{g(self.zero_threshold)}]:{g(self.zero_count)}"
                )
            for idx, c in zip(self._indexes(self.pos_spans), self.pos_buckets):
                if c == 0:
                    continue
                lo, up = self._exp_bounds(idx)
                parts.append(f"({g(lo)},{g(up)}]:{g(float(c))}")
        else:
            for idx, c in zip(self._indexes(self.pos_spans), self.pos_buckets):
                if c == 0:
                    continue
                lo, up = self._custom_bounds(idx)
                lb = "[" if idx == 0 else "("
                parts.append(f"{lb}{g(lo)},{g(up)}]:{g(float(c))}")
        return ", ".join(parts) + "}"

    def quantile(self, q: float) -> float:
        """promql/quantile.go:225 ``HistogramQuantile``."""
        if q < 0:
            return -math.inf
        if q > 1:
            return math.inf
        h = self
        if h.count == 0 or math.isnan(q):
            return math.nan

        buckets = [b for b in self.all_buckets()]
        forward = math.isnan(h.sum) or q < 0.5
        it = buckets if forward else list(reversed(buckets))
        rank = q * h.count if forward else (1 - q) * h.count

        count = 0.0
        bucket = None
        for b in it:
            if b[2] == 0:
                continue
            bucket = b
            count += b[2]
            if count >= rank:
                break
        if bucket is None:
            return math.nan
        lower, upper, bcount = bucket

        if not h.uses_custom_buckets() and lower < 0 and upper > 0:
            if not h.neg_buckets and h.pos_buckets:
                lower = 0.0
            elif not h.pos_buckets and h.neg_buckets:
                upper = 0.0
        elif h.uses_custom_buckets():
            if lower == -math.inf:
                if upper <= 0:
                    return upper
                lower = 0.0
            elif upper == math.inf:
                return lower

        if count > h.count:
            count = h.count
        if count < rank:
            return math.nan if math.isnan(h.sum) else upper

        if forward:
            rank -= count - bcount
        else:
            rank = count - rank

        fraction = rank / bcount
        if h.uses_custom_buckets() or (lower <= 0 <= upper):
            return lower + (upper - lower) * fraction
        log_lower = math.log2(abs(lower))
        log_upper = math.log2(abs(upper))
        if lower > 0:
            return 2.0 ** (log_lower + (log_upper - log_lower) * fraction)
        return -(2.0 ** (log_upper + (log_lower - log_upper) * (1 - fraction)))

    # ------------------------------------------------------------------
    def fraction(self, lower: float, upper: float) -> float:
        """promql/quantile.go:400 ``HistogramFraction``."""
        h = self
        if h.count == 0 or math.isnan(lower) or math.isnan(upper):
            return math.nan
        if lower >= upper:
            return 0.0

        rank = 0.0
        lower_rank = upper_rank = 0.0
        lower_set = upper_set = False
        for blo, bup, bc in self.all_buckets():
            # zero-spanning bucket: clamp bounds when the histogram is
            # one-sided — applies to custom (NHCB) buckets as well
            # (quantile.go HistogramFraction zeroBucket handling)
            zero_bucket = False
            if blo <= 0 <= bup:
                zero_bucket = True
                if not h.neg_buckets and h.pos_buckets:
                    blo = 0.0
                elif not h.pos_buckets and h.neg_buckets:
                    bup = 0.0
            linear = h.uses_custom_buckets() or zero_bucket

            def interp(v: float) -> float:
                if blo == -math.inf:
                    return rank + bc  # skip infinite-width bucket interp
                if linear:
                    return rank + bc * (v - blo) / (bup - blo)
                # exponential interpolation on a log2 scale
                ll, lu = math.log2(abs(blo)), math.log2(abs(bup))
                lv = math.log2(abs(v))
                if v > 0:
                    return rank + bc * (lv - ll) / (lu - ll)
                return rank + bc * (1 - (lv - lu) / (ll - lu))

            if not lower_set and blo >= lower:
                lower_rank = rank
                lower_set = True
            if not upper_set and blo >= upper:
                upper_rank = rank
                upper_set = True
            if lower_set and upper_set:
                break
            if not lower_set and blo < lower < bup:
                lower_rank = interp(lower)
                lower_set = True
            if not upper_set and blo < upper < bup:
                upper_rank = interp(upper)
                upper_set = True
            if lower_set and upper_set:
                break
            rank += bc
        if math.isnan(h.sum):
            # NaN observations live in count but not in buckets; fractions
            # exclude them (quantile.go:495 NaN-sum adjustment)
            count = sum(bc for _, _, bc in self.all_buckets())
        else:
            count = h.count
        if not lower_set or lower_rank > count:
            lower_rank = count
        if not upper_set or upper_rank > count:
            upper_rank = count
        return (upper_rank - lower_rank) / h.count

    # ------------------------------------------------------------------
    def stdvar(self) -> float:
        """model/histogram float variance from bucket geometry
        (functions.go histogram_stdvar: mean = sum/count, per-bucket value
        = geometric-ish midpoint)."""
        if self.count == 0:
            return math.nan
        mean = self.sum / self.count
        var = 0.0
        cvar = 0.0
        for blo, bup, bc in self.all_buckets():
            if bc == 0:
                continue
            if self.uses_custom_buckets():
                val = (bup + blo) / 2.0  # arithmetic mean for NHCB
            elif blo <= 0 <= bup:
                val = 0.0  # zero bucket
            else:
                val = math.sqrt(bup * blo)  # geometric mean, sign-mirrored
                if bup < 0:
                    val = -val
            d = val - mean
            var, cvar = _kahan_inc(bc * d * d, var, cvar)
        return (var + cvar) / self.count


    # ------------------------------------------------------------------
    # Arithmetic (reference: float_histogram.go Add/Sub/Mul/Div/Compact/
    # DetectReset).  Internally buckets are manipulated as {index: count}
    # maps; span encoding is rebuilt on output — semantically equivalent
    # to the reference's span-merge machinery, always compact.
    # ------------------------------------------------------------------
    def copy(self) -> "FloatHist":
        return FloatHist(
            schema=self.schema,
            zero_threshold=self.zero_threshold,
            zero_count=self.zero_count,
            count=self.count,
            sum=self.sum,
            pos_spans=list(self.pos_spans),
            pos_buckets=list(self.pos_buckets),
            neg_spans=list(self.neg_spans),
            neg_buckets=list(self.neg_buckets),
            custom_values=list(self.custom_values),
            counter_reset_hint=self.counter_reset_hint,
        )

    def _pos_map(self) -> dict:
        return dict(zip(self._indexes(self.pos_spans), map(float, self.pos_buckets)))

    def _neg_map(self) -> dict:
        return dict(zip(self._indexes(self.neg_spans), map(float, self.neg_buckets)))

    def _set_pos(self, m: dict) -> None:
        self.pos_spans, self.pos_buckets = _map_to_spans(m)

    def _set_neg(self, m: dict) -> None:
        self.neg_spans, self.neg_buckets = _map_to_spans(m)

    def compact(self) -> "FloatHist":
        """Drop zero-count buckets and rebuild canonical spans
        (reference: Compact(0))."""
        self._set_pos({i: c for i, c in self._pos_map().items() if c != 0})
        self._set_neg({i: c for i, c in self._neg_map().items() if c != 0})
        return self

    def mul(self, factor: float) -> "FloatHist":
        """Scale all counts and the sum (float_histogram.go:291)."""
        self.zero_count *= factor
        self.count *= factor
        self.sum *= factor
        self.pos_buckets = [b * factor for b in self.pos_buckets]
        self.neg_buckets = [b * factor for b in self.neg_buckets]
        if factor < 0:
            self.counter_reset_hint = GAUGE_TYPE
        return self

    def div(self, scalar: float) -> "FloatHist":
        """Like mul but divides; /0 → ±Inf fields, buckets removed
        (float_histogram.go:310)."""
        self.zero_count = _fdiv(self.zero_count, scalar)
        self.count = _fdiv(self.count, scalar)
        self.sum = _fdiv(self.sum, scalar)
        if scalar == 0:
            self.pos_spans, self.pos_buckets = [], []
            self.neg_spans, self.neg_buckets = [], []
            return self
        self.pos_buckets = [_fdiv(b, scalar) for b in self.pos_buckets]
        self.neg_buckets = [_fdiv(b, scalar) for b in self.neg_buckets]
        if scalar < 0:
            self.counter_reset_hint = GAUGE_TYPE
        return self

    def _adjust_counter_reset(self, other: "FloatHist") -> bool:
        """float_histogram.go ``adjustCounterReset`` — returns True on a
        CounterReset/NotCounterReset collision."""
        h, o = self.counter_reset_hint, other.counter_reset_hint
        if o == h or h == GAUGE_TYPE:
            return False
        if o == GAUGE_TYPE:
            self.counter_reset_hint = GAUGE_TYPE
            return False
        if h == UNKNOWN_RESET or o == UNKNOWN_RESET:
            self.counter_reset_hint = UNKNOWN_RESET
            return False
        self.counter_reset_hint = UNKNOWN_RESET
        return True

    def _zero_fold(self, larger: float) -> tuple[float, float]:
        """zero count + adjusted threshold when growing the zero bucket to
        ``larger`` (float_histogram.go:993 ``zeroCountForLargerThreshold``).
        Does not mutate self."""
        if larger == self.zero_threshold:
            return self.zero_count, larger
        while True:
            zc = self.zero_count
            restart = False
            for idx in sorted(self._pos_map()):
                c = self._pos_map()[idx]
                lo, up = self._exp_bounds(idx)
                if lo >= larger:
                    break
                zc += c
                if up > larger:
                    if c != 0:
                        larger = up
                    break
            for idx in sorted(self._neg_map()):
                c = self._neg_map()[idx]
                lo, up = self._exp_bounds(idx)  # abs bounds; value ∈ (−up, −lo]
                if lo >= larger:
                    break
                zc += c
                if up > larger:
                    if c != 0:
                        larger = up
                        restart = True
                    break
            if not restart:
                return zc, larger

    def _reconcile_zero(self, other: "FloatHist") -> float:
        """Grow zero buckets until thresholds agree (float_histogram.go:1110
        ``reconcileZeroBuckets``).  Mutates self; returns the other
        histogram's effective zero count."""
        other_zc, other_zt = other.zero_count, other.zero_threshold
        while other_zt != self.zero_threshold:
            if self.zero_threshold > other_zt:
                other_zc, other_zt = other._zero_fold(self.zero_threshold)
                if other_zt == self.zero_threshold:
                    break
            if other_zt > self.zero_threshold:
                self.zero_count, self.zero_threshold = self._zero_fold(other_zt)
                # trim buckets now inside the zero bucket
                zt = self.zero_threshold
                self._set_pos({i: c for i, c in self._pos_map().items()
                               if self._exp_bounds(i)[1] > zt})
                self._set_neg({i: c for i, c in self._neg_map().items()
                               if self._exp_bounds(i)[1] > zt})
        return other_zc

    def reduce_to_schema(self, target: int) -> "FloatHist":
        """Merge buckets down to a lower-resolution schema
        (float_histogram.go:1912; targetIdx at :1410)."""
        if self.uses_custom_buckets() or target >= self.schema:
            return self
        d = self.schema - target
        self._set_pos(_reduce_map(self._pos_map(), d))
        self._set_neg(_reduce_map(self._neg_map(), d))
        self.schema = target
        return self

    def add(self, other: "FloatHist", sub: bool = False) -> tuple[bool, bool]:
        """self ± other in place (float_histogram.go:353 Add / :538 Sub).
        Returns (counter_reset_collision, nhcb_bounds_reconciled)."""
        if self.uses_custom_buckets() != other.uses_custom_buckets():
            raise HistIncompatibleSchema
        collision = self._adjust_counter_reset(other)
        sign = -1.0 if sub else 1.0
        reconciled = False

        if self.uses_custom_buckets():
            self.count += sign * other.count
            self.sum += sign * other.sum
            if self.custom_values == other.custom_values:
                m = self._pos_map()
                for i, c in other._pos_map().items():
                    m[i] = m.get(i, 0.0) + sign * c
                self._set_pos(m)
            else:
                reconciled = True
                nb = _intersect_bounds(self.custom_values, other.custom_values)
                m = _remap_custom(self._pos_map(), self.custom_values, nb)
                for i, c in _remap_custom(other._pos_map(), other.custom_values, nb).items():
                    m[i] = m.get(i, 0.0) + sign * c
                self._set_pos(m)
                self.custom_values = nb
            return collision, reconciled

        other_zc = self._reconcile_zero(other)
        self.zero_count += sign * other_zc
        self.count += sign * other.count
        self.sum += sign * other.sum

        target = min(self.schema, other.schema)
        self.reduce_to_schema(target)
        d = other.schema - target
        zt = self.zero_threshold
        for get_m, set_m in (
            (other._pos_map, self._set_pos_merged),
            (other._neg_map, self._set_neg_merged),
        ):
            om = _reduce_map(get_m(), d) if d > 0 else get_m()
            # buckets folded into the zero bucket were counted in other_zc
            om = {
                i: c for i, c in om.items()
                if _exp_upper(i, target) > zt
            }
            set_m(om, sign)
        return collision, reconciled

    def _set_pos_merged(self, om: dict, sign: float) -> None:
        m = self._pos_map()
        for i, c in om.items():
            m[i] = m.get(i, 0.0) + sign * c
        self._set_pos(m)

    def _set_neg_merged(self, om: dict, sign: float) -> None:
        m = self._neg_map()
        for i, c in om.items():
            m[i] = m.get(i, 0.0) + sign * c
        self._set_neg(m)

    def detect_reset(self, previous: "FloatHist") -> bool:
        """float_histogram.go:751 ``DetectReset``."""
        if self.counter_reset_hint == COUNTER_RESET:
            return True
        if self.counter_reset_hint == NOT_COUNTER_RESET:
            return False
        if self.count < previous.count:
            return True
        if self.uses_custom_buckets():
            if not previous.uses_custom_buckets():
                return True
            if self.custom_values != previous.custom_values:
                nb = _intersect_bounds(self.custom_values, previous.custom_values)
                cur = _remap_custom(self._pos_map(), self.custom_values, nb)
                prev = _remap_custom(previous._pos_map(), previous.custom_values, nb)
                return _map_reset(cur, prev)
            return _map_reset(self._pos_map(), previous._pos_map())
        if self.schema > previous.schema:
            return True
        if self.zero_threshold < previous.zero_threshold:
            return True
        prev_zc, new_zt = previous._zero_fold(self.zero_threshold)
        if new_zt != self.zero_threshold:
            return True  # threshold inside a populated previous bucket
        if self.zero_count < prev_zc:
            return True
        d = previous.schema - self.schema
        zt = self.zero_threshold
        for mine, theirs in (
            (self._pos_map(), previous._pos_map()),
            (self._neg_map(), previous._neg_map()),
        ):
            pm = _reduce_map(theirs, d) if d > 0 else dict(theirs)
            pm = {i: c for i, c in pm.items() if _exp_upper(i, self.schema) > zt}
            cm = {i: c for i, c in mine.items() if _exp_upper(i, self.schema) > zt}
            if _map_reset(cm, pm):
                return True
        return False

    def equals(self, other: Optional["FloatHist"]) -> bool:
        """Data equality (float_histogram.go:607) — same bucket layout
        (ignoring empty-span encoding differences) and bitwise-equal
        counts; NaN equals NaN."""
        if other is None:
            return False
        if self.schema != other.schema:
            return False
        if not (_feq(self.count, other.count) and _feq(self.sum, other.sum)):
            return False
        if self.uses_custom_buckets():
            if self.custom_values != other.custom_values:
                return False
        if self.zero_threshold != other.zero_threshold or not _feq(
            self.zero_count, other.zero_count
        ):
            return False
        return (
            self._pos_map() == other._pos_map()
            and self._neg_map() == other._neg_map()
        )

    def to_row(self) -> dict:
        """Struct-row dict matching schema.HISTOGRAM_TYPE."""
        return {
            "schema": int(self.schema),
            "zero_threshold": float(self.zero_threshold),
            "zero_count": float(self.zero_count),
            "count": float(self.count),
            "sum": float(self.sum),
            "pos_spans": [
                {"offset": int(o), "length": int(n)} for o, n in self.pos_spans
            ],
            "pos_buckets": [float(b) for b in self.pos_buckets],
            "neg_spans": [
                {"offset": int(o), "length": int(n)} for o, n in self.neg_spans
            ],
            "neg_buckets": [float(b) for b in self.neg_buckets],
            "custom_values": [float(v) for v in self.custom_values],
            "counter_reset_hint": int(self.counter_reset_hint),
        }


def _feq(a: float, b: float) -> bool:
    """Bit-pattern float equality (NaN == NaN; +0 != −0), mirroring the
    reference's math.Float64bits comparisons."""
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    if a == 0 and b == 0:
        return math.copysign(1.0, a) == math.copysign(1.0, b)
    return a == b


def _exp_upper(idx: int, schema: int) -> float:
    return 2.0 ** ((2.0**-schema) * idx)


def _map_to_spans(m: dict) -> tuple[list, list]:
    """{index: count} → canonical (spans, buckets) in wire format (first
    span offset absolute, later offsets = gap from previous bucket)."""
    if not m:
        return [], []
    idxs = sorted(m)
    spans, buckets = [], []
    span_start = prev = idxs[0]
    length = 1
    buckets.append(m[idxs[0]])
    for i in idxs[1:]:
        if i == prev + 1:
            length += 1
        else:
            spans.append((span_start, length))
            span_start, length = i, 1
        buckets.append(m[i])
        prev = i
    spans.append((span_start, length))
    out_spans = []
    prev_end = 0
    for k, (start, ln) in enumerate(spans):
        off = start if k == 0 else start - prev_end
        out_spans.append((off, ln))
        prev_end = start + ln
    return out_spans, buckets


def _reduce_map(m: dict, d: int) -> dict:
    """Merge bucket indexes down d schema steps (targetIdx: ((i−1)>>d)+1;
    Python ``>>`` on negative ints is arithmetic, same as Go)."""
    out: dict = {}
    for i, c in m.items():
        ni = ((i - 1) >> d) + 1
        out[ni] = out.get(ni, 0.0) + c
    return out


def _intersect_bounds(a: list, b: list) -> list:
    """Sorted intersection (float_histogram.go:1780)."""
    i = j = 0
    out = []
    while i < len(a) and j < len(b):
        if a[i] == b[j]:
            out.append(a[i])
            i += 1
            j += 1
        elif a[i] < b[j]:
            i += 1
        else:
            j += 1
    return out


def _remap_custom(m: dict, cv: list, nb: list) -> dict:
    """Remap NHCB bucket counts onto intersected bounds ``nb`` ⊆ ``cv``."""
    out: dict = {}
    for i, c in m.items():
        ub = cv[i] if i < len(cv) else math.inf
        j = bisect_left(nb, ub) if ub != math.inf else len(nb)
        out[j] = out.get(j, 0.0) + c
    return out


def _map_reset(cur: dict, prev: dict) -> bool:
    """True if any populated previous bucket is missing or larger than the
    corresponding current bucket (detectReset, float_histogram.go:809)."""
    for i, pc in prev.items():
        if pc == 0:
            continue
        cc = cur.get(i)
        if cc is None or cc < pc:
            return True
    return False


def hist_has_overflow(h: "FloatHist") -> bool:
    """Any field infinite (float_histogram.go ``HasOverflow``)."""
    vals = [h.count, h.sum, h.zero_count] + list(h.pos_buckets) + list(h.neg_buckets)
    return any(math.isinf(v) for v in vals)


def _fold_hint(a: int, b: int) -> int:
    """adjustCounterReset's hint lattice (collision flag dropped)."""
    if a == b:
        return a
    if a == GAUGE_TYPE or b == GAUGE_TYPE:
        return GAUGE_TYPE
    return UNKNOWN_RESET


def _kahan_scalar_fold(vals: list) -> float:
    s = c = 0.0
    for v in vals:
        s, c = _kahan_inc(v, s, c)
    return s + c


def _kahan_map_fold(maps: list) -> dict:
    s: dict = {}
    c: dict = {}
    for m in maps:
        for i, v in m.items():
            s[i], c[i] = _kahan_inc(v, s.get(i, 0.0), c.get(i, 0.0))
    return {i: s[i] + c[i] for i in s}


def _normal_forms(hs: list):
    """Bring histograms to a common (schema, zero bucket / custom bounds)
    layout for field-wise summation.  Returns
    (template FloatHist, [(count, sum, zc, pos_map, neg_map)]) or None on
    an exponential/custom mix."""
    custom = hs[0].uses_custom_buckets()
    if any(h.uses_custom_buckets() != custom for h in hs[1:]):
        return None
    hint = hs[0].counter_reset_hint
    for h in hs[1:]:
        hint = _fold_hint(hint, h.counter_reset_hint)
    if custom:
        cv = hs[0].custom_values
        if all(h.custom_values == cv for h in hs[1:]):
            parts = [(h.count, h.sum, 0.0, h._pos_map(), {}) for h in hs]
        else:
            nb = cv
            for h in hs[1:]:
                nb = _intersect_bounds(nb, h.custom_values)
            parts = [
                (h.count, h.sum, 0.0,
                 _remap_custom(h._pos_map(), h.custom_values, nb), {})
                for h in hs
            ]
            cv = nb
        tmpl = FloatHist(schema=CUSTOM_BUCKETS_SCHEMA, custom_values=list(cv),
                         counter_reset_hint=hint)
        return tmpl, parts
    target = min(h.schema for h in hs)
    zt = max(h.zero_threshold for h in hs)
    while True:  # grow until not inside any populated bucket
        nzt = zt
        for h in hs:
            _, t2 = h._zero_fold(zt)
            if t2 > nzt:
                nzt = t2
        if nzt == zt:
            break
        zt = nzt
    parts = []
    for h in hs:
        zc, _ = h._zero_fold(zt)
        pm = {i: c for i, c in h._pos_map().items() if h._exp_bounds(i)[1] > zt}
        nm = {i: c for i, c in h._neg_map().items() if h._exp_bounds(i)[1] > zt}
        d = h.schema - target
        if d > 0:
            pm, nm = _reduce_map(pm, d), _reduce_map(nm, d)
        parts.append((h.count, h.sum, zc, pm, nm))
    tmpl = FloatHist(schema=target, zero_threshold=zt, counter_reset_hint=hint)
    return tmpl, parts


def _fold_parts(tmpl: "FloatHist", parts: list) -> "FloatHist":
    out = tmpl.copy()
    out.count = _kahan_scalar_fold([p[0] for p in parts])
    out.sum = _kahan_scalar_fold([p[1] for p in parts])
    out.zero_count = _kahan_scalar_fold([p[2] for p in parts])
    out._set_pos(_kahan_map_fold([p[3] for p in parts]))
    out._set_neg(_kahan_map_fold([p[4] for p in parts]))
    return out.compact()


def hist_sum(hists: list) -> tuple[Optional["FloatHist"], bool]:
    """Kahan-compensated field-wise sum (engine.go:3716 ``KahanAdd``
    aggregation path).  Returns (sum, incompatible)."""
    hs = [h for h in hists if h is not None]
    if not hs:
        return None, False
    nf = _normal_forms(hs)
    if nf is None:
        return None, True
    tmpl, parts = nf
    return _fold_parts(tmpl, parts), False


def hist_mean(hists: list) -> tuple[Optional["FloatHist"], bool]:
    """Average of histograms (engine.go avg aggregation).  Direct sum÷n
    unless the sum overflows; then Σ(h÷n) — the incremental-mean fallback
    the reference switches to on overflow."""
    hs = [h for h in hists if h is not None]
    if not hs:
        return None, False
    nf = _normal_forms(hs)
    if nf is None:
        return None, True
    tmpl, parts = nf
    acc = _fold_parts(tmpl, parts)
    n = float(len(hs))
    if hist_has_overflow(acc) and not any(hist_has_overflow(h) for h in hs):
        scaled = [
            (c / n, s / n, z / n,
             {i: v / n for i, v in pm.items()},
             {i: v / n for i, v in nm.items()})
            for c, s, z, pm, nm in parts
        ]
        return _fold_parts(tmpl, scaled), False
    acc.div(n)
    return acc.compact(), False


def _frac_below(lo: float, up: float, v: float, linear: bool) -> float:
    """Bucket.FractionBelow (generic.go): linear, or log2-scale for
    exponential buckets (negative buckets mirrored)."""
    if linear:
        return (v - lo) / (up - lo)
    ll, lu = math.log2(abs(lo)), math.log2(abs(up))
    lv = math.log2(abs(v))
    if v > 0:
        return (lv - ll) / (lu - ll)
    return 1 - ((lv - lu) / (ll - lu))


def _midpoint(lo: float, up: float, is_positive: bool, linear: bool) -> float:
    """computeMidpoint (float_histogram.go:2418)."""
    if math.isinf(lo):
        if math.isinf(up):
            return 0.0
        if up > 0:
            return up / 2.0
        return up
    if math.isinf(up):
        return lo
    if linear:
        return (lo + up) / 2.0
    geo = math.sqrt(abs(lo * up))
    return geo if is_positive else -geo


def _inf_bucket_trim(is_upper: bool, lo: float, up: float, count: float, rhs: float):
    """handleInfinityBuckets (float_histogram.go:2291)."""
    zero_if_inf = lambda x: 0.0 if math.isinf(x) else x
    if math.isinf(lo) and lo < 0:
        if is_upper:
            if rhs >= up:
                return count, 0.0
            if rhs > 0 and up > 0 and not math.isinf(up):
                return count * rhs / up, rhs / 2.0
            if up <= 0:
                return count, rhs
            return 0.0, zero_if_inf(up)
        if rhs <= lo:
            return count, 0.0
        if rhs >= 0 and up > rhs and not math.isinf(up):
            return count * (1 - rhs / up), (rhs + up) / 2.0
        return 0.0, zero_if_inf(up)
    if math.isinf(up) and up > 0:
        if is_upper:
            return 0.0, zero_if_inf(lo)
        if rhs >= lo:
            return count, rhs
        return 0.0, zero_if_inf(lo)
    raise ValueError("no infinite bound")


def _bucket_trim(lo, up, count, rhs, is_upper, is_positive, is_custom):
    """computeBucketTrim (float_histogram.go:2404)."""
    if math.isinf(lo) or math.isinf(up):
        return _inf_bucket_trim(is_upper, lo, up, count, rhs)
    if rhs <= lo:
        under = 0.0
    elif rhs >= up:
        under = count
    else:
        under = count * _frac_below(lo, up, rhs, is_custom)
    if is_upper:
        return under, _midpoint(lo, rhs, is_positive, is_custom)
    return count - under, _midpoint(rhs, up, is_positive, is_custom)


def _zero_bucket_trim(lo, up, count, rhs, has_neg, has_pos, is_upper):
    """computeZeroBucketTrim (float_histogram.go:2364)."""
    if has_neg and not has_pos:
        up = 0.0
    if has_pos and not has_neg:
        lo = 0.0
    if is_upper:
        if rhs <= lo:
            return 0.0, 0.0
        if rhs >= up:
            return count, (lo + up) / 2.0
        return count * (rhs - lo) / (up - lo), (lo + rhs) / 2.0
    if rhs <= lo:
        return count, (lo + up) / 2.0
    if rhs >= up:
        return 0.0, 0.0
    return count * (up - rhs) / (up - lo), (rhs + up) / 2.0


def hist_trim_buckets(h: "FloatHist", rhs: float, is_upper: bool) -> "FloatHist":
    """``</`` / ``>/`` bucket trimming (float_histogram.go:2129
    ``TrimBuckets``): keep observations below (``</``) or above (``>/``)
    the trim point; boundary buckets interpolate; count/sum rebuilt from
    bucket midpoints when anything was trimmed."""
    h = h.copy()
    is_custom = h.uses_custom_buckets()
    updated_count = updated_sum = 0.0
    trimmed = False
    has_pos = has_neg = False

    pm, nm = h._pos_map(), h._neg_map()
    for idx in sorted(pm):
        c = pm[idx]
        if c == 0:
            continue
        has_pos = True
        lo, up = (h._custom_bounds(idx) if is_custom else h._exp_bounds(idx))
        entirely_kept = (up <= rhs) if is_upper else (lo >= rhs)
        contains = (lo < rhs) if is_upper else (up > rhs)
        if entirely_kept:
            updated_count += c
            updated_sum += _midpoint(lo, up, True, is_custom) * c
        elif contains:
            keep, mid = _bucket_trim(lo, up, c, rhs, is_upper, True, is_custom)
            updated_count += keep
            updated_sum += mid * keep
            if pm[idx] != keep:
                pm[idx] = keep
                trimmed = True
        else:
            pm[idx] = 0.0
            trimmed = True
    for idx in sorted(nm):
        c = nm[idx]
        if c == 0:
            continue
        has_neg = True
        alo, aup = h._exp_bounds(idx)
        lo, up = -aup, -alo  # value-space bounds of a negative bucket
        entirely_kept = (up <= rhs) if is_upper else (lo >= rhs)
        contains = (lo < rhs) if is_upper else (up > rhs)
        if entirely_kept:
            updated_count += c
            updated_sum += _midpoint(lo, up, False, is_custom) * c
        elif contains:
            keep, mid = _bucket_trim(lo, up, c, rhs, is_upper, False, is_custom)
            updated_count += keep
            updated_sum += mid * keep
            if nm[idx] != keep:
                nm[idx] = keep
                trimmed = True
        else:
            nm[idx] = 0.0
            trimmed = True

    if h.zero_count > 0:
        keep, mid = _zero_bucket_trim(
            -h.zero_threshold, h.zero_threshold, h.zero_count, rhs,
            has_neg, has_pos, is_upper,
        )
        if h.zero_count != keep:
            h.zero_count = keep
            trimmed = True
        updated_sum += mid * keep
        updated_count += keep

    h._set_pos(pm)
    h._set_neg(nm)
    if trimmed:
        h.count = updated_count
        h.sum = updated_sum
        h.compact()
    return h


def hist_interpolate(
    h1: "FloatHist", t1: int, h2: "FloatHist", t2: int, t: int, is_counter: bool
) -> "FloatHist":
    """Linear interpolation between histogram points (functions.go:109
    ``interpolateHistograms``): across a counter reset the counter is
    modeled as restarting from zero."""
    if t == t1:
        return h1.copy()
    if t == t2:
        return h2.copy()
    frac = (t - t1) / (t2 - t1)
    if is_counter and h2.detect_reset(h1):
        return h2.copy().mul(frac)
    r = h2.copy()
    r.add(h1, sub=True)
    r.mul(frac)
    r.add(h1)
    return r


def hist_extended_rate(
    points: list,
    range_ms: int,
    wend: int,
    is_counter: bool,
    is_rate: bool,
    smoothed: bool,
):
    """rate/increase/delta over anchored/smoothed all-histogram windows
    (functions.go:374 ``extendedHistogramRate`` + :247
    ``correctForCounterResetsHistogram``).

    ``points``: [(t_ms, FloatHist, role)] time-ordered, where role 'L'/'R'
    mark the boundary candidates outside the range.  Returns FloatHist or
    None on incompatibility."""
    if not points:
        return None
    rstart, rend = wend - range_ms, wend
    first_i = 0
    last_i = len(points) - 1
    try:
        # left boundary value
        ft, fh, _ = points[first_i]
        if smoothed and ft < rstart and first_i + 1 <= last_i:
            left = hist_interpolate(
                fh, ft, points[first_i + 1][1], points[first_i + 1][0], rstart, is_counter
            )
        else:
            left = fh.copy()
        lt, lh, _ = points[last_i]
        if smoothed and lt > rend and last_i > 0:
            right = hist_interpolate(
                points[last_i - 1][1], points[last_i - 1][0], lh, lt, rend, is_counter
            )
        else:
            right = lh.copy()

        result = right.copy()
        result.add(left, sub=True)

        if is_counter:
            first = first_i + 1
            prev = left
            if (
                smoothed
                and points[first_i][0] < rstart
                and first_i + 1 <= last_i
                and points[first_i + 1][1].detect_reset(points[first_i][1])
            ):
                prev = points[first_i + 1][1]
                first += 1
            last = last_i - 1
            if not first > last + 1:
                correction = None
                for t, h, _ in points[first : last + 1]:
                    if h.detect_reset(prev):
                        if correction is None:
                            correction = prev.copy()
                        else:
                            correction.add(prev)
                    prev = h
                if right.detect_reset(prev):
                    if correction is None:
                        correction = prev.copy()
                    else:
                        correction.add(prev)
                if correction is not None:
                    result.add(correction)
    except HistIncompatibleSchema:
        return None
    if is_rate:
        result.div(range_ms / 1000.0)
    result.counter_reset_hint = GAUGE_TYPE
    return result.compact()


def st_reset(prev_st, prev_t: int, cur_st, cur_t: int) -> bool:
    """isStartTimestampReset (promql/functions.go:760) — see the SQL twin
    in engine/range_functions.py."""
    pst = int(prev_st) if prev_st is not None else 0
    cst = int(cur_st) if cur_st is not None else 0
    if cst == 0 or cst >= cur_t:
        return False
    if cst < prev_t:
        return False
    if cst > prev_t:
        return True
    if pst > prev_t:
        return False
    return pst != 0 and pst != prev_t


def hist_rate(points: list, range_s: float, is_counter: bool, is_rate: bool,
              sts: list | None = None):
    """rate/increase/delta over an all-histogram window — histogramRate
    (promql/functions.go:640) + extrapolation (functions.go:452-620),
    start-timestamp aware (ST-implied resets join DetectReset).

    ``points``: [(t_ms, FloatHist)] time-sorted; ``sts``: optional aligned
    start timestamps (ms, None = unset).  Returns FloatHist or None
    (incompatible)."""
    if len(points) < 2:
        return None
    sts = sts or [None] * len(points)
    prev = points[0][1]
    last = points[-1][1]
    if prev is None or last is None:
        return None
    using_custom = prev.uses_custom_buckets()
    if is_counter:
        second = points[1][1]
        if second is not None and (
            st_reset(sts[0], points[0][0], sts[1], points[1][0])
            or second.detect_reset(prev)
        ):
            prev = FloatHist(schema=second.schema,
                             custom_values=list(second.custom_values))
            using_custom = second.uses_custom_buckets()
    if last.uses_custom_buckets() != using_custom:
        return None
    min_schema = min(last.schema, prev.schema)
    for _, cur in points[1:-1]:
        if cur is None:
            return None
        if not is_counter:
            continue
        if cur.schema < min_schema and not cur.uses_custom_buckets():
            min_schema = cur.schema
        if cur.uses_custom_buckets() != using_custom:
            return None
    h = last.copy().reduce_to_schema(min_schema)
    try:
        h.add(prev, sub=True)
        if is_counter:
            prev_pt = prev
            for i, (ct, cur) in enumerate(points[1:], start=1):
                if st_reset(sts[i - 1], points[i - 1][0], sts[i], ct) or cur.detect_reset(prev_pt):
                    h.add(prev_pt)
                prev_pt = cur
    except HistIncompatibleSchema:
        return None
    h.counter_reset_hint = GAUGE_TYPE
    return h.compact()


def _kahan_inc(inc, s, c):
    t = s + inc
    if math.isinf(t):
        c = 0.0  # kahansum.Inc: overflow resets the compensation term
    elif abs(s) >= abs(inc):
        c += (s - t) + inc
    else:
        c += (inc - t) + s
    return t, c


def from_row(h) -> Optional[FloatHist]:
    """Build from a Spark Row / dict of the HISTOGRAM_TYPE struct.

    Values may arrive as numpy arrays (Arrow→pandas), whose truthiness is
    ambiguous — use explicit None checks, never ``or []``."""
    if h is None:
        return None
    get = h.get if isinstance(h, dict) else (lambda k: h[k])

    def arr(v):
        return [] if v is None else list(v)

    def spans(v):
        return [(int(sp["offset"]), int(sp["length"])) for sp in arr(v)]

    def num(v, default=0.0):
        return default if v is None else float(v)

    return FloatHist(
        schema=int(get("schema") or 0),
        zero_threshold=num(get("zero_threshold")),
        zero_count=num(get("zero_count")),
        count=num(get("count")),
        sum=num(get("sum")),
        pos_spans=spans(get("pos_spans")),
        pos_buckets=[float(x) for x in arr(get("pos_buckets"))],
        neg_spans=spans(get("neg_spans")),
        neg_buckets=[float(x) for x in arr(get("neg_buckets"))],
        custom_values=[float(x) for x in arr(get("custom_values"))],
        counter_reset_hint=int(get("counter_reset_hint") or 0),
    )
