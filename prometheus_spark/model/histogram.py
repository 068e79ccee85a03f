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
from dataclasses import dataclass, field
from typing import Iterator, Optional

CUSTOM_BUCKETS_SCHEMA = -53


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
        if not lower_set or lower_rank > h.count:
            lower_rank = h.count
        if not upper_set or upper_rank > h.count:
            upper_rank = h.count
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


def _kahan_inc(inc, s, c):
    t = s + inc
    if abs(s) >= abs(inc):
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
