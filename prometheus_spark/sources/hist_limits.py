"""Native-histogram scrape protections.

Mirrors the reference's decorating appenders (scrape/target.go:426-503):

- ``bucketLimitAppender`` (config ``native_histogram_bucket_limit``,
  config/config.go:823): a native histogram with more than ``limit``
  buckets has its resolution reduced one exponential-schema step at a
  time until it fits; custom-bucket histograms and histograms already at
  the minimum schema can't reduce and fail the scrape (errBucketLimit →
  scrape.go:1885 fails the whole scrape like sample_limit).
- ``maxSchemaAppender`` (config ``native_histogram_min_bucket_factor`` →
  ``pickSchema``, scrape/scrape.go:2283): caps exponential schemas at
  ``max_schema``; custom-bucket histograms pass through untouched.

Both operate on the canonical HISTOGRAM_TYPE dict used by the spool and
the samples frame, delegating the span/bucket merge to
``FloatHist.reduce_to_schema`` (model/histogram.py — the same targetIdx
arithmetic as float_histogram.go:1410).
"""

from __future__ import annotations

import math

from prometheus_spark.model.histogram import (
    CUSTOM_BUCKETS_SCHEMA,
    FloatHist,
    from_row,
)

# model/histogram/generic.go:24-27
EXP_SCHEMA_MAX = 8
EXP_SCHEMA_MIN = -4
EXP_SCHEMA_MAX_RESERVED = 52
EXP_SCHEMA_MIN_RESERVED = -9


class BucketLimitError(Exception):
    """scrape/target.go errBucketLimit — fails the scrape."""


def is_exponential_schema(s: int) -> bool:
    return EXP_SCHEMA_MIN <= s <= EXP_SCHEMA_MAX


def is_exponential_schema_reserved(s: int) -> bool:
    return EXP_SCHEMA_MIN_RESERVED <= s <= EXP_SCHEMA_MAX_RESERVED


def pick_schema(bucket_factor: float) -> int:
    """native_histogram_min_bucket_factor → schema cap
    (scrape/scrape.go:2283 pickSchema)."""
    if bucket_factor <= 1:
        bucket_factor = 1.00271
    floor = math.floor(-math.log2(math.log2(bucket_factor)))
    return max(EXP_SCHEMA_MIN, min(EXP_SCHEMA_MAX, int(floor)))


def _bucket_count(h: FloatHist) -> int:
    return len(h.pos_buckets) + len(h.neg_buckets)


def apply_bucket_limit(hist: dict, limit: int) -> dict:
    """target.go:433 bucketLimitAppender.AppendHistogram on one
    histogram dict: reduce resolution until the bucket count fits, or
    raise BucketLimitError when it can't (non-exponential schema, or
    the minimum schema still exceeds the limit)."""
    if not limit:
        return hist
    h = from_row(hist)
    if _bucket_count(h) <= limit:
        return hist
    if not is_exponential_schema(h.schema):
        raise BucketLimitError(
            f"native histogram bucket count {_bucket_count(h)} > limit "
            f"{limit} and schema {h.schema} is not reducible"
        )
    while _bucket_count(h) > limit:
        if h.schema <= EXP_SCHEMA_MIN:
            raise BucketLimitError(
                f"native histogram exceeds bucket limit {limit} even at "
                f"minimum schema {EXP_SCHEMA_MIN}"
            )
        h.reduce_to_schema(h.schema - 1)
    return h.to_row()


def apply_max_schema(hist: dict, max_schema: int) -> dict:
    """target.go:471 maxSchemaAppender.AppendHistogram: reduce an
    exponential schema above the cap down to it; custom buckets and
    already-coarse schemas pass through."""
    if max_schema >= EXP_SCHEMA_MAX:
        return hist
    schema = int(hist.get("schema") or 0)
    if schema == CUSTOM_BUCKETS_SCHEMA:
        return hist
    if not is_exponential_schema_reserved(schema) or schema <= max_schema:
        return hist
    h = from_row(hist)
    h.reduce_to_schema(max_schema)
    return h.to_row()


def apply_hist_limits(hist: dict, bucket_limit: int, max_schema: int) -> dict:
    """The composition the scrape loop applies per native-histogram
    sample (scrape.go:658-671 appenderWithLimits ordering: the schema
    cap wraps the bucket limit, so it applies FIRST)."""
    out = apply_max_schema(hist, max_schema)
    return apply_bucket_limit(out, bucket_limit)
