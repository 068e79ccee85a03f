"""Label-set signatures and grouping keys — all JVM-side expressions.

The reference hashes label sets for join/group keys
(promql/engine.go:4399 ``generateGroupingKey``); we use a canonical string
serialization instead (sorted ``k\\x1ev`` pairs joined by ``\\x1f``) so the
key is printable, collision-free, and computable with built-in Spark
functions (``map_entries → array_sort → transform → array_join``) inside
whole-stage codegen.  Spark cannot group/join on MapType directly, so the
``sig`` column accompanies every vector frame.
"""

from __future__ import annotations

import functools
from typing import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from prometheus_spark.model.schema import METRIC_NAME_LABEL

KV_SEP = "\x1e"
PAIR_SEP = "\x1f"




def _memo_on_str(fn):
    """Memoize an expression builder when every arg is hashable (the
    common string-column-name call shape).  Column trees are immutable,
    so reuse is safe — and it turns the builder's dozens of py4j round
    trips into a dict hit on every query after the first."""
    cached = functools.lru_cache(maxsize=256)(fn)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return cached(*args, **kwargs)
        except TypeError:  # unhashable (Column arg) — build fresh
            return fn(*args, **kwargs)

    return wrapped

@_memo_on_str
def sig_expr(labels_col: Column | str = "labels") -> Column:
    """Canonical signature of a labels map: sorted k\\x1ev pairs."""
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    entries = F.array_sort(F.map_entries(col))
    return F.array_join(
        F.transform(entries, lambda e: F.concat_ws(KV_SEP, e["key"], e["value"])),
        PAIR_SEP,
    )


def sig_for(labels: Mapping[str, str]) -> str:
    """Driver-side signature of a Python dict — mirrors :func:`sig_expr`."""
    return PAIR_SEP.join(f"{k}{KV_SEP}{labels[k]}" for k in sorted(labels))


def labels_from_sig(sig: str) -> dict[str, str]:
    if not sig:
        return {}
    return dict(pair.split(KV_SEP, 1) for pair in sig.split(PAIR_SEP))


def match_sig_expr(
    labels_col: Column | str,
    on: Iterable[str] | None,
    ignoring: Iterable[str] | None,
) -> Column:
    """Join signature for vector matching (reference: promql/parser/ast.go:309).

    ``on(...)`` keeps only the listed labels; otherwise the key is the full
    label set minus ``__name__`` and any ``ignoring(...)`` labels.
    """
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    if on is not None:
        keys = F.array(*[F.lit(k) for k in on]) if on else F.array().cast("array<string>")
        filtered = F.map_filter(col, lambda k, _: F.array_contains(keys, k) if on else F.lit(False))
    else:
        # only __name__ is excluded — __type__/__unit__ metadata labels DO
        # participate in matching while present (type_and_unit.test:265:
        # series differing only in metadata must not match)
        dropped = list(ignoring or []) + [METRIC_NAME_LABEL]
        keys = F.array(*[F.lit(k) for k in dropped])
        filtered = F.map_filter(col, lambda k, _: ~F.array_contains(keys, k))
    return sig_expr(filtered)


def group_labels_expr(
    labels_col: Column | str,
    by: Iterable[str] | None,
    without: Iterable[str] | None,
) -> Column:
    if isinstance(labels_col, str):  # hashable shape → memoized path
        return _group_labels_cached(
            labels_col,
            tuple(by) if by is not None else None,
            tuple(without) if without is not None else None,
        )
    return _group_labels_build(labels_col, by, without)


@functools.lru_cache(maxsize=256)
def _group_labels_cached(labels_col, by, without):
    return _group_labels_build(labels_col, by, without)


def _group_labels_build(
    labels_col: Column | str,
    by: Iterable[str] | None,
    without: Iterable[str] | None,
) -> Column:
    """Output label map for aggregation grouping (engine.go:4412).

    ``by(...)`` keeps listed labels; ``without(...)`` drops listed labels
    plus ``__name__``; bare aggregation groups everything into one series
    with empty labels.
    """
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    if by is not None:
        if not by:
            return F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            )
        keys = F.array(*[F.lit(k) for k in by])
        return F.map_filter(col, lambda k, _: F.array_contains(keys, k))
    if without is not None:
        dropped = list(without) + list(METADATA_LABELS)
        keys = F.array(*[F.lit(k) for k in dropped])
        return F.map_filter(col, lambda k, _: ~F.array_contains(keys, k))
    return F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))


@_memo_on_str
def drop_name_expr(labels_col: Column | str = "labels") -> Column:
    """Drop ``__name__`` — functions/operators that change meaning drop the
    metric name from output labels (reference: engine.go:4254
    ``cleanupMetricLabels``)."""
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    return F.map_filter(col, lambda k, _: k != F.lit(METRIC_NAME_LABEL))


# Schema metadata labels (reference: schema/labels.go IsMetadataLabel) —
# dropped together by meaning-changing operations under delayed name
# removal, and excluded from vector-matching signatures (PROM-39).
METADATA_LABELS = (METRIC_NAME_LABEL, "__type__", "__unit__")


@_memo_on_str
def group_labels_sql(
    labels_sql: str,
    by: Iterable[str] | None,
    without: Iterable[str] | None,
) -> str:
    """SQL-string form of :func:`group_labels_expr` (engine.go:4412)."""
    empty = "map_filter(" + labels_sql + ", (k, v) -> false)"
    if by is not None:
        if not by:
            return empty
        keys = ", ".join(sql_str_lit(k) for k in by)
        return (
            f"map_filter({labels_sql}, (k, v) -> "
            f"array_contains(array({keys}), k))"
        )
    if without is not None:
        dropped = list(without) + list(METADATA_LABELS)
        keys = ", ".join(sql_str_lit(k) for k in dropped)
        return (
            f"map_filter({labels_sql}, (k, v) -> "
            f"NOT array_contains(array({keys}), k))"
        )
    return empty


def sql_str_lit(s: str) -> str:
    """Quote a Python string as a Spark SQL string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


@_memo_on_str
def sig_subset_sql(
    sig_sql_ref: str,
    keep: Iterable[str] | None = None,
    drop: Iterable[str] | None = None,
) -> str:
    """Filter a canonical sig string's ``k\\x1ev`` pairs by key.

    The canonical signature IS the sorted serialization of the labels
    map, so the signature of any key-filtered submap is a plain
    subsequence of the pairs — computable by string filtering alone,
    with no map rebuild, no re-sort and no dim join.  Equals
    ``sig_sql(map_filter(labels, ...))`` whenever no label key or value
    contains the separator bytes; the engine probes that once per
    samples frame (``PromQLEngine._sig_pairs_ok``) and callers fall
    back to the map path when the probe fails.
    """
    import re

    if keep is not None:
        ks = sorted(set(keep))
        if not ks:
            return "''"
        alt = "|".join(re.escape(k) for k in ks)
        # remove every pair whose key is NOT in `keep` (negative
        # lookahead on key + KV_SEP so prefix keys can't false-match)
        pat = f"(?:^|{PAIR_SEP})(?!(?:{alt}){KV_SEP})[^{PAIR_SEP}]*"
    else:
        ks = sorted(set(drop or ()))
        if not ks:
            return f"({sig_sql_ref})"
        alt = "|".join(re.escape(k) for k in ks)
        pat = f"(?:^|{PAIR_SEP})(?:{alt}){KV_SEP}[^{PAIR_SEP}]*"
    # regexp_replace is whole-stage-codegen'd; the earlier
    # split/filter/array_join spelling ran as interpreted higher-order
    # functions and broke codegen for the surrounding stage (3x on the
    # 1.1M-row h_hundred sum bench cases).  A removed leading pair
    # leaves one dangling separator — the outer replace strips it.
    return (
        f"regexp_replace(regexp_replace({sig_sql_ref}, "
        f"{sql_str_lit(pat)}, ''), {sql_str_lit('^' + PAIR_SEP + '+')}, '')"
    )


@_memo_on_str
def labels_from_sig_sql(sig_sql_ref: str) -> str:
    """Rebuild the labels map from a canonical sig string (inverse of
    :func:`sig_sql`, under the same no-separator-bytes precondition as
    :func:`sig_subset_sql`).  Entry order is key-sorted — map lookups
    and re-signatures are order-insensitive, so this is equivalent to
    the ``map_filter`` construction for every consumer.

    Spelled as the codegen'd ``str_to_map`` builtin (2.3x the previous
    split/filter/transform HOF chain on a 2M-sig micro, and it keeps
    the surrounding stage in whole-stage codegen).  The one divergence
    — ``str_to_map('')`` yields ``{'': null}``, not ``{}`` — is guarded
    by the empty-sig branch; the sig is sorted so entry order matches,
    and multi-separator values are excluded by the same
    no-separator-bytes precondition both spellings share."""
    return (
        f"if(({sig_sql_ref}) = '', map(), "
        f"str_to_map({sig_sql_ref}, '\\u001F', '\\u001E'))"
    )


def sig_sql(labels_sql: str = "labels") -> str:
    """SQL-string form of :func:`sig_expr` — composed server-side in one
    selectExpr round trip (plan-construction latency path)."""
    return (
        f"array_join(transform(array_sort(map_entries({labels_sql})), "
        "e -> concat_ws('\\u001E', e.key, e.value)), '\\u001F')"
    )


def match_sig_sql(
    labels_sql: str,
    on: Iterable[str] | None,
    ignoring: Iterable[str] | None,
) -> str:
    """SQL-string form of :func:`match_sig_expr`."""
    if on is not None:
        keys = ", ".join(sql_str_lit(k) for k in sorted(set(on)))
        m = (
            f"map_filter({labels_sql}, (k, v) -> "
            f"array_contains(array({keys}), k))"
            if keys
            else f"map_filter({labels_sql}, (k, v) -> false)"
        )
    else:
        dropped = sorted(set(ignoring or ()) | {METRIC_NAME_LABEL})
        keys = ", ".join(sql_str_lit(k) for k in dropped)
        m = (
            f"map_filter({labels_sql}, (k, v) -> "
            f"NOT array_contains(array({keys}), k))"
        )
    return sig_sql(m)


def drop_metadata_sql(labels_sql: str = "labels") -> str:
    """SQL-string form of :func:`drop_metadata_expr`."""
    keys = ", ".join(sql_str_lit(k) for k in METADATA_LABELS)
    return (
        f"map_filter({labels_sql}, (k, v) -> "
        f"NOT array_contains(array({keys}), k))"
    )


def drop_metadata_expr(labels_col: Column | str = "labels") -> Column:
    """Drop all schema metadata labels (__name__/__type__/__unit__) — the
    delayed-name-removal finalization step (engine.go DropReserved)."""
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    keys = F.array(*[F.lit(k) for k in METADATA_LABELS])
    return F.map_filter(col, lambda k, _: ~F.array_contains(keys, k))
