"""The sig pair-filter: regexp spelling parity and the inline-vs-join
cost gate (labels.sig_subset_sql, EvalContext.sig_inline_ok,
selectors.selector_est)."""

import pytest
from pyspark.sql import functions as F

from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.values import VectorFrame
from prometheus_spark.model.labels import KV_SEP, PAIR_SEP, sig_subset_sql


def _map_path_sql(keep=None, drop=None):
    """The reference spelling: rebuild the key-filtered map and re-sign
    it (sig_sql over map_filter) — byte truth for sig_subset_sql.
    Plain map_filter, no implicit metadata drop: engine callers pass
    METADATA_LABELS into ``drop`` explicitly (aggregations._grouped_fact)."""
    from prometheus_spark.model.labels import sig_sql, sql_str_lit

    ks = keep if keep is not None else (drop or ())
    keys = ", ".join(sql_str_lit(k) for k in ks) or "''"
    neg = "" if keep is not None else "NOT "
    return sig_sql(
        f"map_filter(labels, (k, v) -> {neg}array_contains(array({keys}), k))"
    )


LABELSETS = [
    {"__name__": "up", "l": "7", "le": "0.5"},
    {"__name__": "up", "le": "+Inf"},          # first pair dropped cases
    {"l": "x"},                                # single pair
    {"lease": "v", "le": "1", "l": "0"},       # prefix-colliding keys
    {"a.b": "dot", "a+b": "plus", "ab": "x"},  # regex metachars in keys
    {},                                        # empty labelset
]


@pytest.mark.parametrize(
    "keep,drop",
    [
        (("l",), None), (("le", "l"), None), (("nope",), None),
        ((), None), (("a.b",), None),
        (None, ("le",)), (None, ("l", "le")), (None, ("a+b", "ab")),
        (None, ()), (None, ("__name__",)),
    ],
)
def test_sig_subset_matches_map_rebuild(spark, keep, drop):
    rows = [
        (PAIR_SEP.join(f"{k}{KV_SEP}{v}" for k, v in sorted(ls.items())), ls)
        for ls in LABELSETS
    ]
    df = spark.createDataFrame(rows, "sig string, labels map<string,string>")
    got = sig_subset_sql("sig", keep=keep, drop=drop)
    want = _map_path_sql(keep=keep, drop=drop)
    bad = df.selectExpr(f"{got} AS g", f"{want} AS w").filter(
        "g IS DISTINCT FROM w"
    )
    assert bad.count() == 0, bad.collect()


def test_sig_subset_is_codegen_friendly():
    # the pair-filter must stay a regexp_replace chain — interpreted
    # higher-order functions (split/filter/array_join) break whole-stage
    # codegen for the surrounding stage (3x on 1M-row fact projections)
    s = sig_subset_sql("sig", keep=("l",))
    assert "regexp_replace" in s
    for hof in ("filter(", "transform(", "array_join"):
        assert hof not in s


def _ctx(**kw):
    defaults = dict(
        spark=None, samples=None, start_ms=0, end_ms=0, step_ms=1,
        sig_pairs_ok=True, dims_broadcastable=True,
        series_count=1500, avg_sig_bytes=30.0,
    )
    defaults.update(kw)
    return EvalContext(**defaults)


class _VF:
    def __init__(self, n, w=30.0):
        self.est_series = n
        self.est_sig_bytes = w


def test_gate_instant_inline_even_at_high_cardinality():
    # steps=1: fact rows == dim rows — the join can never win, and the
    # per-series allowance keeps inline chosen at any cardinality
    ctx = _ctx(end_ms=0, step_ms=1000, series_count=1_000_000)
    assert ctx.sig_inline_ok(_VF(1_000_000, 40.0))


def test_gate_range_over_many_series_takes_join():
    # 1.1k series x 1000 steps x 30B ≈ 33MB of regex text — join wins
    ctx = _ctx(end_ms=999_000, step_ms=1000)
    assert not ctx.sig_inline_ok(_VF(1100, 30.0))


def test_gate_range_over_few_series_stays_inline():
    # 100 series x 1000 steps x 26B ≈ 2.6MB — under the fixed budget
    ctx = _ctx(end_ms=999_000, step_ms=1000)
    assert ctx.sig_inline_ok(_VF(100, 26.0))


def test_gate_unknown_frame_falls_back_to_whole_frame_totals():
    ctx = _ctx(end_ms=999_000, step_ms=1000, series_count=1500)
    # 1500 x 1001 x 30 ≈ 45MB -> join
    assert not ctx.sig_inline_ok(VectorFrame(df="x"))
    # and with no frames at all, same totals fallback
    assert not ctx.sig_inline_ok()


def test_gate_non_broadcastable_dim_always_inline():
    ctx = _ctx(end_ms=999_000, step_ms=1000, dims_broadcastable=False)
    assert ctx.sig_inline_ok(_VF(10_000_000, 100.0))


def test_selector_est_name_matchers():
    from prometheus_spark.engine.selectors import selector_est
    from prometheus_spark.parser.ast import Matcher, MatchType, VectorSelector

    stats = {"purchase": (100, 40.0), "click": (300, 20.0), "up": (1, 10.0)}
    ctx = _ctx(name_stats=stats)

    def sel(name=None, matchers=()):
        return VectorSelector(name=name, matchers=list(matchers))

    assert selector_est(ctx, sel(name="purchase")) == (100, 40.0)
    assert selector_est(ctx, sel(name="absent_metric")) == (0, 0.0)
    n, w = selector_est(
        ctx, sel(matchers=[Matcher("__name__", MatchType.RE, "purchase|click")])
    )
    assert n == 400 and w == pytest.approx(25.0)
    n, _ = selector_est(
        ctx, sel(matchers=[Matcher("__name__", MatchType.NRE, "purchase|click")])
    )
    assert n == 1
    n, _ = selector_est(
        ctx, sel(matchers=[Matcher("__name__", MatchType.NEQ, "up")])
    )
    assert n == 400
    # no name matcher -> unknown (whole-frame fallback)
    assert selector_est(ctx, sel(matchers=[Matcher("l", MatchType.EQ, "x")])) is None
    # stats absent -> unknown
    assert selector_est(_ctx(), sel(name="purchase")) is None


def test_labels_from_sig_roundtrip(spark):
    """labels_from_sig_sql (r13: codegen'd str_to_map spelling) must
    invert sig_sql exactly: map equality AND entry order (the sig is
    key-sorted, so the rebuilt entries must come out key-sorted too —
    re-signing the rebuilt map has to be byte-stable)."""
    from prometheus_spark.model.labels import labels_from_sig_sql, sig_sql

    rows = [
        (PAIR_SEP.join(f"{k}{KV_SEP}{v}" for k, v in sorted(ls.items())), ls)
        for ls in LABELSETS
    ] + [
        # empty-string values and space-bearing values survive
        ("k" + KV_SEP, {"k": ""}),
        ("a" + KV_SEP + "x y" + PAIR_SEP + "z" + KV_SEP, {"a": "x y", "z": ""}),
    ]
    df = spark.createDataFrame(rows, "sig string, labels map<string,string>")
    # MAP columns have no ordering — compare through the canonical sig
    # (which is exactly the property consumers rely on): the rebuilt
    # map must re-sign byte-identically to the input sig AND to the
    # sig of the expected map.
    bad = df.selectExpr(
        f"{sig_sql(labels_from_sig_sql('sig'))} AS resig",
        f"{sig_sql('labels')} AS want",
        "sig",
    ).filter("resig IS DISTINCT FROM sig OR resig IS DISTINCT FROM want")
    assert bad.count() == 0, bad.collect()
    # element_at semantics survive (value lookups, empty-string values)
    got = {
        r["sig"]: (r["a"], r["k"])
        for r in df.selectExpr(
            "sig",
            f"element_at({labels_from_sig_sql('sig')}, 'a') AS a",
            f"element_at({labels_from_sig_sql('sig')}, 'k') AS k",
        ).collect()
    }
    assert got["k" + KV_SEP] == (None, "")


def test_labels_from_sig_is_codegen_friendly():
    from prometheus_spark.model.labels import labels_from_sig_sql

    s = labels_from_sig_sql("sig")
    assert "str_to_map" in s
    for hof in ("filter(", "transform(", "map_from_entries"):
        assert hof not in s
