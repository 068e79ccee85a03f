"""Binary operators — vector matching as equi-joins on label signatures.

Reference semantics: promql/engine.go:3191 (``VectorBinop`` — hash join on
signature), engine.go:3484 (``vectorElemBinop``), engine.go:3359
(``resultMetric``), set ops engine.go:3115-3190, scalar paths
engine.go:3404-3480.  The join key is the label set minus ``__name__``,
restricted by ``on(...)`` / expanded by ``ignoring(...)``.

Error semantics the reference enforces and Spark must too
(engine.go:3216-3229, 3280): duplicate signatures on the "one" side and
many-to-one matches without explicit grouping *error out* — implemented as
JVM-side ``raise_error`` guarded by a window count, so no extra job runs.

IEEE-754 caveat: Spark SQL defines ``NaN = NaN`` as true and sorts NaN
above all doubles; PromQL follows Go/IEEE (NaN compares false except
``!=``).  All comparison predicates are therefore NaN-guarded explicitly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prometheus_spark.engine.aggregations import PromQLEvalError
from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.values import (
    ConstScalar,
    ScalarFrame,
    VectorFrame,
    scalar_frame_from_const,
)
from prometheus_spark.model.labels import drop_name_expr, match_sig_expr, sig_expr
from prometheus_spark.model.schema import METRIC_NAME_LABEL
from prometheus_spark.parser.ast import (
    COMPARISON_OPS,
    BinaryExpr,
    MatchCardinality,
    VectorMatching,
)

def _NAN():  # lazily built: F.lit needs an active SparkContext
    return F.lit(float("nan"))


def arith_expr(op: str, l: Column, r: Column) -> Column:
    """IEEE-faithful arithmetic (engine.go:3484 ``vectorElemBinop``)."""
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        # Spark double division yields NULL on /0 in some modes; force IEEE.
        return F.when(
            r == 0.0,
            F.when(F.isnan(l) | (l == 0.0), _NAN()).otherwise(
                F.when(l > 0, F.lit(float("inf"))).otherwise(F.lit(float("-inf")))
            ),
        ).otherwise(l / r)
    if op == "%":
        # Go math.Mod: sign of dividend, undefined → NaN
        return F.when((r == 0.0) | F.isnan(l) | F.isnan(r), _NAN()).otherwise(l % r)
    if op == "^":
        return F.pow(l, r)
    if op == "atan2":
        return F.atan2(l, r)
    raise PromQLEvalError(f"unsupported arithmetic op {op}")


def compare_expr(op: str, l: Column, r: Column) -> Column:
    """IEEE comparison: NaN compares false except ``!=`` (engine.go:3451)."""
    both = (~F.isnan(l)) & (~F.isnan(r))
    if op == "==":
        return both & (l == r)
    if op == "!=":
        return F.isnan(l) | F.isnan(r) | (l != r)
    if op == ">":
        return both & (l > r)
    if op == "<":
        return both & (l < r)
    if op == ">=":
        return both & (l >= r)
    if op == "<=":
        return both & (l <= r)
    raise PromQLEvalError(f"unsupported comparison {op}")


def scalar_scalar(op: str, l: float, r: float) -> float:
    if op in COMPARISON_OPS:
        if op == "==":
            return 1.0 if l == r else 0.0
        if op == "!=":
            return 1.0 if l != r else 0.0
        if op == ">":
            return 1.0 if l > r else 0.0
        if op == "<":
            return 1.0 if l < r else 0.0
        if op == ">=":
            return 1.0 if l >= r else 0.0
        return 1.0 if l <= r else 0.0
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        if r == 0:
            if math.isnan(l) or l == 0:
                return float("nan")
            return float("inf") if l > 0 else float("-inf")
        return l / r
    if op == "%":
        return math.fmod(l, r) if r != 0 else float("nan")
    if op == "^":
        return l**r if not (math.isnan(l) or math.isnan(r)) else float("nan")
    if op == "atan2":
        return math.atan2(l, r)
    raise PromQLEvalError(f"unsupported scalar op {op}")


def vector_scalar(
    ctx: EvalContext, node: BinaryExpr, vf: VectorFrame, scalar, vector_on_left: bool
) -> VectorFrame:
    """vector ⊗ scalar — broadcast (engine.go:3404 ``VectorscalarBinop``).

    Histogram samples combine with scalars only via ``*`` (either side),
    ``/`` (histogram on the left), and the ``</``/``>/`` trim operators —
    vectorElemBinop mixed cases; everything else drops them."""
    has_hist = "hist" in vf.fact.columns
    if node.op in ("</", ">/"):
        # trims apply to histogram-left × scalar only; floats and
        # scalar-left forms drop every sample (vectorElemBinop TRIM_*)
        if not has_hist or not vector_on_left:
            return VectorFrame(
                fact=vf.fact.filter(F.lit(False)).select(
                    "sig", "t", "sample_t", "value", "drop_name"
                ),
                dim=vf.dim,
            )
        from prometheus_spark.engine import hist_arith

        df = vf.df.filter(F.col("hist").isNotNull())
        if isinstance(scalar, ConstScalar):
            df = df.withColumn("__s", F.lit(float(scalar.value)))
        else:
            df = df.join(F.broadcast(scalar.df.withColumnRenamed("value", "__s")), "t")
        # trims keep __name__ (changesMetricSchema engine.go:4437 excludes TRIM_*)
        src = df.select("labels", "t", "hist", "__s")
        return VectorFrame(hist_arith.trim_scalar(ctx, src, is_upper=node.op == "</"))
    hist_mul = has_hist and (
        node.op == "*" or (node.op == "/" and vector_on_left)
    ) and node.op not in COMPARISON_OPS
    # split contract: a vector⊗scalar never changes a labelset — fact-only
    # ops, dim passes through untouched
    fact = vf.fact if hist_mul else vf.fact.filter(F.col("value").isNotNull())
    dim = vf.dim
    if isinstance(scalar, ConstScalar):
        s = F.lit(float(scalar.value))
    else:  # per-step scalar — broadcast join on t
        fact = fact.join(
            F.broadcast(scalar.df.withColumnRenamed("value", "__s")), "t"
        )
        s = F.col("__s")
    l, r = (F.col("value"), s) if vector_on_left else (s, F.col("value"))
    if node.op in COMPARISON_OPS:
        pred = compare_expr(node.op, l, r)
        if node.return_bool:
            out = fact.select(
                "sig",
                "t",
                "sample_t",
                F.when(pred, 1.0).otherwise(0.0).alias("value"),
                F.lit(True).alias("drop_name"),
            )
        else:
            out = fact.filter(pred).select(
                "sig", "t", "sample_t", "value", "drop_name"
            )
        return VectorFrame(fact=out, dim=dim)
    hist_cols = []
    if hist_mul:
        hist_cols = [
            F.when(
                F.col("hist").isNotNull(),
                scale_hist_expr(F.col("hist"), s, is_div=node.op == "/"),
            ).alias("hist")
        ]
    out = fact.select(
        "sig",
        "t",
        "sample_t",
        F.when(F.col("value").isNotNull(), arith_expr(node.op, l, r))
        .cast("double")
        .alias("value")
        if hist_mul
        else arith_expr(node.op, l, r).cast("double").alias("value"),
        F.lit(True).alias("drop_name"),
        *hist_cols,
    )
    return VectorFrame(fact=out, dim=dim)


def _msig_sql(vm: VectorMatching) -> str:
    from prometheus_spark.model.labels import match_sig_sql

    on = vm.labels if vm.on else None
    ignoring = vm.labels if not vm.on else None
    return match_sig_sql("labels", on, ignoring)


def _with_match_sig(df: DataFrame, vm: VectorMatching) -> DataFrame:
    return df.selectExpr("*", _msig_sql(vm) + " AS msig")


def _msig_pair_sql(vm: VectorMatching) -> str:
    """Match signature as a pair-filter of the row's own canonical sig
    (labels.sig_subset_sql) — valid when the engine probed the frame's
    labels as separator-free (EvalContext.sig_pairs_ok)."""
    from prometheus_spark.model.labels import sig_subset_sql

    if vm.on:
        return sig_subset_sql("sig", keep=tuple(vm.labels))
    return sig_subset_sql(
        "sig", drop=tuple(vm.labels or ()) + (METRIC_NAME_LABEL,)
    )


def _rsig_pair_sql(vm: VectorMatching) -> str:
    """Result signature as a pair-filter of the many side's sig — the
    split-path mirror of :func:`_result_labels_sql` (vm.include shapes
    never reach the split path).  Returns the literal column reference
    ``sig`` when the result labels are the many side's labels verbatim."""
    from prometheus_spark.model.labels import sig_subset_sql

    if vm.card == MatchCardinality.ONE_TO_ONE:
        if vm.on:
            return sig_subset_sql("sig", keep=tuple(vm.labels))
        if vm.labels:
            return sig_subset_sql("sig", drop=tuple(vm.labels))
    return "sig"


def arith_sql(op: str, l: str, r: str) -> str:
    """SQL-string form of :func:`arith_expr` (engine.go:3484)."""
    if op in ("+", "-", "*"):
        return f"(({l}) {op} ({r}))"
    if op == "/":
        return (
            f"(CASE WHEN ({r}) = 0.0D THEN "
            f"CASE WHEN isnan({l}) OR ({l}) = 0.0D THEN CAST('NaN' AS DOUBLE) "
            f"WHEN ({l}) > 0 THEN CAST('Infinity' AS DOUBLE) "
            f"ELSE CAST('-Infinity' AS DOUBLE) END "
            f"ELSE ({l}) / ({r}) END)"
        )
    if op == "%":
        return (
            f"(CASE WHEN ({r}) = 0.0D OR isnan({l}) OR isnan({r}) "
            f"THEN CAST('NaN' AS DOUBLE) ELSE ({l}) % ({r}) END)"
        )
    if op == "^":
        return f"power({l}, {r})"
    if op == "atan2":
        return f"atan2({l}, {r})"
    raise PromQLEvalError(f"unsupported arithmetic op {op}")


def compare_sql(op: str, l: str, r: str) -> str:
    """SQL-string form of :func:`compare_expr` — NaN compares false
    except ``!=`` (engine.go:3451)."""
    if op == "!=":
        return f"(isnan({l}) OR isnan({r}) OR ({l}) != ({r}))"
    sqlop = "=" if op == "==" else op
    return (
        f"(NOT isnan({l}) AND NOT isnan({r}) AND ({l}) {sqlop} ({r}))"
    )


def _result_labels_sql(vm: VectorMatching) -> str:
    """SQL-string form of :func:`_result_labels_expr`."""
    from prometheus_spark.model.labels import sql_str_lit

    base = "labels"
    if vm.card == MatchCardinality.ONE_TO_ONE:
        if vm.on:
            if vm.labels:
                keys = ", ".join(sql_str_lit(k) for k in vm.labels)
                base = (
                    f"map_filter(labels, (k, v) -> "
                    f"array_contains(array({keys}), k))"
                )
            else:
                base = "map_filter(labels, (k, v) -> false)"
        elif vm.labels:
            keys = ", ".join(sql_str_lit(k) for k in vm.labels)
            base = (
                f"map_filter(labels, (k, v) -> "
                f"NOT array_contains(array({keys}), k))"
            )
    if vm.include:
        inc = ", ".join(sql_str_lit(k) for k in vm.include)
        one_inc = (
            f"map_filter(__olabels, (k, v) -> "
            f"array_contains(array({inc}), k) AND v != '')"
        )
        base_rest = (
            f"map_filter({base}, (k, v) -> "
            f"NOT array_contains(array({inc}), k))"
        )
        return f"map_concat({base_rest}, {one_inc})"
    return base


def _match_labels_map(labels_col: Column, on, ignoring) -> Column:
    """The label subset forming the match signature, as a map."""
    if on is not None:
        keys = (
            F.array(*[F.lit(k) for k in on]) if on else F.array().cast("array<string>")
        )
        return F.map_filter(labels_col, lambda k, _: F.array_contains(keys, k))
    dropped = list(ignoring or []) + [METRIC_NAME_LABEL]
    keys = F.array(*[F.lit(k) for k in dropped])
    return F.map_filter(labels_col, lambda k, _: ~F.array_contains(keys, k))


def scale_hist_expr(h: Column, factor: Column, is_div: bool) -> Column:
    """Histogram × scalar, fully JVM-side (float_histogram.go:291 Mul /
    :310 Div): scale zero_count/count/sum and every bucket; factor < 0 ⇒
    gauge hint; factor == 0 ⇒ buckets removed (Mul(0)+Compact ≡ Div(0))."""
    from prometheus_spark.model.schema import HISTOGRAM_TYPE

    op = "/" if is_div else "*"
    num = lambda c: arith_expr(op, c, factor)
    zero_f = factor == 0.0
    empty_spans = F.array().cast("array<struct<offset:int,length:int>>")
    empty_bkts = F.array().cast("array<double>")
    return F.struct(
        h["schema"].alias("schema"),
        h["zero_threshold"].alias("zero_threshold"),
        num(h["zero_count"]).alias("zero_count"),
        num(h["count"]).alias("count"),
        num(h["sum"]).alias("sum"),
        F.when(zero_f, empty_spans).otherwise(h["pos_spans"]).alias("pos_spans"),
        F.when(zero_f, empty_bkts)
        .otherwise(F.transform(h["pos_buckets"], lambda b: num(b)))
        .alias("pos_buckets"),
        F.when(zero_f, empty_spans).otherwise(h["neg_spans"]).alias("neg_spans"),
        F.when(zero_f, empty_bkts)
        .otherwise(F.transform(h["neg_buckets"], lambda b: num(b)))
        .alias("neg_buckets"),
        h["custom_values"].alias("custom_values"),
        F.when(factor < 0, F.lit(3))
        .otherwise(h["counter_reset_hint"])
        .cast("tinyint")
        .alias("counter_reset_hint"),
    ).cast(HISTOGRAM_TYPE)


def _align_hist(l: DataFrame, r: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Frames may or may not carry the ``hist`` / ``st`` columns (selector
    outputs do, computed vectors don't) — pad with NULLs so unions line
    up."""
    from prometheus_spark.model.schema import HISTOGRAM_TYPE

    for col, typ in (("hist", HISTOGRAM_TYPE), ("st", "long")):
        lc, rc = col in l.columns, col in r.columns
        if lc and not rc:
            r = r.withColumn(col, F.lit(None).cast(typ))
        elif rc and not lc:
            l = l.withColumn(col, F.lit(None).cast(typ))
    return l, r


def set_op(ctx: EvalContext, op: str, lhs: VectorFrame, rhs: VectorFrame, vm: VectorMatching) -> VectorFrame:
    """and / or / unless (engine.go:3115-3190).

    Split frame contract: match signatures are computed once per SERIES
    on each side's dim and joined onto the facts by sig; the semi/anti
    joins then move only narrow fact rows."""
    lf, rf = _align_hist(lhs.fact, rhs.fact)
    cols = ["sig", "t", "sample_t", "value", "drop_name"] + (
        ["hist"] if "hist" in lf.columns else []
    )
    if ctx.sig_inline_ok(lhs, rhs):
        # sig pair-filter path: match sigs inline from each fact's own
        # sig (labels.sig_subset_sql) — no dim mapping joins
        msig_pair = _msig_pair_sql(vm)
        l = lf.selectExpr("*", msig_pair + " AS msig")
        r = rf.selectExpr("*", msig_pair + " AS msig")
    else:
        msig = _msig_sql(vm)
        lmap = lhs.dim.selectExpr("sig", msig + " AS msig")
        rmap = rhs.dim.selectExpr("sig", msig + " AS msig")
        l = lf.join(ctx.dim_hint(lmap), "sig")
        r = rf.join(ctx.dim_hint(rmap), "sig")
    rkeys = r.select("msig", "t").distinct()
    if op == "and":
        out = l.join(rkeys, ["msig", "t"], "left_semi")
        dim = lhs.dim
    elif op == "unless":
        out = l.join(rkeys, ["msig", "t"], "left_anti")
        dim = lhs.dim
    elif op == "or":
        lkeys = l.select("msig", "t").distinct()
        extra = r.select(*l.columns).join(lkeys, ["msig", "t"], "left_anti")
        out = l.unionByName(extra)
        dim = ctx.dim_dedup(lhs.dim.unionByName(rhs.dim))
    else:
        raise PromQLEvalError(op)
    return VectorFrame(fact=out.select(*cols), dim=dim)


def vector_vector(
    ctx: EvalContext, node: BinaryExpr, lhs: VectorFrame, rhs: VectorFrame
) -> VectorFrame:
    vm = node.matching or VectorMatching()
    if node.op in ("and", "or", "unless"):
        return set_op(ctx, node.op, lhs, rhs, vm)
    has_hist = "hist" in lhs.fact.columns or "hist" in rhs.fact.columns
    # Split fast path: no histogram arithmetic/trim — the result
    # labelset is a function of the MANY side's labels alone (fill-
    # synthesized rows take the one side's match labels, which also
    # compute per SERIES on the one dim), so match sig AND result
    # (sig, labels) both compute per series on the dims and the
    # (msig, t) equi-join moves only narrow fact rows.
    # group_left/right INCLUDE shapes pull label values from the one
    # side per matched pair, but whenever no two one-side series share
    # a match signature (the memoized _dup_msigs_possible dim probe,
    # False for virtually every sane join key) the msig → one-labels
    # mapping is a per-SERIES function too — the split path computes
    # the result labelset on a dim-sized pair join and bails to the
    # legacy inline-labels plan otherwise (there include labels can
    # genuinely vary per row over time).  include+fill keeps legacy:
    # fill-synthesized rows have no matched one series to include from.
    if not (
        node.op in ("</", ">/")
        or (has_hist and node.op in ("+", "-", "*", "/"))
        or (
            vm.include
            and (node.fill_lhs is not None or node.fill_rhs is not None)
        )
    ):
        return _vector_vector_split(ctx, node, lhs, rhs, vm)
    return _vector_vector_legacy(ctx, node, lhs, rhs, vm)


def _vector_vector_split(
    ctx: EvalContext, node: BinaryExpr, lhs: VectorFrame, rhs: VectorFrame,
    vm: VectorMatching,
) -> VectorFrame:
    from prometheus_spark.model.labels import sig_sql

    card = vm.card
    one_is_rhs = card != MatchCardinality.ONE_TO_MANY
    lf, rf = _align_hist(lhs.fact, rhs.fact)
    has_hist = "hist" in lf.columns
    many_f, one_f = (lf, rf) if one_is_rhs else (rf, lf)
    many_d, one_d = (
        (lhs.dim, rhs.dim) if one_is_rhs else (rhs.dim, lhs.dim)
    )

    msig = _msig_sql(vm)
    # Plain one-to-one matching (no on/ignoring) leaves the result
    # labelset EQUAL to the many side's labels (__name__ removal is the
    # drop_name flag, applied at finalize) — so the result sig IS the
    # input sig: reuse the input dim verbatim, skip the re-sign and the
    # output dedup (the overwhelmingly common `a / b` shape pays one
    # narrow mapping join and nothing else).
    identity_result = (
        card == MatchCardinality.ONE_TO_ONE and vm.on is False and not vm.labels
    )
    # include shapes read one-side labels — their match/result sigs
    # can't be pair-filtered from the many fact's own sig
    pairs_ok = ctx.sig_inline_ok(lhs, rhs) and not vm.include

    def _dup_msigs_possible(d) -> bool:
        """Plan-time probe: can two of this side's SERIES share a match
        signature?  Decidable from the tiny dim; when they can't, no
        (msig, t) duplicate can exist and the window guard is elided —
        the reference's check is an O(input) hash insert
        (engine.go:3349 region), and a result-sized window exchange on
        every strict binop was our single largest fixed overhead.
        Memoized per (dim shape, match form) — the same selector under
        the same matching across queries probes once per engine."""
        m = _msig_pair_sql(vm) if pairs_ok else msig

        def _run(dd):
            return (
                dd.selectExpr(m + " AS m")
                .groupBy("m")
                .count()
                .filter("count > 1")
                .limit(1)
                .count()
                > 0
            )

        return ctx.probe(d, ("dupmsig", m), _run)

    if vm.include and _dup_msigs_possible(one_d):
        # two one-side series share a match signature: the include
        # labels may vary per (msig, t) row — only the legacy inline-
        # labels plan (and its runtime duplicate guard) is faithful
        return _vector_vector_legacy(ctx, node, lhs, rhs, vm)

    if pairs_ok:
        # Sig pair-filter path (labels.sig_subset_sql): match and result
        # sigs are key-filtered subsequences of each fact's own canonical
        # sig — computed inline per row, eliding BOTH dim mapping joins.
        # group_left/right (no include) and plain 1:1 keep the many
        # side's labels verbatim, so the result sig is the input sig and
        # the input dim passes through untouched.
        msig_pair = _msig_pair_sql(vm)
        rsig_pair = _rsig_pair_sql(vm)
        many = many_f.selectExpr(
            "*", msig_pair + " AS msig", rsig_pair + " AS __rsig"
        )
    else:
        if identity_result:
            mdim = many_d.selectExpr("sig", msig + " AS msig", "sig AS __rsig")
        elif vm.include:
            # result labels = f(many labels, matched one-side labels):
            # with unique one-side msigs (probed above) that's a
            # per-SERIES function, computed on a dim-sized pair join —
            # the fact join below still moves only narrow rows.  The
            # inner join also drops many series with no match partner
            # before their facts are scanned (semi-join pre-filter).
            rlabels = _result_labels_sql(vm)
            odim = one_d.selectExpr(
                msig + " AS msig", "labels AS __olabels"
            )
            mdim = (
                many_d.selectExpr("sig", "labels", msig + " AS msig")
                .join(ctx.dim_hint(odim), "msig")
                .selectExpr(
                    "sig",
                    "msig",
                    sig_sql(rlabels) + " AS __rsig",
                    rlabels + " AS __rlabels",
                )
            )
        else:
            rlabels = _result_labels_sql(vm)
            mdim = many_d.selectExpr(
                "sig",
                msig + " AS msig",
                sig_sql(rlabels) + " AS __rsig",
                rlabels + " AS __rlabels",
            )
        many = many_f.join(
            ctx.dim_hint(mdim.select("sig", "msig", "__rsig")), "sig"
        )

    # fill modifiers (ast.go:329): fill_lhs always fills the "many"
    # side and fill_rhs the "one" side (the reference swaps operands
    # for group_right but not the fill values; fill-modifier.test:185).
    fill_many = node.fill_lhs
    fill_one = node.fill_rhs
    if fill_many is not None and fill_one is not None:
        how = "full_outer"
    elif fill_many is not None:
        how = "right_outer"  # keep unmatched "one" rows
    elif fill_one is not None:
        how = "left_outer"  # keep unmatched "many" rows
    else:
        how = "inner"

    fdim = None
    one_cols = [
        "t",
        "value AS __ov",
        "drop_name AS __odrop",
        *(["hist AS __ohist"] if has_hist else []),
    ]
    if pairs_ok:
        # fill-synthesized rows take the one side's MATCH labels, and the
        # split path's result shaping is the identity over that map (it
        # already contains exactly the on-labels / excludes the ignored
        # ones) — so __fsig ≡ msig, itself a pair-filter of the one
        # side's sig.  The fill dim rebuilds the map from the string.
        one = one_f.selectExpr(
            _msig_pair_sql(vm) + " AS msig",
            *one_cols,
            *(
                [_msig_pair_sql(vm) + " AS __fsig"]
                if fill_many is not None
                else []
            ),
        )
        if fill_many is not None:
            from prometheus_spark.model.labels import labels_from_sig_sql

            fdim = ctx.dim_dedup(
                one_d.selectExpr(_msig_pair_sql(vm) + " AS sig")
            ).selectExpr("sig", labels_from_sig_sql("sig") + " AS labels")
    else:
        one_map = one_d.selectExpr("sig", msig + " AS msig")
        if fill_many is not None:
            # Synthetic many-side rows take the one side's MATCH labels as
            # their labelset, then the result-labels shaping — both pure
            # functions of the one side's labels, so computed once per
            # SERIES on the one dim (legacy-path parity: coalesce(labels,
            # match_labels) before the result select).
            on = vm.labels if vm.on else None
            ignoring = vm.labels if not vm.on else None
            rl = _result_labels_sql(vm)
            fmap = one_d.select(
                F.col("sig"),
                F.expr(msig).alias("msig"),
                _match_labels_map(F.col("labels"), on, ignoring).alias("labels"),
            ).selectExpr(
                "sig",
                "msig",
                sig_sql(rl) + " AS __fsig",
                rl + " AS __flabels",
            )
            one_map = fmap.select("sig", "msig", "__fsig")
            fdim = fmap.select(
                F.col("__fsig").alias("sig"), F.col("__flabels").alias("labels")
            )

        one = one_f.join(ctx.dim_hint(one_map), "sig").selectExpr(
            "msig",
            *one_cols,
            *(["__fsig"] if fill_many is not None else []),
        )

    guard = "0.0D"
    if ctx.strict and _dup_msigs_possible(one_d):
        side = "right" if one_is_rhs else "left"
        one = one.selectExpr(
            "*",
            "CASE WHEN count(1) OVER (PARTITION BY msig, t) > 1 THEN "
            "CAST(raise_error(concat("
            f"'found duplicate series for the match group on the {side} "
            "hand-side of the operation: ', msig)) AS DOUBLE) END AS __chk",
        )
        guard = "coalesce(__chk, 0.0D)"

    joined = many.join(one, ["msig", "t"], how)
    if fill_one is not None:
        joined = joined.withColumn(
            "__ov", F.coalesce(F.col("__ov"), F.lit(float(fill_one)))
        )
    if fill_many is not None:
        joined = joined.withColumn(
            "value", F.coalesce(F.col("value"), F.lit(float(fill_many)))
        )
    if (
        ctx.strict
        and card == MatchCardinality.ONE_TO_ONE
        and _dup_msigs_possible(many_d)
    ):
        joined = joined.selectExpr(
            "*",
            "CASE WHEN count(1) OVER (PARTITION BY msig, t) > 1 THEN "
            "CAST(raise_error('multiple matches for labels: many-to-one "
            "matching must be explicit (group_left/group_right)') "
            "AS DOUBLE) END AS __chk2",
        )
        guard = f"({guard} + coalesce(__chk2, 0.0D))"

    l_val = "value" if one_is_rhs else "__ov"
    r_val = "__ov" if one_is_rhs else "value"
    l_hist = ("hist" if one_is_rhs else "__ohist") if has_hist else "NULL"
    r_hist = ("__ohist" if one_is_rhs else "hist") if has_hist else "NULL"
    both_float = f"({l_val} IS NOT NULL AND {r_val} IS NOT NULL)"
    both_hist = (
        f"({l_hist} IS NOT NULL AND {r_hist} IS NOT NULL)" if has_hist else "false"
    )

    if node.op in COMPARISON_OPS:
        # coalesce: fill_lhs-synthesized rows are many-side outer-join
        # misses whose drop_name is NULL — they carry no __name__, so
        # false is the faithful flag (finalize's CASE WHEN treated NULL
        # as false implicitly; make it explicit)
        flag = "true" if node.return_bool else "coalesce(drop_name, false)"
        pred_f = compare_sql(node.op, l_val, r_val)
        if has_hist and node.op in ("==", "!="):
            pred_h = (
                f"({l_hist} = {r_hist})"
                if node.op == "=="
                else f"(NOT ({l_hist} = {r_hist}))"
            )
            supported = f"({both_float} OR {both_hist})"
            pred = (
                f"(CASE WHEN {both_hist} THEN {pred_h} "
                f"ELSE {both_float} AND {pred_f} END)"
            )
        else:
            supported = both_float
            pred = f"({both_float} AND {pred_f})"
        if node.return_bool:
            joined = joined.filter(f"{supported} OR ({guard}) != 0.0D")
            value = f"(CASE WHEN {pred} THEN 1.0D ELSE 0.0D END + {guard})"
        else:
            joined = joined.filter(f"({supported} AND {pred}) OR ({guard}) != 0.0D")
            value = f"({l_val} + {guard})"  # filter keeps the lhs sample
    else:
        flag = "true"
        joined = joined.filter(f"{both_float} OR ({guard}) != 0.0D")
        value = (
            f"(CAST({arith_sql(node.op, l_val, r_val)} AS DOUBLE) + {guard})"
        )

    hist_out = []
    if has_hist and node.op in COMPARISON_OPS and not node.return_bool:
        hist_out = [("hist" if one_is_rhs else "__ohist") + " AS hist"]

    sig_out = "coalesce(__rsig, __fsig)" if fill_many is not None else "__rsig"
    fact = joined.selectExpr(
        sig_out + " AS sig",
        "t",
        "t AS sample_t",
        value + " AS value",
        flag + " AS drop_name",
        *hist_out,
    )
    if pairs_ok:
        rsig_pair = _rsig_pair_sql(vm)
        if rsig_pair == "sig":
            dim = many_d
        else:
            from prometheus_spark.model.labels import labels_from_sig_sql

            dim = ctx.dim_dedup(
                many_d.selectExpr(rsig_pair + " AS sig")
            ).selectExpr("sig", labels_from_sig_sql("sig") + " AS labels")
    elif identity_result:
        dim = many_d
    else:
        dim = ctx.dim_dedup(
            mdim.select(
                F.col("__rsig").alias("sig"),
                F.col("__rlabels").alias("labels"),
            )
        )
    if fdim is not None:
        dim = ctx.dim_dedup(dim.unionByName(fdim))
    return VectorFrame(fact=fact, dim=dim)


def _vector_vector_legacy(
    ctx: EvalContext, node: BinaryExpr, lhs: VectorFrame, rhs: VectorFrame,
    vm: VectorMatching,
) -> VectorFrame:
    card = vm.card
    # The "one" side must be unique per (msig, t): rhs for one-to-one and
    # group_left, lhs for group_right (engine.go:3216-3229).
    one_is_rhs = card != MatchCardinality.ONE_TO_MANY
    ldf, rdf = _align_hist(lhs.df, rhs.df)
    has_hist = "hist" in ldf.columns
    many_df = ldf if one_is_rhs else rdf
    one_df = rdf if one_is_rhs else ldf

    # String-SQL composition throughout: every select ships to the JVM
    # as one selectExpr round trip instead of per-Column py4j chatter
    # (the plan-construction latency path; same collapse as
    # range_functions._extrapolated).
    msig = _msig_sql(vm)
    many = many_df.selectExpr("*", msig + " AS msig")
    one = one_df.selectExpr(
        msig + " AS msig",
        "t",
        "value AS __ov",
        "labels AS __olabels",
        "drop_name AS __odrop",
        *(["hist AS __ohist"] if has_hist else []),
    )

    # Duplicate signatures on the "one" side must error, not dedupe.
    # A window count + raise_error stays JVM-side with no extra job; the
    # check column is folded into `value` so Catalyst can't prune it away.
    guard = "0.0D"
    if ctx.strict:
        side = "right" if one_is_rhs else "left"
        one = one.selectExpr(
            "*",
            "CASE WHEN count(1) OVER (PARTITION BY msig, t) > 1 THEN "
            "CAST(raise_error(concat("
            f"'found duplicate series for the match group on the {side} "
            "hand-side of the operation: ', msig)) AS DOUBLE) END AS __chk",
        )
        guard = "coalesce(__chk, 0.0D)"

    # fill modifiers (ast.go:329): missing-side substitution via outer
    # joins.  The reference swaps operands for group_right but not the
    # fill values, so fill_lhs always fills the "many" side and fill_rhs
    # the "one" side (fill-modifier.test:185-199).
    fill_many = node.fill_lhs
    fill_one = node.fill_rhs
    if fill_many is not None and fill_one is not None:
        how = "full_outer"
    elif fill_many is not None:
        how = "right_outer"  # keep unmatched "one" rows
    elif fill_one is not None:
        how = "left_outer"  # keep unmatched "many" rows
    else:
        how = "inner"
    joined = many.join(one, ["msig", "t"], how)
    if fill_one is not None:
        joined = joined.withColumn(
            "__ov", F.coalesce(F.col("__ov"), F.lit(float(fill_one)))
        )
    if fill_many is not None:
        # synthetic many-side sample: value = fill, labels = the match
        # labels of the present side (engine.go fill path: MatchLabels)
        on = vm.labels if vm.on else None
        ignoring = vm.labels if not vm.on else None
        match_labels = _match_labels_map(F.col("__olabels"), on, ignoring)
        joined = joined.withColumn(
            "labels", F.coalesce(F.col("labels"), match_labels)
        ).withColumn("value", F.coalesce(F.col("value"), F.lit(float(fill_many))))

    if ctx.strict and card == MatchCardinality.ONE_TO_ONE:
        # after a unique-rhs join, >1 row per (msig, t) ⇒ duplicate lhs
        joined = joined.selectExpr(
            "*",
            "CASE WHEN count(1) OVER (PARTITION BY msig, t) > 1 THEN "
            "CAST(raise_error('multiple matches for labels: many-to-one "
            "matching must be explicit (group_left/group_right)') "
            "AS DOUBLE) END AS __chk2",
        )
        guard = f"({guard} + coalesce(__chk2, 0.0D))"

    # restore operand positions: 'many' holds lhs for group_left, rhs for group_right
    l_val = "value" if one_is_rhs else "__ov"
    r_val = "__ov" if one_is_rhs else "value"

    # histogram operands: == / != compare the full histogram structs;
    # other comparisons and float arithmetic drop histogram rows (the
    # reference annotates and skips them)
    l_hist = ("hist" if one_is_rhs else "__ohist") if has_hist else "NULL"
    r_hist = ("__ohist" if one_is_rhs else "hist") if has_hist else "NULL"
    both_float = f"({l_val} IS NOT NULL AND {r_val} IS NOT NULL)"
    both_hist = (
        f"({l_hist} IS NOT NULL AND {r_hist} IS NOT NULL)" if has_hist else "false"
    )

    if node.op in COMPARISON_OPS:
        labels = _result_labels_sql(vm)
        flag = "true" if node.return_bool else "drop_name"
        pred_f = compare_sql(node.op, l_val, r_val)
        if has_hist and node.op in ("==", "!="):
            pred_h = (
                f"({l_hist} = {r_hist})"
                if node.op == "=="
                else f"(NOT ({l_hist} = {r_hist}))"
            )
            supported = f"({both_float} OR {both_hist})"
            pred = (
                f"(CASE WHEN {both_hist} THEN {pred_h} "
                f"ELSE {both_float} AND {pred_f} END)"
            )
        else:
            supported = both_float
            pred = f"({both_float} AND {pred_f})"
        if node.return_bool:
            joined = joined.filter(f"{supported} OR ({guard}) != 0.0D")
            value = f"(CASE WHEN {pred} THEN 1.0D ELSE 0.0D END + {guard})"
        else:
            joined = joined.filter(f"({supported} AND {pred}) OR ({guard}) != 0.0D")
            value = f"({l_val} + {guard})"  # filter keeps the lhs sample
    elif node.op in ("</", ">/"):
        # hist-left × float-right trims; every other combination drops.
        # Trims keep __name__ (changesMetricSchema engine.go:4437).
        labels_c = F.expr(_result_labels_sql(vm))
        if not has_hist:
            return VectorFrame(
                joined.filter(F.lit(False)).select(
                    sig_expr(labels_c).alias("sig"), labels_c.alias("labels"),
                    "t", F.col("t").alias("sample_t"),
                    F.lit(None).cast("double").alias("value"),
                    F.lit(False).alias("drop_name"),
                )
            )
        from prometheus_spark.engine import hist_arith

        src = joined.filter(
            f"{l_hist} IS NOT NULL AND {r_val} IS NOT NULL AND ({guard}) = 0.0D"
        ).selectExpr(
            _result_labels_sql(vm) + " AS labels",
            "t",
            f"{l_hist} AS hist",
            f"{r_val} AS __s",
        )
        return VectorFrame(
            hist_arith.trim_scalar(ctx, src, is_upper=node.op == "</")
        )
    else:
        labels = _result_labels_sql(vm)
        flag = "true"
        if has_hist and node.op in ("+", "-", "*", "/"):
            return _arith_with_hist(
                ctx, node, joined, F.expr(labels), F.expr(guard),
                F.expr(l_val), F.expr(r_val), F.expr(l_hist), F.expr(r_hist),
                F.expr(both_float), F.expr(both_hist),
            )
        joined = joined.filter(f"{both_float} OR ({guard}) != 0.0D")
        value = (
            f"(CAST({arith_sql(node.op, l_val, r_val)} AS DOUBLE) + {guard})"
        )

    hist_out = []
    if has_hist and node.op in COMPARISON_OPS and not node.return_bool:
        # filtering comparisons return the lhs sample, histogram included
        hist_out = [("hist" if one_is_rhs else "__ohist") + " AS hist"]

    from prometheus_spark.model.labels import sig_sql

    out = joined.selectExpr(
        sig_sql(labels) + " AS sig",
        labels + " AS labels",
        "t",
        "t AS sample_t",
        value + " AS value",
        flag + " AS drop_name",
        *hist_out,
    )
    return VectorFrame(out)


def _arith_with_hist(
    ctx: EvalContext,
    node: BinaryExpr,
    joined: DataFrame,
    labels: Column,
    guard: Column,
    l_val: Column,
    r_val: Column,
    l_hist: Column,
    r_hist: Column,
    both_float: Column,
    both_hist: Column,
) -> VectorFrame:
    """Vector arithmetic with histogram operands (vectorElemBinop mixed
    cases): float∘float JVM; hist×float / hist÷float scale JVM-side;
    hist±hist runs the span-merge algebra in Python; every other mix is
    dropped (the reference annotates and skips)."""
    from prometheus_spark.engine import hist_arith
    from prometheus_spark.model.schema import HISTOGRAM_TYPE

    base = joined.select(
        labels.alias("__rlabels"),
        "t",
        l_val.alias("__lv"),
        r_val.alias("__rv"),
        l_hist.alias("__lh"),
        r_hist.alias("__rh"),
        guard.alias("__g"),
    )
    bf = F.col("__lv").isNotNull() & F.col("__rv").isNotNull()
    out_cols = lambda value, hist: [
        sig_expr(F.col("__rlabels")).alias("sig"),
        F.col("__rlabels").alias("labels"),
        F.col("t"),
        F.col("t").alias("sample_t"),
        value.cast("double").alias("value"),
        F.lit(True).alias("drop_name"),
        hist.alias("hist"),
    ]
    null_hist = F.lit(None).cast(HISTOGRAM_TYPE)
    parts = [
        base.filter(bf | (F.col("__g") != 0.0)).select(
            *out_cols(
                arith_expr(node.op, F.col("__lv"), F.col("__rv")) + F.col("__g"),
                null_hist,
            )
        )
    ]
    null_val = F.lit(None).cast("double")
    if node.op in ("*", "/"):
        lh_scale = base.filter(
            F.col("__lh").isNotNull() & F.col("__rv").isNotNull()
        ).select(
            *out_cols(
                null_val,
                scale_hist_expr(F.col("__lh"), F.col("__rv"), is_div=node.op == "/"),
            )
        )
        parts.append(lh_scale)
        if node.op == "*":
            parts.append(
                base.filter(
                    F.col("__rh").isNotNull() & F.col("__lv").isNotNull()
                ).select(
                    *out_cols(
                        null_val,
                        scale_hist_expr(F.col("__rh"), F.col("__lv"), is_div=False),
                    )
                )
            )
    else:  # + / -
        pairs = base.filter(
            F.col("__lh").isNotNull()
            & F.col("__rh").isNotNull()
            # reference __g so the duplicate-series guard still evaluates
            & (F.col("__g") == 0.0)
        ).select(F.col("__rlabels").alias("labels"), "t", "__lh", "__rh")
        parts.append(
            hist_arith.binop_add_sub(ctx, pairs, sub=node.op == "-")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return VectorFrame(out)


def _result_labels_expr(vm: VectorMatching, drop_name: bool) -> Column:
    """Result label set (engine.go:3359 ``resultMetric``): start from the
    "many" side's labels; drop ``__name__`` when the op changes schema or
    ``bool`` is set; apply on(keep)/ignoring(del) **only for one-to-one**;
    ``include`` labels are copied from the "one" side — empty value there
    deletes the label."""
    # delayed name removal: metadata labels stay in the map; the caller
    # carries the drop flag and finalization strips them
    base = F.col("labels")
    if vm.card == MatchCardinality.ONE_TO_ONE:
        if vm.on:
            keys = (
                F.array(*[F.lit(k) for k in vm.labels])
                if vm.labels
                else F.array().cast("array<string>")
            )
            base = F.map_filter(base, lambda k, _: F.array_contains(keys, k))
        elif vm.labels:
            keys = F.array(*[F.lit(k) for k in vm.labels])
            base = F.map_filter(base, lambda k, _: ~F.array_contains(keys, k))
    if vm.include:
        inc = F.array(*[F.lit(k) for k in vm.include])
        one_inc = F.map_filter(
            F.col("__olabels"), lambda k, v: F.array_contains(inc, k) & (v != F.lit(""))
        )
        base_rest = F.map_filter(base, lambda k, _: ~F.array_contains(inc, k))
        return F.map_concat(base_rest, one_inc)
    return base
