"""Function signature registry.

Mirrors the reference registry (promql/parser/functions.go:27-509): name,
argument types, variadic arity, return type.  Evaluation lives in
``prometheus_spark.engine``; this module is parse/type-check only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from prometheus_spark.parser.ast import ValueType

S = ValueType.SCALAR
V = ValueType.VECTOR
M = ValueType.MATRIX
STR = ValueType.STRING


@dataclass(frozen=True)
class FunctionSig:
    name: str
    arg_types: tuple
    return_type: ValueType = V
    # number of trailing optional args; -1 = last arg repeats unbounded
    variadic: int = 0


def _f(name, args=(V,), ret=V, variadic=0):
    return FunctionSig(name, tuple(args), ret, variadic)


FUNCTIONS: dict[str, FunctionSig] = {
    f.name: f
    for f in [
        # simple math V→V (reference: promql/functions.go:1761-1890)
        _f("abs"), _f("ceil"), _f("floor"), _f("exp"), _f("sqrt"),
        _f("ln"), _f("log2"), _f("log10"), _f("sgn"),
        _f("sin"), _f("cos"), _f("tan"), _f("asin"), _f("acos"), _f("atan"),
        _f("sinh"), _f("cosh"), _f("tanh"), _f("asinh"), _f("acosh"), _f("atanh"),
        _f("deg"), _f("rad"),
        _f("pi", (), S),
        _f("round", (V, S), variadic=1),
        _f("min_of", (S, S), S), _f("max_of", (S, S), S),
        _f("clamp", (V, S, S)),
        _f("clamp_max", (V, S)),
        _f("clamp_min", (V, S)),
        # date/time — arg defaults to vector(time()) (functions.go:2602-2651)
        _f("minute", (V,), variadic=1), _f("hour", (V,), variadic=1),
        _f("day_of_week", (V,), variadic=1), _f("day_of_month", (V,), variadic=1),
        _f("day_of_year", (V,), variadic=1), _f("days_in_month", (V,), variadic=1),
        _f("month", (V,), variadic=1), _f("year", (V,), variadic=1),
        _f("time", (), S),
        _f("timestamp", (V,)),
        # experimental start-timestamp accessor (functions.go:1920)
        _f("start_timestamp", (V,)),
        # rate / counter family M→V (functions.go:452-620, 806-1020)
        _f("rate", (M,)), _f("increase", (M,)), _f("delta", (M,)),
        _f("idelta", (M,)), _f("irate", (M,)),
        _f("resets", (M,)), _f("changes", (M,)),
        _f("deriv", (M,)), _f("predict_linear", (M, S)),
        _f("double_exponential_smoothing", (M, S, S)),
        # *_over_time M→V (functions.go:1218-1738)
        _f("avg_over_time", (M,)), _f("sum_over_time", (M,)),
        _f("count_over_time", (M,)), _f("min_over_time", (M,)),
        _f("max_over_time", (M,)), _f("first_over_time", (M,)),
        _f("last_over_time", (M,)), _f("quantile_over_time", (S, M)),
        _f("stddev_over_time", (M,)), _f("stdvar_over_time", (M,)),
        _f("mad_over_time", (M,)),
        _f("present_over_time", (M,)), _f("absent_over_time", (M,)),
        _f("ts_of_first_over_time", (M,)), _f("ts_of_last_over_time", (M,)),
        _f("ts_of_max_over_time", (M,)), _f("ts_of_min_over_time", (M,)),
        # existence
        _f("absent", (V,)),
        # label manipulation (functions.go:2483, 2532)
        _f("label_replace", (V, STR, STR, STR, STR)),
        _f("label_join", (V, STR, STR, STR), variadic=-1),
        # sorting (functions.go:1046-1090)
        _f("sort", (V,)), _f("sort_desc", (V,)),
        _f("sort_by_label", (V, STR), variadic=-1),
        _f("sort_by_label_desc", (V, STR), variadic=-1),
        # conversion
        _f("scalar", (V,), S), _f("vector", (S,)),
        # histogram accessors (functions.go:2061-2243)
        _f("histogram_count", (V,)), _f("histogram_sum", (V,)),
        _f("histogram_avg", (V,)),
        _f("histogram_stddev", (V,)), _f("histogram_stdvar", (V,)),
        _f("histogram_fraction", (S, S, V)),
        _f("histogram_quantile", (S, V)),
        _f("histogram_quantiles", (V, STR, S), variadic=-1),
        # enrichment join (promql/info.go:39)
        _f("info", (V, V), variadic=1),
        # query-context functions — folded to constants at plan time
        # (engine.go:4469 foldQueryContextFunctions)
        _f("start", (), S), _f("end", (), S),
        _f("step", (), S), _f("range", (), S),
    ]
}
