"""Native-histogram functions over vector frames carrying a ``hist``
column (reference: promql/functions.go:2061-2243, math in
promql/quantile.go).

``histogram_count``/``sum``/``avg`` are plain struct reads (codegen'd);
the bucket-walking functions (stddev/stdvar/quantile/fraction) run the
pure-Python histogram model inside a ``mapInPandas`` batch — the walk is
sequential per sample, the batches are Arrow-vectorized, and histogram
samples are a tiny fraction of any real workload.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prometheus_spark.engine.context import EvalContext
from prometheus_spark.engine.values import VectorFrame
from prometheus_spark.model.labels import drop_name_expr, sig_expr

HIST_ACCESSORS = frozenset(
    {
        "histogram_count",
        "histogram_sum",
        "histogram_avg",
        "histogram_stddev",
        "histogram_stdvar",
    }
)


def _hist_rows(vf: VectorFrame) -> DataFrame:
    if "hist" not in vf.fact.columns:
        return vf.fact.filter(F.lit(False)).withColumn(
            "hist", F.lit(None).cast("string")
        )  # schema-compatible empty; callers only use when hist exists
    return vf.fact.filter(F.col("hist").isNotNull())


def _project(df: DataFrame, value) -> DataFrame:
    # delayed name removal: labels stay (on the dim), row is flagged
    return df.select(
        "sig",
        "t",
        F.col("t").alias("sample_t"),
        value.cast("double").alias("value"),
        F.lit(True).alias("drop_name"),
    )


def eval_hist_accessor(ctx: EvalContext, fn: str, vf: VectorFrame) -> VectorFrame:
    """histogram_count/sum/avg: struct reads; stddev/stdvar: bucket walk."""
    if "hist" not in vf.fact.columns:
        return VectorFrame(
            fact=vf.fact.filter(F.lit(False)).select(
                "sig", "t", "sample_t", "value", "drop_name"
            ),
            dim=vf.dim,
        )
    df = _hist_rows(vf)
    h = F.col("hist")
    if fn == "histogram_count":
        return VectorFrame(fact=_project(df, h["count"]), dim=vf.dim)
    if fn == "histogram_sum":
        return VectorFrame(fact=_project(df, h["sum"]), dim=vf.dim)
    if fn == "histogram_avg":
        # ANSI mode errors on /0 — empty histograms must yield IEEE NaN/Inf
        avg = F.when(
            h["count"] == 0.0,
            F.when(
                F.isnan(h["sum"]) | (h["sum"] == 0.0), F.lit(float("nan"))
            ).otherwise(
                F.when(h["sum"] > 0, F.lit(float("inf"))).otherwise(F.lit(float("-inf")))
            ),
        ).otherwise(h["sum"] / h["count"])
        return VectorFrame(fact=_project(df, avg), dim=vf.dim)
    # stddev / stdvar — bucket geometry walk
    return VectorFrame(fact=_hist_python_fn(ctx, df, fn), dim=vf.dim)


_UDF_SCHEMA = T.StructType(
    [
        T.StructField("sig", T.StringType()),
        T.StructField("t", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _hist_python_fn(ctx: EvalContext, df: DataFrame, fn: str, args: tuple = ()) -> DataFrame:
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(ctx.spark)
    # split contract: the walk never changes the labelset, so only the
    # sig key rides the Arrow batch (the old shape shipped label arrays
    # through Python and re-hashed the sig per row on the way out)
    src = df.select("sig", "t", "hist")

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        from prometheus_spark.model.histogram import from_row

        for pdf in it:
            sigs, ts, vals = [], [], []
            for row in pdf.itertuples(index=False):
                hd = row.hist
                if hd is None:
                    continue
                fh = from_row(hd)
                if fn == "histogram_stddev":
                    v = math.sqrt(fh.stdvar())
                elif fn == "histogram_stdvar":
                    v = fh.stdvar()
                elif fn == "histogram_quantile":
                    v = fh.quantile(args[0])
                elif fn == "histogram_fraction":
                    v = fh.fraction(args[0], args[1])
                else:
                    raise ValueError(fn)
                sigs.append(row.sig)
                ts.append(row.t)
                vals.append(v)
            yield pd.DataFrame(
                {
                    "sig": pd.Series(sigs, dtype=object),
                    "t": pd.Series(ts, dtype="int64"),
                    "value": pd.Series(vals, dtype="float64"),
                }
            )

    parsed = src.mapInPandas(batches, _UDF_SCHEMA)
    # pandas→Arrow folds NaN into null; this UDF never emits legit nulls,
    # so coalesce restores IEEE NaN
    return parsed.select(
        "sig",
        "t",
        F.col("t").alias("sample_t"),
        F.coalesce(F.col("value"), F.lit(float("nan"))).alias("value"),
        F.lit(True).alias("drop_name"),
    )


def eval_hist_quantile_native(ctx: EvalContext, q: float, vf: VectorFrame) -> DataFrame:
    return _hist_python_fn(ctx, _hist_rows(vf), "histogram_quantile", (q,))


def eval_hist_fraction_native(
    ctx: EvalContext, lower: float, upper: float, vf: VectorFrame
) -> DataFrame:
    return _hist_python_fn(ctx, _hist_rows(vf), "histogram_fraction", (lower, upper))
