"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k — a single scan with a JVM-side
``zip_with`` dot product and a ``row_number`` cut (or global top-k via
``orderBy().limit()`` which Spark executes as per-partition heaps + a
final merge — no full sort at scale).

Scale path: random-hyperplane LSH bucketing (probe the query's bucket and
its single-bit-flip neighbors), turning the scan into a bucket-pruned
lookup.  An IVF variant would pre-cluster with k-means; the LSH form is
deterministic and needs no training pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_const(vec_col: Column, q: Sequence[float]) -> Column:
    coeffs = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, coeffs, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x)
    )


def cosine_topk_bruteforce(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``.  ``orderBy.limit``
    compiles to TakeOrderedAndProject — per-partition heaps, no shuffle of
    the full table."""
    import math

    qn = math.sqrt(sum(float(x) * x for x in query))
    cos = _dot_const(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_bucketed_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 12,
    seed: int = 7,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: random-hyperplane signature buckets; candidates =
    query's bucket ∪ all single-bit-flip buckets (multiprobe), then exact
    cosine rank.  Recall < 1 by construction; 100× less data scanned once
    the bucket column is materialized + partitioned on."""
    import numpy as np

    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return df.sparkSession.createDataFrame([], f"{id_col} long, cosine double")
    dim = first["d"]
    rng = np.random.RandomState(seed)
    hyper = rng.standard_normal((planes, dim))

    def bucket_expr(vec: Column) -> Column:
        out = F.lit(0)
        for p in range(planes):
            coeffs = F.array(*[F.lit(float(c)) for c in hyper[p]])
            dot = F.aggregate(
                F.zip_with(vec, coeffs, lambda x, c: x.cast("double") * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            out = out + F.when(dot >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
        return out

    qv = np.asarray(list(query), dtype=float)
    qbucket = 0
    for p in range(planes):
        if float(hyper[p] @ qv) >= 0:
            qbucket |= 1 << p
    probes = [qbucket] + ([qbucket ^ (1 << p) for p in range(planes)] if multiprobe else [])

    candidates = df.withColumn("__bucket", bucket_expr(F.col(vec_col))).filter(
        F.col("__bucket").isin(probes)
    )
    return cosine_topk_bruteforce(candidates, query, k, vec_col, id_col)
