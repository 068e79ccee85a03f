"""Extended-window (anchored/smoothed) rate family: Arrow fold parity.

Round 13 replaced the three-branch explode+union plan with a per-series
fold (range_functions.eval_extended_rate_fold).  These tests pin exact
(float-repr) equality between the two implementations on the shapes
where they can diverge: boundary interpolation, counter resets across
edges, lookback expiry, sparse series, offsets, NaN values, and windows
whose only contents are the two boundary rows.
"""

import os

import pytest

from prometheus_spark.engine import PromQLEngine
from prometheus_spark.model.labels import sig_sql
from prometheus_spark.storage import samples_from_rows


@pytest.fixture(scope="module")
def samples(spark):
    rows = []
    # dense counter with a reset
    vals = [0, 5, 12, 3, 9, 15, 22, 2, 8, 30]
    for i, v in enumerate(vals):
        rows.append(({"__name__": "ctr", "i": "0"}, i * 60_000, float(v)))
    # sparse series: gaps larger than the range
    for t, v in [(0, 1.0), (420_000, 7.0), (440_000, 9.0), (900_000, 2.0)]:
        rows.append(({"__name__": "sp", "i": "0"}, t, v))
    # NaN-carrying series
    for i, v in enumerate([1.0, float("nan"), 4.0, 2.0, float("nan"), 8.0]):
        rows.append(({"__name__": "nn", "i": "0"}, i * 90_000, v))
    # two-sample series (boundary-only windows)
    rows.append(({"__name__": "two", "i": "0"}, 30_000, 10.0))
    rows.append(({"__name__": "two", "i": "0"}, 600_000, 20.0))
    return samples_from_rows(spark, rows).cache()


QUERIES = [
    "rate(ctr[2m] smoothed)",
    "rate(ctr[2m] anchored)",
    "increase(ctr[3m] smoothed)",
    "delta(ctr[2m] smoothed)",
    "rate(ctr[2m] smoothed offset 1m)",
    "rate(sp[2m] smoothed)",
    "increase(sp[5m] anchored)",
    "rate(nn[3m] smoothed)",
    "delta(nn[2m] anchored)",
    "rate(two[4m] smoothed)",
    "increase(two[8m] smoothed)",
]


@pytest.mark.parametrize("query", QUERIES)
def test_fold_matches_explode(spark, samples, query):
    def run(impl):
        os.environ["PROMSPARK_EXT_IMPL"] = impl
        try:
            eng = PromQLEngine(spark, samples)
            df = eng.range_query(query, 0, 960_000, 30_000)
            return [
                (r["sig"], r["l"], r["t"], repr(r["value"]))
                for r in df.selectExpr(
                    "sig", sig_sql("labels") + " AS l", "t", "value"
                ).collect()
            ]
        finally:
            os.environ.pop("PROMSPARK_EXT_IMPL", None)

    assert run("fold") == run("explode")
