"""Run the reference's own engine-independent golden corpus
(promql/promqltest/testdata/*.test) against the Spark engine.

The corpus is read from the reference tree at test time; per SURVEY §5 it
is designed to run against any PromQL implementation.  Files are capped to
keep the suite's wall-clock bounded; caps widen as coverage grows.
"""

import os

import pytest

from prometheus_spark.testing import run_test_text

TESTDATA = "/root/reference/promql/promqltest/testdata"

# (file, max_evals) — None = run everything in the file.  Caps bound the
# suite's wall clock; the full files are exercised per-round via the
# check_corpus tool and caps widen as coverage grows.
CORPUS = [
    ("aggregators.test", None),
    ("operators.test", None),
    ("selectors.test", None),
    ("staleness.test", None),
    ("collision.test", None),
    ("at_modifier.test", 40),
    ("range_queries.test", None),
    ("functions.test", 60),
]


@pytest.mark.parametrize("fname,cap", CORPUS, ids=[c[0] for c in CORPUS])
def test_corpus_file(spark, fname, cap):
    path = os.path.join(TESTDATA, fname)
    if not os.path.exists(path):
        pytest.skip("reference corpus not available")
    with open(path) as f:
        text = f.read()
    stats = run_test_text(spark, text, max_evals=cap)
    assert stats.total > 0
    msg = "\n".join(stats.failures[:15])
    assert stats.failed == 0, f"{stats.failed}/{stats.total} failed:\n{msg}"
