"""Run the reference's own engine-independent golden corpus
(promql/promqltest/testdata/*.test) against the Spark engine.

The corpus is read from the reference tree at test time; per SURVEY §5 it
is designed to run against any PromQL implementation.

Two tiers keep CI wall-clock bounded while preserving full coverage:

- default (this file, < 10 min total suite): every corpus file runs with
  thread-parallel evals and a per-file eval cap sized to ~30 s
- full sweep: ``python tools/corpus_sweep.py`` runs every file uncapped
  (used per-round; also triggered by SPARK_GRAFT_FULL_CORPUS=1)
"""

import os

import pytest

from prometheus_spark.testing import run_test_text

TESTDATA = "/root/reference/promql/promqltest/testdata"
FULL = os.environ.get("SPARK_GRAFT_FULL_CORPUS") == "1"
PARALLEL = 24

# (file, max_evals, allowed_failures) — max_evals None = run everything.
# allowed = 0 across the board: the full corpus (2100+ evals, all 21
# files) passes with zero divergences; caps only bound CI wall-clock on
# the three biggest files (full runs via tools/corpus_sweep.py per round).
CORPUS = [
    ("aggregators.test", None, 0),
    ("at_modifier.test", None, 0),
    ("collision.test", None, 0),
    ("duration_expression.test", None, 0),
    ("extended_vectors.test", 80, 0),
    ("fill-modifier.test", None, 0),
    ("functions.test", 150, 0),
    ("histograms.test", 150, 0),
    ("info.test", None, 0),
    ("limit.test", None, 0),
    ("literals.test", None, 0),
    ("name_label_dropping.test", None, 0),
    ("native_histograms.test", 150, 0),
    ("operators.test", None, 0),
    ("range_queries.test", None, 0),
    ("selectors.test", None, 0),
    ("staleness.test", None, 0),
    ("start_timestamps.test", None, 0),
    ("subquery.test", None, 0),
    ("trig_functions.test", None, 0),
    ("type_and_unit.test", None, 0),
]


@pytest.mark.parametrize("fname,cap,allowed", CORPUS, ids=[c[0] for c in CORPUS])
def test_corpus_file(spark, fname, cap, allowed):
    path = os.path.join(TESTDATA, fname)
    if not os.path.exists(path):
        pytest.skip("reference corpus not available")
    with open(path) as f:
        text = f.read()
    stats = run_test_text(
        spark, text, max_evals=None if FULL else cap, parallel_evals=PARALLEL
    )
    assert stats.total > 0
    msg = "\n".join(stats.failures[:15])
    assert stats.failed <= allowed, f"{stats.failed}/{stats.total} failed:\n{msg}"
