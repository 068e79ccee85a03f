"""Fill-modifier binops on the split frame contract (round 12).

The fill shapes used to fall back to the legacy inline-labels plan; they
now run `_vector_vector_split` with an outer join, with fill-synthesized
rows taking their labelset from a per-SERIES map on the one side's dim.
These tests pin (a) that the legacy path is no longer invoked for fill
shapes and (b) hand-computed values for all three outer-join variants,
including the synthesized-labels (fill_left / full-outer) rows.  The
full semantics stay pinned by the promqltest corpus (fill-modifier.test,
46 evals).
"""

import pytest

from prometheus_spark.engine import PromQLEngine
from prometheus_spark.storage import samples_from_rows


@pytest.fixture(scope="module")
def fill_engine(spark):
    rows = []
    for name, k, val in [
        ("left_vector", "1", 10.0),
        ("left_vector", "2", 20.0),
        ("right_vector", "1", 1.0),
        ("right_vector", "3", 3.0),
    ]:
        rows.append(({"__name__": name, "k": k}, 0, val))
    # hist-free frame: histogram-arith shapes (hist column + - * /) keep
    # the legacy path by design; the split fill path is the float one
    samples = samples_from_rows(spark, rows).drop("hist").cache()
    return PromQLEngine(spark, samples)


@pytest.fixture(autouse=True)
def _no_legacy(monkeypatch):
    from prometheus_spark.engine import binop

    def _boom(*a, **kw):  # pragma: no cover - fires only on regression
        raise AssertionError(
            "fill shape fell back to the legacy inline-labels binop path"
        )

    monkeypatch.setattr(binop, "_vector_vector_legacy", _boom)
    yield


def _q(engine, query, t=0):
    df = engine.instant_query(query, t)
    return {
        tuple(sorted(dict(r["labels"]).items())): r["value"] for r in df.collect()
    }


def test_fill_both_sides_full_outer(fill_engine):
    r = _q(fill_engine, "left_vector + fill(0) right_vector")
    assert r == {
        (("k", "1"),): 11.0,  # matched
        (("k", "2"),): 20.0,  # right filled with 0
        (("k", "3"),): 3.0,  # left synthesized: labels from right's match set
    }


def test_fill_right_keeps_unmatched_left(fill_engine):
    r = _q(fill_engine, "left_vector + fill_right(0) right_vector")
    assert r == {(("k", "1"),): 11.0, (("k", "2"),): 20.0}


def test_fill_left_synthesizes_from_right(fill_engine):
    r = _q(fill_engine, "left_vector + fill_left(5) right_vector")
    assert r == {(("k", "1"),): 11.0, (("k", "3"),): 8.0}


def test_fill_with_on_matching(fill_engine):
    # on(k): match labels are just {k}; synthesized rows carry only k
    r = _q(fill_engine, "left_vector + on(k) fill_left(0) right_vector")
    assert r == {(("k", "1"),): 11.0, (("k", "3"),): 3.0}
