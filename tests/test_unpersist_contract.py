"""Deterministic release of operator-persisted intermediates.

The dedup candidate generators persist mid-pipeline frames the returned
DataFrame still references; `release_intermediates()` is the caller-side
contract for dropping those blocks once results are consumed (bench.py
calls it after every query).  These tests pin the contract with the
JVM's own persistent-RDD registry: after release, no blocks pinned by
the operator remain.
"""

from __future__ import annotations

import pytest

from prometheus_spark.pipeline import dedup
from prometheus_spark.pipeline.similarity import AnnIndex


def _persistent_ids(spark) -> set:
    # track IDs, not counts: the suite's shared session unpersists other
    # frames asynchronously (ContextCleaner, engine series dims), so a
    # global count is racy — what matters is that THESE blocks are gone
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"the quick brown fox {i % 7} jumps over the lazy dog {i % 3} again and again")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_release(spark, docs):
    base = _persistent_ids(spark)
    out = dedup.minhash_dup_candidates_portable(docs, star_threshold=8)
    out.count()  # materializes the tracked band-bucket intermediate
    new = _persistent_ids(spark) - base
    assert new
    released = dedup.release_intermediates()
    assert released >= 1
    assert not (new & _persistent_ids(spark))
    # idempotent: nothing tracked twice
    assert dedup.release_intermediates() == 0


def test_ngram_jaccard_release(spark, docs):
    base = _persistent_ids(spark)
    dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.3).count()
    new = _persistent_ids(spark) - base
    assert new
    assert dedup.release_intermediates() >= 1
    assert not (new & _persistent_ids(spark))


def test_released_frame_recomputes(spark, docs):
    # persisted (not checkpointed) intermediates keep lineage: consuming
    # the result AFTER release must recompute, not fail
    out = dedup.minhash_dup_candidates_portable(docs, star_threshold=8)
    n1 = out.count()
    dedup.release_intermediates()
    assert out.count() == n1


def test_ann_index_unpersist(spark):
    rows = [(i, [float((i * j) % 5 - 2) for j in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "id long, emb array<float>")
    base = _persistent_ids(spark)
    idx = AnnIndex.build(emb, vec_col="emb", id_col="id", planes=4)
    idx.df.count()
    new = _persistent_ids(spark) - base
    assert new
    idx.unpersist()
    assert not (new & _persistent_ids(spark))
