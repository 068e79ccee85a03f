"""ANN recall report: recall@k of the approximate paths vs brute force.

LSH (``lsh_bucketed_topk`` multiprobe) and IVF (``IvfIndex`` at several
``nprobe``) are recall<1 by construction; nothing else in the suite
measures how far below 1 they actually sit, so a silent recall collapse
(bad hyperplane/centroid interaction with real embeddings) would pass
every value-correctness test.  This script samples dataset vectors as
queries, computes exact brute-force top-k as ground truth, and reports
mean recall@k per configuration as ONE JSON line.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries]
(defaults: /root/testdata/sf0.1, k=10, 20 queries)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recall_report(spark, sf_dir: str, k: int = 10, n_queries: int = 20) -> dict:
    from prometheus_spark.pipeline.similarity import (
        IvfIndex,
        cosine_topk_bruteforce,
        lsh_bucketed_topk,
    )

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    # deterministic query sample: every (n/n_queries)-th vector by id
    ids = [r[0] for r in df.select("vec_id").orderBy("vec_id").collect()]
    step = max(1, len(ids) // n_queries)
    qids = ids[::step][:n_queries]
    queries = {
        r["vec_id"]: list(r["embedding"])
        for r in df.filter(df.vec_id.isin(qids)).collect()
    }

    ivf = IvfIndex.build(df, n_centroids=16)

    def topk_ids(frame):
        return [r[0] for r in frame.collect()]

    truth = {qid: topk_ids(cosine_topk_bruteforce(df, q, k)) for qid, q in queries.items()}

    def mean_recall(fn) -> float:
        total = 0.0
        for qid, q in queries.items():
            got = set(topk_ids(fn(q)))
            total += len(got & set(truth[qid])) / k
        return round(total / len(queries), 4)

    report = {
        "sf_dir": sf_dir,
        "k": k,
        "n_queries": len(queries),
        "n_vectors": df.count(),
        "lsh_multiprobe": mean_recall(
            lambda q: lsh_bucketed_topk(df, q, k, multiprobe=True)
        ),
        "lsh_singleprobe": mean_recall(
            lambda q: lsh_bucketed_topk(df, q, k, multiprobe=False)
        ),
    }
    for nprobe in (1, 4, 8):
        report[f"ivf_nprobe{nprobe}"] = mean_recall(
            lambda q, n=nprobe: ivf.topk(q, k, nprobe=n)
        )
    df.unpersist()
    return report


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("ann_recall")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(recall_report(spark, sf_dir, k, n_queries)))


if __name__ == "__main__":
    main()
