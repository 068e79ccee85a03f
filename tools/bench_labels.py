"""BENCH_LABELS: the split frame contract at fleet-typical label width.

Synthetic storage: N_SERIES series × N_LABELS labels/series (default
2,000 × 24 — k8s-style cardinality) × N_SAMPLES samples at 15 s
resolution, run through the ENGINE on four representative shapes:
selector materialization, rate, grouped sum-of-rate, and a binop.
Everything is measured through PromQLEngine.range_query + a noop write
(full results incl. labels), so both frame contracts do end-to-end work.

Usage: python tools/bench_labels.py [repo_root]
(pass a second checkout, e.g. a pre-split worktree, to A/B contracts).
Prints one JSON line; writes BENCH_LABELS.json when run from the repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, ROOT)

N_SERIES = int(os.environ.get("BENCH_LABELS_SERIES", "1500"))
N_LABELS = int(os.environ.get("BENCH_LABELS_WIDTH", "24"))
N_SAMPLES = int(os.environ.get("BENCH_LABELS_SAMPLES", "1200"))
STEPS = int(os.environ.get("BENCH_LABELS_STEPS", "300"))
INTERVAL_MS = 15_000

QUERIES = [
    ("selector", "wide_metric"),
    ("rate", "rate(wide_metric[1m])"),
    ("sum_rate_by", "sum by (label_name_0, label_name_1) (rate(wide_metric[1m]))"),
    ("binop", "wide_metric - wide_other"),
]


def build(spark):
    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import sig_sql

    def series(name: str):
        return spark.range(N_SERIES).select(
            F.lit(name).alias("name"),
            F.map_from_arrays(
                F.array(
                    F.lit("__name__"),
                    *[F.lit(f"label_name_{i}") for i in range(N_LABELS)],
                ),
                F.array(
                    F.lit(name),
                    *[
                        F.concat(
                            F.lit(f"value_{i}_"),
                            (F.col("id") % (7 + i)).cast("string"),
                        )
                        for i in range(N_LABELS - 1)
                    ]
                    + [F.col("id").cast("string")],
                ),
            ).alias("labels"),
            F.col("id").alias("s"),
        )

    frames = []
    for name in ("wide_metric", "wide_other"):
        sd = series(name).withColumn("sig", F.expr(sig_sql("labels")))
        frames.append(
            sd.crossJoin(
                spark.range(N_SAMPLES).select(
                    (F.col("id") * INTERVAL_MS).alias("t")
                )
            ).select(
                "sig", "name", "labels", "t",
                (F.col("s") + F.col("t") / 1000.0).cast("double").alias("value"),
                F.lit(False).alias("stale"),
            )
        )
    df = frames[0].unionByName(frames[1])
    return df.repartition(64, "sig").localCheckpoint()


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench_labels")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", os.environ.get("PROMSPARK_AQE_MINPART", "256k"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.buffer.pageSize", "1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prometheus_spark.engine import PromQLEngine

    samples = build(spark)
    n = samples.count()
    eng = PromQLEngine(spark, samples)
    end = (N_SAMPLES - 1) * INTERVAL_MS
    start = end - (STEPS - 1) * INTERVAL_MS
    # warm-up
    eng.range_query("sum(rate(wide_metric[1m]))", start, end, INTERVAL_MS).count()

    results = {}
    for key, q in QUERIES:
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            eng.range_query(q, start, end, INTERVAL_MS).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[key] = round(best, 3)

    out = {
        "metric": "wide_labels_total_sec",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "series": N_SERIES,
        "labels_per_series": N_LABELS,
        "samples": n,
        "steps": STEPS,
        "root": ROOT,
        "loadavg": round(os.getloadavg()[0], 1),
    }
    print(json.dumps(out))
    if len(sys.argv) <= 1:
        with open(os.path.join(ROOT, "BENCH_LABELS.json"), "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
