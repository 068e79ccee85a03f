"""SparkSession construction with the engine's recommended settings.

One place to encode what a 100 TB deployment needs set, so notebooks,
the CLI, and the HTTP server all run with the same posture.  Every
setting is a default — anything explicitly configured by the caller (or
an existing session) wins.

Why each default (the scale rationale the settings encode):

- ``spark.sql.session.timeZone=UTC`` — PromQL date functions are UTC by
  definition (reference promql/functions.go time family); required for
  correctness, not speed.
- AQE on + coalescePartitions + skewJoin — selector explodes and LSH
  band joins produce run-time-skewed partitions no static plan predicts;
  AQE re-splits hot buckets (the salting fallback) and merges tiny
  post-filter shuffles.
- ``spark.sql.shuffle.partitions`` ≈ 2-3× total executor cores — the
  engine's shuffles (series regroup, band joins) are keyed by
  high-cardinality strings; AQE coalesces the excess, while too few
  partitions cannot be split for free.
- ``spark.sql.files.maxPartitionBytes=256m`` — samples parquet rows are
  narrow (sig/name/t/value); 128m default yields too many tiny tasks at
  corpus scale against splittable ZSTD parquet.
- ``spark.sql.parquet.aggregatePushdown`` — count/min/max over the block
  store answer from parquet footers.
- Arrow enabled — every histogram grouped-map and ingest-parse UDF is
  Arrow-batched; row-at-a-time transfer is never acceptable here.
"""

from __future__ import annotations

from typing import Optional


RECOMMENDED = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "256m",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # Tungsten's page-size heuristic (heap / 2·cores·16, up to 64m)
    # targets one big shuffle per core.  A PromQL query stream is the
    # opposite shape: MANY small broadcast hash relations (the split
    # frame contract's dim joins), and every BytesToBytesMap pays one
    # full page up front — at the heuristic's 16m that is 16 MB of
    # long[] pinned per tiny dim broadcast, measured 5 GB live across
    # one forced-path corpus file (the round-11 GC storm's JVM half).
    # 1m caps the per-relation floor; large shuffles just chain pages.
    # The right value is WORKLOAD-shaped, not cluster-shaped: a stream
    # of concurrent queries (many live relations) wants the small
    # floor, a single wide batch scan (few relations, tens of millions
    # of rows through one shuffle per core) wants big pages — measured
    # ~1.5x on 27M-row shuffle suites at 64m vs 1m.  That split is the
    # ``workload`` parameter of :func:`build_session` ("service" → 1m,
    # "batch" → 64m); this dict IS the service persona.
    "spark.buffer.pageSize": "1m",
    # AQE coalescing sizes partitions by SHUFFLE BYTES (1m floor by
    # default), but engine operator stages are CPU-bound per row —
    # window chains over (sig, t) cost ~10 µs/row while compressing to
    # ~20 bytes/row, so a 20 MB shuffle carrying 10+ s of CPU gets
    # squeezed onto a third of the cores (measured: rate(x[1d])'s
    # window stage at 15/32 tasks).  A 256k floor keeps such stages at
    # the configured parallelism; genuinely tiny shuffles still merge.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
}


def page_size_for(workload: str) -> str:
    """Tungsten page size by workload shape (see the RECOMMENDED
    rationale): ``service`` = a stream of concurrent queries with many
    live broadcast relations (small floor wins, GC-safe), ``batch`` = a
    single wide scan/shuffle pipeline (big pages win ~1.5x on 27M-row
    shuffles).  One rule, both personas."""
    return {"service": "1m", "batch": "64m"}[workload]


def build_session(
    app_name: str = "prometheus_spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict] = None,
    workload: str = "service",
):
    """Build (or extend) a SparkSession with the engine defaults.

    ``shuffle_partitions`` defaults to 3x the declared parallelism on
    local masters; on a cluster leave it unset and size it to 2-3x the
    executor-core total (AQE coalesces down, never splits up).

    ``workload`` selects the Tungsten page-size persona
    (:func:`page_size_for`): ``"service"`` (default) for query-serving
    processes, ``"batch"`` for dedicated wide-shuffle pipeline runs.
    """
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    for k, v in RECOMMENDED.items():
        b = b.config(k, v)
    b = b.config("spark.buffer.pageSize", page_size_for(workload))
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, str(v))
    spark = b.getOrCreate()
    if shuffle_partitions is None and spark.sparkContext.master.startswith("local"):
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    return spark
