"""Block compaction and retention over the partitioned samples layout.

The reference compacts 2h head blocks into exponentially larger ones
(tsdb/compact.go:40 ``ExponentialBlockRanges``, plan at
``compact.go:285`` — pick contiguous runs of blocks that fill a parent
range) and enforces time retention by dropping whole expired blocks
(tsdb/db.go ``beyondTimeRetention``).

Our blocks are ``t_bucket=K`` parquet partition directories
(storage/samples.py:120 ``write_samples``).  Compaction rewrites a set
of small buckets as one larger bucket — fewer, bigger files and row
groups (the small-files problem is the Spark analog of the reference's
per-block index overhead); retention is a partition-directory drop, no
data rewrite, exactly like the reference deleting block dirs.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_BLOCK_MS = 7_200_000  # 2h, tsdb/db.go:55 DefaultBlockDuration


def exponential_block_ranges(
    min_size_ms: int = DEFAULT_BLOCK_MS, steps: int = 3, step_size: int = 5
) -> list[int]:
    """tsdb/compact.go:41: [min, min*s, min*s², ...] — default 2h/10h/50h
    (the reference uses steps=3, stepSize=5 via DefaultOptions)."""
    out = []
    cur = min_size_ms
    for _ in range(steps):
        out.append(cur)
        cur *= step_size
    return out


def list_buckets(path: str) -> list[int]:
    """Bucket ids present in a partitioned samples directory."""
    out = []
    for name in os.listdir(path):
        m = re.fullmatch(r"t_bucket=(-?\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def plan_compaction(
    bucket_ids: list[int],
    bucket_ms: int = DEFAULT_BLOCK_MS,
    ranges: list[int] | None = None,
) -> list[list[int]]:
    """Groups of bucket ids to merge, smallest parent range first
    (compact.go:341 ``selectDirs``/``splitByRange`` simplified: a group
    is ≥2 buckets that fall inside one aligned parent window)."""
    ranges = ranges or exponential_block_ranges(bucket_ms)[1:]
    ids = sorted(bucket_ids)
    for parent_ms in ranges:
        per = parent_ms // bucket_ms
        groups: dict[int, list[int]] = {}
        for b in ids:
            # Go truncates toward zero; mirror floor-div for negatives
            groups.setdefault(b // per, []).append(b)
        plans = [g for g in groups.values() if len(g) >= 2]
        if plans:
            return sorted(plans)
    return []


def compact(
    spark: SparkSession,
    path: str,
    bucket_ids: list[int],
    bucket_ms: int = DEFAULT_BLOCK_MS,
    target_ms: int | None = None,
) -> None:
    """Rewrite the given source buckets as one merged block.

    The merged rows keep their ``t_bucket`` recomputed at ``target_ms``
    granularity scaled back to the base grid (partition keys stay
    comparable), written sorted by (sig, t) within partitions — the same
    contract as ``write_samples``.  Source partition dirs are replaced
    atomically-enough for a single-writer layout (the reference likewise
    assumes one compactor).
    """
    if not bucket_ids:
        return
    target_ms = target_ms or (bucket_ms * len(bucket_ids))
    src = (
        spark.read.option("basePath", path)
        .parquet(*[os.path.join(path, f"t_bucket={b}") for b in bucket_ids])
        .drop("t_bucket")
    )
    # the merged block is named by its true start bucket (the reference's
    # block meta carries the real minTime, not the aligned window start)
    parent = min(bucket_ids)
    tmp = os.path.join(path, f"_compact_tmp_{parent}")
    (
        src.repartition("name")
        .sortWithinPartitions("sig", "t")
        .write.mode("overwrite")
        .partitionBy("name")
        .parquet(tmp)
    )
    for b in bucket_ids:
        shutil.rmtree(os.path.join(path, f"t_bucket={b}"), ignore_errors=True)
    os.rename(tmp, os.path.join(path, f"t_bucket={parent}"))


def compact_step(
    spark: SparkSession, path: str, bucket_ms: int = DEFAULT_BLOCK_MS
) -> int:
    """One planning+execution round (Compactor.Plan + Compact); returns
    the number of groups merged (0 = nothing left to do)."""
    plans = plan_compaction(list_buckets(path), bucket_ms)
    for group in plans:
        compact(spark, path, group, bucket_ms)
    return len(plans)


def apply_retention(
    spark: SparkSession,
    path: str,
    retention_ms: int,
    now_ms: int,
    bucket_ms: int = DEFAULT_BLOCK_MS,
) -> list[int]:
    """Drop whole buckets whose newest sample is older than the
    retention horizon (tsdb/db.go beyondTimeRetention — blocks are
    dropped, never trimmed).  Returns the dropped bucket ids.

    The bucket id only bounds a block's *oldest* data (a compacted block
    spans several base buckets), so candidates selected by name are
    confirmed against the block's real max(t) — a parquet-footer-stats
    aggregate, no row scan with aggregate pushdown enabled."""
    cutoff = now_ms - retention_ms
    dropped = []
    for b in list_buckets(path):
        if (b + 1) * bucket_ms > cutoff:
            continue  # even the uncompacted span is inside retention
        bdir = os.path.join(path, f"t_bucket={b}")
        maxt = spark.read.parquet(bdir).agg(F.max("t")).first()[0]
        if maxt is None or maxt < cutoff:
            shutil.rmtree(bdir, ignore_errors=True)
            dropped.append(b)
    return dropped
