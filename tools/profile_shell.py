"""Interactive profiling shell for the BENCH_PROMQL storage.

Run with: python -i tools/profile_shell.py  [--intervals N] [--suite range]

Provides:
  spark, eng       — session + engine over the bench storage
  t(expr, steps)   — min-of-N timing of a range query via noop sink
  ex(expr, steps)  — print explain("formatted")
  reload_engine()  — re-import prometheus_spark + rebuild engine (after a
                     code edit; storage survives)
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
INTERVAL_MS = 10_000

ap = argparse.ArgumentParser()
ap.add_argument("--intervals", type=int, default=8640 + 10000)
ap.add_argument("--suite", default="range")
args, _ = ap.parse_known_args()

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("prometheus_spark_profile")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", os.environ.get("PROFILE_UI", "true"))
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
    .config("spark.buffer.pageSize", os.environ.get("PAGESZ", "64m"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import tools.bench_promql as bp  # noqa: E402

if args.suite == "join":
    samples = bp.build_join_storage(spark, 8640 + 5000).persist()
elif args.suite == "native_hist":
    samples = bp.build_native_hist_storage(spark).persist()
else:
    samples = bp.build_storage(spark, args.intervals).persist()
print("samples:", samples.count())

from prometheus_spark.engine import PromQLEngine  # noqa: E402

eng = PromQLEngine(spark, samples)
NUM_INTERVALS = args.intervals


def _grid(steps: int):
    return ((NUM_INTERVALS - steps) * INTERVAL_MS,
            NUM_INTERVALS * INTERVAL_MS, INTERVAL_MS)


def q(expr: str, steps: int = 1000):
    s, e, st = _grid(steps)
    return eng.range_query(expr, s, e, st)


def t(expr: str, steps: int = 1000, runs: int = 3):
    best = None
    for i in range(runs):
        t0 = time.monotonic()
        df = q(expr, steps)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        print(f"  run{i}: {dt:.3f}s")
        best = dt if best is None else min(best, dt)
    print(f"min {best:.3f}s  {expr} steps={steps}")
    return best


def ex(expr: str, steps: int = 1000):
    df = q(expr, steps)
    print(df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"))


def reload_engine():
    global eng
    import prometheus_spark

    names = [n for n in list(sys.modules)
             if n.startswith("prometheus_spark")]
    for n in sorted(names, key=len, reverse=True):
        del sys.modules[n]
    from prometheus_spark.engine import PromQLEngine as PE

    eng = PE(spark, samples)
    print("engine reloaded")


print("ready: q/t/ex/reload_engine")
