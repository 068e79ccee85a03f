"""Subprocess corpus worker: run a set of promqltest files in an
isolated SparkSession and print one JSON line of per-file stats.

Why a subprocess: each eval spends ~0.3-0.9 s of *Python* CPU building
the DataFrame plan (thousands of py4j round-trips), so thread pools
inside one interpreter hit the GIL ceiling at ~1-2 evals/s no matter
how many Spark cores are free.  Separate processes get separate GILs
and separate JVMs; four workers cut corpus wall-clock ~4x.

Usage: python -m prometheus_spark.testing.corpus_worker f1.test,f2.test
Env:   SPARK_GRAFT_CORPUS_DIR   testdata dir (default: reference corpus)
       SPARK_GRAFT_CORPUS_CAPS  JSON {file: max_evals}
       SPARK_GRAFT_CORPUS_CPUS  cores per worker session (default 8)
"""

from __future__ import annotations

import json
import os
import sys


def main(argv: list[str]) -> int:
    files = [f for f in argv[0].split(",") if f]
    testdata = os.environ.get(
        "SPARK_GRAFT_CORPUS_DIR", "/root/reference/promql/promqltest/testdata"
    )
    caps = json.loads(os.environ.get("SPARK_GRAFT_CORPUS_CAPS", "{}"))
    cpus = os.environ.get("SPARK_GRAFT_CORPUS_CPUS", "8")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("corpus_worker")
        .config(
            "spark.sql.shuffle.partitions",
            # corpus fixtures are tiny (tens of rows/series); wide
            # shuffles only add scheduling latency per eval job
            os.environ.get("SPARK_GRAFT_CORPUS_SHUFFLE", "2"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_CORPUS_MEM", "8g"),
        )
        # the SQL status store retains per-execution plan DESCRIPTIONS
        # (default 1000 executions); classic-histogram evals compose
        # very large SQL plans, so the default retention grows the heap
        # superlinearly over a long corpus file until the session GC-
        # storms (measured: histograms.test per-eval cost 0.5s → 2.4s
        # within one session, then thrash).  Keep only a handful.
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "1000")
        .config("spark.sql.codegen.cache.maxEntries", "200")
        # every broadcast hash relation pays one Tungsten page up
        # front; the default page heuristic (16m at 8g/8cores) pins
        # 16 MB per tiny dim broadcast — at 24 concurrent forced-path
        # evals that alone fills the heap (round-11 GC storm, JVM
        # half; see prometheus_spark/session.py RECOMMENDED)
        .config("spark.buffer.pageSize", "1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prometheus_spark.testing import run_test_text

    import time

    out = {}
    for spec in files:
        # "file.test" or "file.test@<offset>+<count>" — an eval-range
        # slice (run_test_text eval_offset), so one big file can split
        # across workers
        fname, offset, count = spec, 0, None
        if "@" in spec:
            fname, rng = spec.split("@", 1)
            off_s, _, cnt_s = rng.partition("+")
            offset = int(off_s)
            count = int(cnt_s) if cnt_s else None
        path = os.path.join(testdata, fname)
        if not os.path.exists(path):
            out[spec] = {"total": 0, "failed": 0, "skipped": 0, "missing": True}
            continue
        with open(path) as f:
            text = f.read()
        t0 = time.monotonic()
        max_evals = caps.get(fname) if count is None else count
        stats = run_test_text(
            spark, text, max_evals=max_evals,
            parallel_evals=int(
                # 24 measured best on local[32]: evals are tiny read-only
                # jobs, so deep submission hides scheduling latency; 32
                # thrashes the worker GIL
                os.environ.get("SPARK_GRAFT_CORPUS_EVAL_PAR", "24")
            ),
            eval_offset=offset,
        )
        out[spec] = {
            "total": stats.total,
            "failed": stats.failed,
            "skipped": stats.skipped,
            "failures": stats.failures[:10],
            "sec": round(time.monotonic() - t0, 1),
        }
    print("CORPUS_WORKER_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
