"""Run promqltest corpus files fully and report per-file failure stats.

Usage: python tools/corpus_sweep.py [file1.test file2.test ...]
With no args, sweeps every .test file in the reference corpus.
Writes a report to /tmp/corpus_sweep.txt and prints a summary table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = "/root/reference/promql/promqltest/testdata"


def main() -> None:
    from pyspark.sql import SparkSession

    from prometheus_spark.testing import run_test_text

    files = sys.argv[1:] or sorted(
        f for f in os.listdir(TESTDATA) if f.endswith(".test")
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("corpus_sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    report = []
    tot_failed = tot_evals = tot_skipped = 0
    for fname in files:
        path = os.path.join(TESTDATA, fname)
        with open(path) as f:
            text = f.read()
        t0 = time.time()
        try:
            stats = run_test_text(spark, text, max_evals=None, parallel_evals=12)
            failed, total, skipped, fails = (
                stats.failed, stats.total, stats.skipped, stats.failures
            )
        except Exception as e:  # noqa: BLE001 — harness crash counts as all-fail
            failed, total, skipped, fails = -1, 0, 0, [f"HARNESS CRASH: {e!r}"]
        dt = time.time() - t0
        tot_failed += max(failed, 0)
        tot_evals += total
        tot_skipped += skipped
        report.append(
            f"===== {fname}: {failed}/{total} failed, {skipped} skipped ({dt:.1f}s)"
        )
        report.extend(fails)
        print(
            f"{fname:32s} {failed:4d}/{total:4d} failed  {skipped:3d} skipped  {dt:6.1f}s",
            flush=True,
        )

    summary = f"TOTAL: {tot_failed}/{tot_evals} failed, {tot_skipped} skipped"
    with open("/tmp/corpus_sweep.txt", "w") as f:
        f.write(summary + "\n" + "\n".join(report) + "\n")
    print(summary)
    print("report: /tmp/corpus_sweep.txt")


if __name__ == "__main__":
    main()
