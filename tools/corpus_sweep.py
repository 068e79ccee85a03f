"""Run promqltest corpus files fully (uncapped) and report per-file stats.

Usage: python tools/corpus_sweep.py [file1.test file2.test ...]
With no args, sweeps every .test file in the reference corpus across 4
subprocess workers (separate JVM + GIL each — plan construction is
Python-CPU bound; see prometheus_spark/testing/corpus_worker.py).
Writes a report to /tmp/corpus_sweep.txt and prints a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TESTDATA = "/root/reference/promql/promqltest/testdata"

# Rough uncapped cost weights (seconds on local[8], measured after the
# round-3 plan-construction collapse) used to balance the worker
# buckets; unknown files get a small default.
WEIGHTS = {
    "native_histograms.test": 111,
    "histograms.test": 103,
    "extended_vectors.test": 95,
    "functions.test": 55,
    "operators.test": 47,
    "fill-modifier.test": 32,
    "aggregators.test": 29,
    "subquery.test": 22,
    "type_and_unit.test": 13,
    "limit.test": 15,
    "info.test": 12,
    "at_modifier.test": 11,
    "selectors.test": 6,
    "name_label_dropping.test": 8,
    "duration_expression.test": 7,
    "start_timestamps.test": 8,
    "range_queries.test": 8,
}


# Slice the largest files across workers (corpus_worker eval-range
# specs "file@offset+count"): offsets index EvalCmds in file order.
# EMPTY by default: measured on local[32] the 4-worker sweep is already
# CPU-saturated, so slicing only re-runs load commands (227s vs 198s
# wall); populate when running on a box with more cores than
# 4×worker_cpus, where the wall floor becomes the largest single file
# (native_histograms alone drops 95s → 63s with a 2-way split).
# (The round-4..10 histograms.test MANDATORY split is gone: the
# "session pressure" was the engine plan cache retaining every eval's
# analyzed classic-histogram tree — root-caused round 11; the corpus
# runner now builds engines with plan_cache_size=0 and the full file
# runs in one session.)
SPLITS: dict[str, list] = {}
_SPLITS_EXAMPLE = {
    "native_histograms.test": [(0, 261), (261, 100000)],
    "histograms.test": [(0, 93), (93, 100000)],
    "extended_vectors.test": [(0, 85), (85, 100000)],
}


def to_specs(files: list[str]) -> tuple[list[str], dict[str, float]]:
    specs: list[str] = []
    weights: dict[str, float] = {}
    for f in files:
        if f in SPLITS:
            parts = SPLITS[f]
            for off, cnt in parts:
                spec = f"{f}@{off}+{cnt}"
                specs.append(spec)
                weights[spec] = WEIGHTS.get(f, 10) / len(parts)
        else:
            specs.append(f)
            weights[f] = WEIGHTS.get(f, 10)
    return specs, weights


def balance(files: list[str], n: int) -> list[list[str]]:
    """Greedy longest-processing-time bucket assignment."""
    specs, weights = to_specs(files)
    buckets: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in sorted(specs, key=lambda f: -weights.get(f, 10)):
        i = loads.index(min(loads))
        buckets[i].append(f)
        loads[i] += weights.get(f, 10)
    return [b for b in buckets if b]


# The files whose evals actually route differently when the prefix /
# as-of fast paths are forced everywhere (thresholds 0): the rate
# family, range aggregations and histogram windows.  --forced runs
# exactly these with both thresholds pinned to 0 — the fast-path
# parity gate (round 11's only serious bug, a forced-path GC storm,
# was invisible to the default sweep).
FORCED_FILES = [
    "functions.test",
    "native_histograms.test",
    "histograms.test",
    "range_queries.test",
]


def main() -> None:
    args = sys.argv[1:]
    forced = "--forced" in args
    args = [a for a in args if a != "--forced"]
    files = args or (
        FORCED_FILES
        if forced
        else sorted(f for f in os.listdir(TESTDATA) if f.endswith(".test"))
    )
    env = dict(os.environ)
    if forced:
        env["PROMSPARK_PREFIX_RANGE_THRESHOLD"] = "0"
        env["PROMSPARK_HIST_ASOF_THRESHOLD"] = "0"
    env["SPARK_GRAFT_CORPUS_CAPS"] = "{}"  # uncapped
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    t0 = time.time()
    n_workers = int(os.environ.get("SPARK_GRAFT_CORPUS_WORKERS", "4"))
    buckets = balance(files, n_workers)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "prometheus_spark.testing.corpus_worker",
             ",".join(b)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env, cwd=REPO,
        )
        for b in buckets
    ]
    results: dict[str, dict] = {}
    for p, b in zip(procs, buckets):
        out, _ = p.communicate()
        line = next(
            (ln for ln in out.splitlines()
             if ln.startswith("CORPUS_WORKER_RESULT ")), None
        )
        if line is None:
            for f in b:
                results[f] = {"total": 0, "failed": -1, "skipped": 0,
                              "failures": [f"WORKER CRASH rc={p.returncode}"]}
            continue
        results.update(json.loads(line[len("CORPUS_WORKER_RESULT "):]))

    # merge slice results back to per-file rows
    merged: dict[str, dict] = {}
    for spec, st in results.items():
        fname = spec.split("@", 1)[0]
        m = merged.setdefault(
            fname, {"total": 0, "failed": 0, "skipped": 0,
                    "failures": [], "sec": 0.0}
        )
        m["total"] += st.get("total", 0)
        m["failed"] += max(st.get("failed", 0), 0) if st.get("failed", 0) >= 0 else -1
        m["skipped"] += st.get("skipped", 0)
        m["failures"] += st.get("failures", [])
        # slices run in parallel — the file costs its slowest slice
        m["sec"] = round(max(m["sec"], float(st.get("sec", 0) or 0)), 1)
    results = merged

    report = []
    tot_failed = tot_evals = tot_skipped = 0
    for fname in files:
        st = results.get(fname, {})
        failed, total, skipped = st.get("failed", -1), st.get("total", 0), st.get("skipped", 0)
        tot_failed += max(failed, 0)
        tot_evals += total
        tot_skipped += skipped
        report.append(
            f"===== {fname}: {failed}/{total} failed, {skipped} skipped ({st.get('sec', '?')}s)"
        )
        report.extend(st.get("failures", []))
        print(
            f"{fname:32s} {failed:4d}/{total:4d} failed  {skipped:3d} skipped  {st.get('sec', 0):6}s",
            flush=True,
        )

    summary = (
        f"TOTAL: {tot_failed}/{tot_evals} failed, {tot_skipped} skipped "
        f"({time.time() - t0:.0f}s wall)"
    )
    with open("/tmp/corpus_sweep.txt", "w") as f:
        f.write(summary + "\n" + "\n".join(report) + "\n")
    print(summary)
    print("report: /tmp/corpus_sweep.txt")


if __name__ == "__main__":
    main()
