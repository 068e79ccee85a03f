"""Mirror of the reference's PromQL macro-benchmark.

Reference: promql/bench_test.go — ``setupRangeQueryTestData`` (:41)
generates a_X/b_X/h_X metric families at one/ten/hundred cardinality
plus a sparse series, 10s interval, ``8640 + 10000`` intervals (a day
of data plus 10k steps); ``rangeQueryCases`` (:157) is the query list,
with every ``X`` expanded to one+hundred and every unset step count
expanded to steps ∈ {1, 1000}; ``BenchmarkRangeQuery`` (:334) runs each
case as a range query ending at the last sample with a 10s step.

This grounds the "within 2× of the reference" claim in the reference's
OWN query set instead of the repo's headline set.  Results are written
to BENCH_PROMQL.json.

Usage:
    python tools/bench_promql.py [--out BENCH_PROMQL.json] [--filter SUBSTR]
        [--intervals N]   # default 8640+10000, shrink for smoke runs

Each query is materialized with a noop datasource write (all columns
computed, nothing shipped to the driver) — the closest Spark analogue
of the Go benchmark's in-process ``qry.Exec``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
INTERVAL_MS = 10_000


def build_storage(spark, num_intervals: int):
    """setupRangeQueryTestData (bench_test.go:41), Spark-side: the metric
    catalog is a tiny driver list; the 27M-sample frame is a broadcast
    crossJoin against the interval range — no driver loops."""
    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import sig_expr

    metrics: list[dict] = []
    metrics.append({"__name__": "a_one"})
    metrics.append({"__name__": "b_one"})
    for j in range(10):
        metrics.append({"__name__": "h_one", "le": str(j)})
    metrics.append({"__name__": "h_one", "le": "+Inf"})
    for card, n in (("ten", 10), ("hundred", 100)):
        for i in range(n):
            metrics.append({"__name__": f"a_{card}", "l": str(i)})
            metrics.append({"__name__": f"b_{card}", "l": str(i)})
            for j in range(10):
                metrics.append(
                    {"__name__": f"h_{card}", "l": str(i), "le": str(j)})
            metrics.append(
                {"__name__": f"h_{card}", "l": str(i), "le": "+Inf"})

    nm = len(metrics)
    mdf = spark.createDataFrame(
        [(m, i) for i, m in enumerate(metrics)], "labels map<string,string>, idx long"
    )
    steps = spark.range(num_intervals).withColumnRenamed("id", "s")
    dense = (
        steps.crossJoin(F.broadcast(mdf))
        .select(
            sig_expr("labels").alias("sig"),
            F.col("labels")["__name__"].alias("name"),
            "labels",
            (F.col("s") * INTERVAL_MS).alias("t"),
            (F.col("s") + F.col("idx") / F.lit(float(nm))).cast("double").alias("value"),
            F.lit(False).alias("stale"),
        )
    )
    # sparse series: each "l" value carries numIntervals/50 points
    pps = num_intervals // 50
    sparse_labels = F.map_from_arrays(
        F.array(F.lit("__name__"), F.lit("l")),
        F.array(F.lit("sparse"), (F.col("s") / pps).cast("long").cast("string")),
    )
    sparse = steps.select(
        sig_expr(sparse_labels).alias("sig"),
        F.lit("sparse").alias("name"),
        sparse_labels.alias("labels"),
        (F.col("s") * INTERVAL_MS).alias("t"),
        (F.col("s") / F.lit(float(nm))).cast("double").alias("value"),
        F.lit(False).alias("stale"),
    )
    return dense.unionByName(sparse)


# (expr, steps) with steps=None meaning "expand to 1 and 1000"
# — transcribed from rangeQueryCases (bench_test.go:157-334)
BASE_CASES = [
    ("a_X", None),
    ("rate(a_X[1m])", None),
    ("rate(a_X[1m])", 10000),
    ("rate(sparse[1m])", 10000),
    ("rate(a_X[1m] smoothed)", None),
    ("rate(a_X[1m] smoothed)", 10000),
    ("rate(sparse[1m] smoothed)", 10000),
    ("double_exponential_smoothing(a_X[1d], 0.3, 0.3)", None),
    ("changes(a_X[1d])", None),
    ("rate(a_X[1d])", None),
    ("absent_over_time(a_X[1d])", None),
    ("-a_X", None),
    ("a_X - b_X", None),
    ("a_X - b_X", 10000),
    ("a_X and b_X{l=~'.*[0-4]$'}", None),
    ("a_X or b_X{l=~'.*[0-4]$'}", None),
    ("a_X unless b_X{l=~'.*[0-4]$'}", None),
    ("a_X and b_X{l='notfound'}", None),
    ("abs(a_X)", None),
    ("label_replace(a_X, 'l2', '$1', 'l', '(.*)')", None),
    ("label_join(a_X, 'l2', '-', 'l', 'l')", None),
    ("sum(a_X)", None),
    ("avg(a_X)", None),
    ("sum without (l)(h_X)", None),
    ("sum without (le)(h_X)", None),
    ("sum by (l)(h_X)", None),
    ("sum by (le)(h_X)", None),
    ("count_values('value', h_X)", 100),
    ("topk(1, a_X)", None),
    ("topk(5, a_X)", None),
    ("limitk(1, a_X)", None),
    ("limitk(5, a_X)", None),
    ("limit_ratio(0.1, a_X)", None),
    ("limit_ratio(0.5, a_X)", None),
    ("limit_ratio(-0.5, a_X)", None),
    ("rate(a_X[1m]) + rate(b_X[1m])", None),
    ("sum without (l)(rate(a_X[1m]))", None),
    ("sum without (l)(rate(a_X[1m])) / sum without (l)(rate(b_X[1m]))", None),
    ("histogram_quantile(0.9, rate(h_X[5m]))", None),
    ("a_X + on(l) group_right a_one", None),
    ('count({__name__!=""})', 1),
    ('count({__name__!="",l=""})', 1),
    ("timestamp(a_X)", None),
    # repo additions (not in bench_test.go): group_left/right INCLUDE
    # shapes — coverage for the split-path include migration (round 13)
    ("a_X * on(l) group_left(le) h_X{le='+Inf'}", None),
    ("h_X{le='1'} * ignoring(le) group_right(le) a_X", None),
]


def build_join_storage(spark, num_intervals: int, num_instances: int = 1000):
    """setupJoinQueryTestData (bench_test.go:104): two metric names over
    ``num_instances`` UUID-labeled instances sharing 6 common labels.
    Python's seeded RNG stands in for Go's uuid.NewRandomFromReader —
    the shape (distinct v4-format UUIDs, hex-uniform first char so
    ``instance=~"0.*"`` keeps 1/16) is what the benchmark measures."""
    import random

    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import sig_expr

    rnd = random.Random(0)

    def uuid4() -> str:
        b = bytearray(rnd.getrandbits(8) for _ in range(16))
        b[6] = (b[6] & 0x0F) | 0x40
        b[8] = (b[8] & 0x3F) | 0x80
        h = bytes(b).hex()
        return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"

    common = {
        "environment": "staging",
        "cluster": "test-kubernetes-cluster",
        "namespace": "test-kubernetes-namespace",
        "job": "worker",
        "rpc_method": "fetch-my-data-from-this-service",
        "domain": "test-domain",
    }
    metrics = []
    for _ in range(num_instances):
        inst = uuid4()
        for name in ("rpc_request_success_total", "rpc_request_error_total"):
            metrics.append({**common, "instance": inst, "__name__": name})
    nm = len(metrics)
    mdf = spark.createDataFrame(
        [(m, i) for i, m in enumerate(metrics)],
        "labels map<string,string>, idx long",
    )
    steps = spark.range(num_intervals).withColumnRenamed("id", "s")
    return steps.crossJoin(F.broadcast(mdf)).select(
        sig_expr("labels").alias("sig"),
        F.col("labels")["__name__"].alias("name"),
        "labels",
        (F.col("s") * INTERVAL_MS).alias("t"),
        (F.col("s") + F.col("idx") / F.lit(float(nm))).cast("double").alias("value"),
        F.lit(False).alias("stale"),
    )


JOIN_CASES = [  # bench_test.go:406-430, steps=5000, 1000 instances
    ("rpc_request_success_total + rpc_request_error_total", 5000),
    ("rpc_request_success_total + ON (job, instance) GROUP_LEFT rpc_request_error_total", 5000),
    ('rpc_request_success_total AND rpc_request_error_total{instance=~"0.*"}', 5000),
    ('rpc_request_success_total OR rpc_request_error_total{instance=~"0.*"}', 5000),
    ('rpc_request_success_total UNLESS rpc_request_error_total{instance=~"0.*"}', 5000),
]


def build_native_hist_storage(spark, num_series: int = 3000, samples_per: int = 2000):
    """generateNativeHistogramSeries (bench_test.go:722) +
    GenerateTestHistogram (tsdb/tsdbutil/histogram.go:40), built
    distributedly: schema-1 histograms with delta-coded buckets
    [i+1,1,-1,0] → absolute float counts [i+1,i+2,i+1,i+1], 15s interval.
    (The reference also injects one schema-3 histogram at t=0 per series
    through a duplicate-timestamp append; one sample in 2000 does not
    move the benchmark and our storage keeps last-per-timestamp.)"""
    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import sig_expr
    from prometheus_spark.model.schema import HISTOGRAM_TYPE

    sids = spark.range(num_series).withColumnRenamed("id", "h")
    idx = spark.range(samples_per).withColumnRenamed("id", "i")
    i = F.col("i").cast("double")
    labels = F.map_from_arrays(
        F.array(F.lit("__name__"), F.lit("foo"), F.lit("h")),
        F.array(
            F.lit("native_histogram_series"), F.lit("bar"),
            F.col("h").cast("string"),
        ),
    )
    spans = F.array(
        F.struct(F.lit(0).alias("offset"), F.lit(2).alias("length")),
        F.struct(F.lit(1).alias("offset"), F.lit(2).alias("length")),
    )
    buckets = F.array(i + 1, i + 2, i + 1, i + 1)
    hist = F.struct(
        F.lit(1).alias("schema"),
        F.lit(0.001).alias("zero_threshold"),
        (i + 2).alias("zero_count"),
        (i * 9 + 12).alias("count"),
        (F.lit(18.4) * (i + 1)).alias("sum"),
        spans.alias("pos_spans"),
        buckets.alias("pos_buckets"),
        spans.alias("neg_spans"),
        buckets.alias("neg_buckets"),
        F.array().cast("array<double>").alias("custom_values"),
        # counter_reset_hint: unknown at i=0, NotCounterReset after
        # (GenerateTestHistograms sets it from the second sample on)
        F.when(F.col("i") == 0, F.lit(0)).otherwise(F.lit(2))
        .cast("tinyint").alias("counter_reset_hint"),
    ).cast(HISTOGRAM_TYPE)
    base = sids.crossJoin(idx).select(
        sig_expr(labels).alias("sig"),
        F.lit("native_histogram_series").alias("name"),
        labels.alias("labels"),
        (F.col("i") * 15_000).alias("t"),
        F.lit(None).cast("double").alias("value"),
        hist.alias("hist"),
        F.lit(False).alias("stale"),
    )
    # reset-heavy companion metric (round 11): 600 series whose counters
    # reset every ~10 samples with unknown hints — a restart-heavy fleet.
    # Exercises the segmented vector fold (reset-free windows stay
    # vectorized; only per-reset correction adds loop) instead of the
    # scalar whole-series replay it previously forced.
    # small: the reset case needs reset DENSITY, not volume — and the
    # companion rows fatten every other case's scan of the shared table
    rsids = spark.range(300).withColumnRenamed("id", "h")
    seg = ((F.col("i") + F.col("h")) % 10).cast("double")  # resets at seg=0
    rlabels = F.map_from_arrays(
        F.array(F.lit("__name__"), F.lit("foo"), F.lit("h")),
        F.array(
            F.lit("native_histogram_resets"), F.lit("bar"),
            F.col("h").cast("string"),
        ),
    )
    rbuckets = F.array(seg + 1, seg + 2, seg + 1, seg + 1)
    rhist = F.struct(
        F.lit(1).alias("schema"),
        F.lit(0.001).alias("zero_threshold"),
        (seg + 2).alias("zero_count"),
        (seg * 9 + 12).alias("count"),
        (F.lit(18.4) * (seg + 1)).alias("sum"),
        spans.alias("pos_spans"),
        rbuckets.alias("pos_buckets"),
        spans.alias("neg_spans"),
        rbuckets.alias("neg_buckets"),
        F.array().cast("array<double>").alias("custom_values"),
        F.lit(0).cast("tinyint").alias("counter_reset_hint"),
    ).cast(HISTOGRAM_TYPE)
    ridx = spark.range(600).withColumnRenamed("id", "i")
    resets = rsids.crossJoin(ridx).select(
        sig_expr(rlabels).alias("sig"),
        F.lit("native_histogram_resets").alias("name"),
        rlabels.alias("labels"),
        (F.col("i") * 15_000).alias("t"),
        F.lit(None).cast("double").alias("value"),
        rhist.alias("hist"),
        F.lit(False).alias("stale"),
    )
    return base.unionByName(resets)


NATIVE_HIST_CASES = [  # bench_test.go:471-503; 0..2h at 30s step
    "sum(native_histogram_series)",
    "sum(rate(native_histogram_series[2m]))",
    "sum(rate(native_histogram_series[20m]))",
    "histogram_count(sum(rate(native_histogram_series[2m])))",
    "histogram_count(sum(rate(native_histogram_series[20m])))",
    "histogram_count(sum(rate(native_histogram_series[2m]))) + histogram_sum(sum(rate(native_histogram_series[2m])))",
    "histogram_count(sum(rate(native_histogram_series[20m]))) + histogram_sum(sum(rate(native_histogram_series[20m])))",
    # reset-heavy synthetic (not in the reference suite; round 11 —
    # pins the segmented vector fold's win over the scalar replay)
    "sum(rate(native_histogram_resets[5m]))",
]


def expand_cases() -> list[tuple[str, int]]:
    tmp = []
    for expr, steps in BASE_CASES:
        if "X" not in expr:
            tmp.append((expr, steps))
        else:
            tmp.append((expr.replace("X", "one"), steps))
            tmp.append((expr.replace("X", "hundred"), steps))
    out = []
    for expr, steps in tmp:
        if steps is not None:
            out.append((expr, steps))
        else:
            out.append((expr, 1))
            out.append((expr, 1000))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--filter", default="")
    ap.add_argument("--intervals", type=int, default=8640 + 10000)
    # Go's BenchmarkRangeQuery reports steady-state per-iteration time
    # (b.N warm runs); min-of-N mirrors that instead of charging each
    # case its one-time Janino codegen
    ap.add_argument("--runs", type=int, default=2)
    # range = BenchmarkRangeQuery; join = BenchmarkJoinQuery;
    # native_hist = BenchmarkNativeHistograms (bench_test.go:382,456)
    ap.add_argument("--suite", default="range",
                    choices=["range", "join", "native_hist"])
    args = ap.parse_args()
    if args.out is None:
        args.out = {
            "range": "BENCH_PROMQL.json",
            "join": "BENCH_JOIN.json",
            "native_hist": "BENCH_NATIVE_HIST.json",
        }[args.suite]

    from pyspark.sql import SparkSession

    from prometheus_spark.session import page_size_for as _page_size_for

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prometheus_spark_bench_promql")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        # 64m pages: this suite's steps=1000 cases shuffle 27M rows,
        # where 1m pages cost ~50% (measured on the native-hist sum
        # case: 3.4 s at 64m vs 5.1 s at 1m); broadcast-page
        # accumulation is bounded here by the per-8-cases gc below.
        # The 1m default stays for the corpus/tests/server personas
        # (many tiny broadcasts, small shuffles).
        # batch persona: one wide-shuffle pipeline per case (see
        # prometheus_spark.session.page_size_for)
        .config(
            "spark.buffer.pageSize",
            os.environ.get("PAGESZ", _page_size_for("batch")),
        )
        # System.gc() (the periodic shuffle-file hygiene below) otherwise
        # triggers a FULL G1 collection: 48g heap compaction + region
        # uncommit, whose re-expansion allocation stalls poison the next
        # case (measured 56 s for a 2.9 s query).  A concurrent cycle
        # still processes the weak/phantom refs the ContextCleaner needs.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+ExplicitGCInvokesConcurrent",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prometheus_spark.engine import PromQLEngine

    num_intervals = args.intervals
    t_setup = time.monotonic()
    if args.suite == "join":
        num_intervals = 8640 + 5000  # bench_test.go:397-401
        samples = build_join_storage(spark, num_intervals).persist()
        warm = ("sum(rpc_request_success_total)", 600_000, 1_200_000, 60_000)
        grid = [
            (expr, (num_intervals - steps) * INTERVAL_MS,
             num_intervals * INTERVAL_MS, INTERVAL_MS, steps)
            for expr, steps in JOIN_CASES
        ]
    elif args.suite == "native_hist":
        samples = build_native_hist_storage(spark).persist()
        warm = ("sum(native_histogram_series)", 0, 600_000, 60_000)
        # start=unix(0), end=+2h, 30s step (bench_test.go:467-469)
        grid = [(expr, 0, 7_200_000, 30_000, 241) for expr in NATIVE_HIST_CASES]
    else:
        samples = build_storage(spark, num_intervals).persist()
        warm = ("sum(rate(a_one[1m]))", 600_000, 1_200_000, 60_000)
        grid = [
            (expr, (num_intervals - steps) * INTERVAL_MS,
             num_intervals * INTERVAL_MS, INTERVAL_MS, steps)
            for expr, steps in expand_cases()
        ]
    n = samples.count()  # materialize — the Go bench compacts before timing
    eng = PromQLEngine(spark, samples)
    # untimed warm-up (codegen class cache), like bench.py
    eng.range_query(*warm).count()
    setup_sec = time.monotonic() - t_setup

    cases = grid
    if args.filter:
        cases = [c for c in cases if args.filter in c[0]]
    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, (expr, start_ms, end_ms, step_ms, steps) in enumerate(cases):
        if i and i % 8 == 0:
            # long single-JVM runs accumulate unreferenced shuffle files
            # (cleaned only on GC); without this, late queries measure
            # 3-4x slower than the same query in a fresh session.
            # Python cycles FIRST: py4j handles self-cycle (pygc
            # docstring), so without collecting them the JVM GC can't
            # release the plans + broadcast pages they pin.
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
            # the gc kicks off ASYNC work (ContextCleaner shuffle-file
            # removal, G1 region uncommit/recommit); without a settle
            # pause that work lands inside the NEXT case's timed runs —
            # event-log forensics showed the case right after a gc
            # boundary spending 24-48x its normal CPU in allocation
            # stalls (zero reported GC time, zero fetch wait)
            time.sleep(2.0)
        name = f"expr={expr},steps={steps}"
        try:
            best = None
            for _ in range(max(1, args.runs)):
                t0 = time.monotonic()
                df = eng.range_query(expr, start_ms, end_ms, step_ms)
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            results[name] = round(best, 4)
            print(f"ok   {best:8.3f}s  {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            errors[name] = str(e)[:200]
            print(f"FAIL {name}: {e}", file=sys.stderr, flush=True)

    total = round(sum(results.values()), 3)
    out = {
        "metric": f"promql_{args.suite}_bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "cases": len(cases),
        "failed": len(errors),
        "errors": errors,
        "samples": n,
        "num_intervals": num_intervals,
        "setup_sec": round(setup_sec, 2),
        "runs": args.runs,
        "timing": "min",
        "suite": args.suite,
        "source": "promql/bench_test.go BenchmarkRangeQuery/BenchmarkJoinQuery/BenchmarkNativeHistograms",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": out["metric"], "value": total,
                      "cases": len(cases), "failed": len(errors)}))


if __name__ == "__main__":
    main()
