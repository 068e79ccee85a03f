"""promtool-style CLI: validate rule files and run rule unit tests.

Mirrors the reference's ``promtool check rules`` (cmd/promtool/main.go
CheckRules) and ``promtool test rules`` (cmd/promtool/unittest.go) over
the Spark engine.

Usage::

    python tools/promtool.py check rules rules1.yml [rules2.yml ...]
    python tools/promtool.py check config prometheus.yml
    python tools/promtool.py check web-config web.yml [more.yml ...]
    python tools/promtool.py check metrics < exposition.txt
    python tools/promtool.py check service-discovery <config.yml> <job>
    python tools/promtool.py check healthy|ready <server-url>
    python tools/promtool.py test rules tests.yml [more.yml ...]
    python tools/promtool.py query instant <samples_parquet> <expr> [--time ms]
    python tools/promtool.py query range <samples_parquet> <expr> \
        --start ms --end ms --step ms
    python tools/promtool.py query series <samples_parquet> <match...> \
        [--start ms --end ms]
    python tools/promtool.py query labels <samples_parquet> <name> \
        [--start ms --end ms]
    python tools/promtool.py query analyze <samples_parquet> \
        [--type histogram] [--duration ms]
    python tools/promtool.py tsdb list <block_store_dir>
    python tools/promtool.py tsdb analyze <block_store_dir> [topN]
    python tools/promtool.py tsdb dump <block_store_dir> [--match expr ...]
    python tools/promtool.py tsdb dump-openmetrics <block_store_dir> [...]
    python tools/promtool.py tsdb bench write <samples_parquet> [...]
    python tools/promtool.py tsdb create-blocks-from openmetrics <in> <out>
    python tools/promtool.py tsdb create-blocks-from rules <store> <rules> <out>
    python tools/promtool.py push metrics <remote-write-url> <file> [...]
    python tools/promtool.py debug pprof|metrics|all <server-url> [--output f]
    python tools/promtool.py promql format '<expr>'
    python tools/promtool.py promql label-matchers set|delete [-t =] \
        '<expr>' <name> [<value>]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_rules(files: list[str]) -> int:
    from prometheus_spark.streaming.rulefmt import RuleError, load_rule_file

    rc = 0
    for f in files:
        try:
            groups = load_rule_file(f)
        except (RuleError, OSError) as e:
            print(f"  FAILED: {f}: {e}")
            rc = 1
            continue
        n = sum(len(g.rules) for g in groups)
        print(f"  SUCCESS: {f}: {n} rules found")
    return rc


def test_rules(files: list[str]) -> int:
    from pyspark.sql import SparkSession

    from prometheus_spark.testing.rule_unittest import run_rule_test_file

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for f in files:
        errs = run_rule_test_file(spark, f)
        if errs:
            print(f"  FAILED: {f}")
            for e in errs:
                print(e)
            rc = 1
        else:
            print(f"  SUCCESS: {f}")
    return rc


def check_metrics() -> int:
    """cmd/promtool CheckMetrics: lint exposition text from stdin."""
    from prometheus_spark.sources.promlint import lint_exposition

    problems = lint_exposition(sys.stdin.read())
    for pr in problems:
        print(f"{pr.metric}: {pr.text}")
    return 3 if problems else 0  # promtool exits 3 on lint problems


def check_config(files: list[str]) -> int:
    """cmd/promtool CheckConfig: parse the config, then validate every
    referenced rule file."""
    from prometheus_spark.config import load_config
    from prometheus_spark.streaming.rulefmt import RuleError, load_rule_file

    rc = 0
    for f in files:
        try:
            cfg = load_config(f)
        except (ValueError, OSError, Exception) as e:  # noqa: BLE001
            print(f"  FAILED: {f}: {e}")
            rc = 1
            continue
        print(
            f"  SUCCESS: {f}: {len(cfg.scrape_jobs)} scrape configs, "
            f"{len(cfg.rule_files)} rule files"
        )
        for rf in cfg.rule_files:
            try:
                groups = load_rule_file(rf)
                n = sum(len(g.rules) for g in groups)
                print(f"  SUCCESS: {rf}: {n} rules found")
            except (RuleError, OSError) as e:
                print(f"  FAILED: {rf}: {e}")
                rc = 1
    return rc


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def query(kind: str, store: str, expr: str, args: dict) -> int:
    """promtool query instant/range over a samples parquet store,
    printing the reference's JSON rendering."""
    import json

    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import read_samples
    from prometheus_spark.web.api import render_result

    spark = _spark()
    eng = PromQLEngine(spark, read_samples(spark, store))
    if kind == "instant":
        t = int(args.get("--time", 0))
        rows = eng.instant_query(expr, t).collect()
        print(json.dumps(render_result(rows, "vector")))
    else:
        rows = eng.range_query(
            expr, int(args["--start"]), int(args["--end"]), int(args["--step"])
        ).collect()
        print(json.dumps(render_result(rows, "matrix")))
    return 0


def tsdb_blocks(store: str) -> int:
    """cmd/promtool tsdb list: one line per block — parquet t_bucket
    dirs, or reference-native ULID block dirs when present."""
    if _is_native_block_dir(store):
        import glob as _glob

        from prometheus_spark.storage.tsdb_block import read_meta

        dirs = (
            [store]
            if os.path.exists(os.path.join(store, "index"))
            else sorted(
                os.path.dirname(p)
                for p in _glob.glob(os.path.join(store, "*", "index"))
            )
        )
        print(f"{'BLOCK ULID':<28}{'MIN TIME':>16}{'MAX TIME':>16}"
              f"{'NUM SAMPLES':>14}{'NUM SERIES':>12}")
        for d in dirs:
            m = read_meta(d)
            st = m.get("stats", {})
            print(f"{m['ulid']:<28}{m['minTime']:>16}{m['maxTime']:>16}"
                  f"{st.get('numSamples', 0):>14}{st.get('numSeries', 0):>12}")
        return 0
    from prometheus_spark.storage.compact import DEFAULT_BLOCK_MS, list_buckets

    print(f"{'BLOCK':<24}{'MIN TIME':>16}{'MAX TIME':>16}")
    for b in list_buckets(store):
        print(f"{'t_bucket=' + str(b):<24}{b * DEFAULT_BLOCK_MS:>16}"
              f"{(b + 1) * DEFAULT_BLOCK_MS:>16}")
    return 0


def tsdb_analyze(store: str, limit: int = 10) -> int:
    """cmd/promtool tsdb analyze: series/sample counts and the
    highest-cardinality label names + most-common label pairs —
    computed distributed, only the top-k summaries reach the driver."""
    from pyspark.sql import functions as F

    spark = _spark()
    df = _read_store(spark, store)
    n_samples = df.count()
    n_series = df.select("sig").distinct().count()
    print(f"Samples: {n_samples}")
    print(f"Series: {n_series}")
    ent = (
        df.select("sig", F.explode(F.map_entries("labels")).alias("e"))
        .dropDuplicates(["sig", "e"])
        .select(F.col("e.key").alias("k"), F.col("e.value").alias("v"))
    ).cache()
    print("\nHighest cardinality labels:")
    for r in (ent.groupBy("k").agg(F.countDistinct("v").alias("c"))
              .orderBy(F.desc("c"), "k").limit(limit).collect()):
        print(f"  {r['c']:>8}  {r['k']}")
    print("\nMost common label pairs:")
    for r in (ent.groupBy("k", "v").agg(F.count("*").alias("c"))
              .orderBy(F.desc("c"), "k", "v").limit(limit).collect()):
        print(f"  {r['c']:>8}  {r['k']}={r['v']}")
    return 0


def tsdb_import_openmetrics(infile: str, out: str) -> int:
    from prometheus_spark.storage.backfill import backfill_openmetrics

    spark = _spark()
    with open(infile) as f:
        n = backfill_openmetrics(spark, f.read(), out)
    print(f"  SUCCESS: wrote {n} samples to {out}")
    return 0


def tsdb_import_rules(store: str, out: str, rule_file: str, flags: dict) -> int:
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import read_samples, write_samples
    from prometheus_spark.storage.backfill import backfill_rules
    from prometheus_spark.streaming.rulefmt import load_rule_file

    spark = _spark()
    engine = PromQLEngine(spark, read_samples(spark, store))
    rules = [r for g in load_rule_file(rule_file) for r in g.rules]
    df = backfill_rules(
        engine, rules,
        start_ms=int(flags["--start"]), end_ms=int(flags["--end"]),
        interval_ms=int(flags.get("--eval-interval", 60_000)),
    )
    write_samples(df, out)
    print(f"  SUCCESS: backfilled {df.count()} samples to {out}")
    return 0


_DEBUG_ENDPOINTS = {
    "metrics": ["/api/v1/status/self_metrics"],
    "config": ["/api/v1/status/config"],
    "all": [
        "/api/v1/status/self_metrics",
        "/api/v1/status/config",
        "/api/v1/status/buildinfo",
        "/api/v1/status/runtimeinfo",
        "/api/v1/status/flags",
        "/api/v1/status/tsdb",
        "/api/v1/status/walreplay",
    ],
}


def debug(kind: str, server_url: str, out: str = "debug.tar.gz") -> int:
    """cmd/promtool debug metrics/all (main.go:203-208): fetch debug
    surfaces from a running server into one tar.gz.  Go pprof profiles
    don't exist on a Python/Spark server; the archive carries the status
    endpoints instead (debug pprof is rejected with an explanation)."""
    import io
    import json
    import tarfile
    import time
    import urllib.request

    if kind == "pprof":
        print("debug pprof: Go runtime profiles are not applicable to this "
              "engine; use 'debug metrics' or 'debug all'", file=sys.stderr)
        return 1
    paths = _DEBUG_ENDPOINTS.get(kind)
    if paths is None:
        print(f"unknown debug target {kind!r}", file=sys.stderr)
        return 1
    base = server_url.rstrip("/")
    with tarfile.open(out, "w:gz") as tar:
        for p in paths:
            try:
                with urllib.request.urlopen(base + p, timeout=10) as resp:
                    body = resp.read()
            except Exception as e:  # noqa: BLE001 — collect what we can
                body = json.dumps({"error": str(e)}).encode()
            info = tarfile.TarInfo(name="debug" + p.replace("/", "_") + ".json")
            info.size = len(body)
            info.mtime = int(time.time())
            tar.addfile(info, io.BytesIO(body))
            print(f"collected {p} ({len(body)} bytes)")
    print(f"Compiling debug information complete, all files written in {out!r}.")
    return 0


def promql_format(query: str) -> int:
    """cmd/promtool promql format (experimental): pretty-print."""
    from prometheus_spark.parser.printer import format_query

    print(format_query(query))
    return 0


def _walk_ast(node, fn):
    """Apply fn to every AST node (dataclass tree walk)."""
    import dataclasses

    fn(node)
    if not dataclasses.is_dataclass(node):
        return
    for f in dataclasses.fields(node):
        v = getattr(node, f.name, None)
        if isinstance(v, list):
            for item in v:
                if dataclasses.is_dataclass(item):
                    _walk_ast(item, fn)
        elif dataclasses.is_dataclass(v) and not isinstance(v, type):
            _walk_ast(v, fn)


def promql_label_matchers(
    action: str, query: str, name: str, value: str = "", mtype: str = "="
) -> int:
    """cmd/promtool promql label-matchers set/delete (main.go:1374
    labelsSetPromQL / :1419 labelsDeletePromQL): rewrite the matcher on
    every vector selector and print the edited query."""
    from prometheus_spark.parser import parse_expr
    from prometheus_spark.parser.ast import Matcher, MatchType, VectorSelector
    from prometheus_spark.parser.printer import to_promql

    try:
        mt = MatchType(mtype)
    except ValueError:
        print(f"invalid label match type: {mtype}", file=sys.stderr)
        return 1
    node = parse_expr(query)

    def edit(n):
        if not isinstance(n, VectorSelector):
            return
        if action == "set":
            out, found = [], False
            for m in n.matchers:
                if m.name == name:
                    out.append(Matcher(name, mt, value))
                    found = True
                else:
                    out.append(m)
            if not found:
                out.append(Matcher(name, mt, value))
            n.matchers = out
        else:  # delete
            n.matchers = [m for m in n.matchers if m.name != name]

    _walk_ast(node, edit)
    print(to_promql(node))
    return 0


def query_series(store: str, matchers: list[str], flags: dict) -> int:
    """cmd/promtool query series: print each matching label set."""
    import json

    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import read_samples
    from prometheus_spark.web.api import PromAPI

    spark = _spark()
    api = PromAPI(PromQLEngine(spark, read_samples(spark, store)))
    params = {"match[]": matchers}
    for k in ("--start", "--end"):
        if k in flags:
            params[k.strip("-")] = [flags[k]]
    code, resp = api.series(params)
    if code != 200:
        print(resp.get("error", "error"), file=sys.stderr)
        return 1
    for labels in resp["data"]:
        print(json.dumps(labels, sort_keys=True))
    return 0


def query_labels(store: str, name: str, flags: dict) -> int:
    """cmd/promtool query labels: values of one label name."""
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import read_samples
    from prometheus_spark.web.api import PromAPI

    spark = _spark()
    api = PromAPI(PromQLEngine(spark, read_samples(spark, store)))
    params = {}
    if "--match" in flags:
        params["match[]"] = [flags["--match"]]
    code, resp = api.label_values(name, params)
    if code != 200:
        print(resp.get("error", "error"), file=sys.stderr)
        return 1
    for v in resp["data"]:
        print(v)
    return 0


def query_analyze(store: str, flags: dict) -> int:
    """cmd/promtool query analyze --type histogram (analyze.go:59-230):
    per-series bucket-population statistics — min/avg/max POPULATED
    buckets per scrape (classic: de-cumulated le buckets; native: non-
    zero sparse buckets + zero bucket), plus the total bucket count.
    The de-cumulation and per-timestamp counts run as DataFrame window/
    aggregate expressions; only per-series stat rows reach the driver."""
    from pyspark.sql import functions as F

    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import read_samples

    if flags.get("--type", "histogram") != "histogram":
        print("analyze type must be 'histogram'", file=sys.stderr)
        return 1
    match = flags.get("--match")
    if not match:
        print("--match <metric> required", file=sys.stderr)
        return 1
    dur_ms = int(flags.get("--duration", 3_600_000))
    t_ms = int(flags.get("--time", 1 << 60))
    spark = _spark()
    eng = PromQLEngine(spark, read_samples(spark, store))
    if t_ms == 1 << 60:
        t_ms = eng.samples.agg(F.max("t")).first()[0] or 0
    # matrix of raw samples over the window
    win = eng.instant_query(f"{match}_bucket[{dur_ms}ms]", t_ms)
    print("Bucket stats for each histogram series over time")
    print("------------------------------------------------")
    print("min/avg/max populated buckets [/total when different]\n")

    # classic: de-cumulate adjacent le buckets per (series-minus-le, t)
    from prometheus_spark.model.labels import sig_sql

    no_le = "map_filter(labels, (k, v) -> k != 'le' AND k != '__name__')"
    classic = (
        win.filter("element_at(labels, 'le') IS NOT NULL")
        .selectExpr(
            sig_sql(no_le) + " AS gsig",
            no_le + " AS glabels",
            "t",
            "CAST(element_at(labels, 'le') AS DOUBLE) AS le",
            "value",
        )
        .selectExpr(
            "*",
            "value - coalesce(lag(value) OVER "
            "(PARTITION BY gsig, t ORDER BY le), 0.0D) AS bucket_count",
        )
        .groupBy("gsig", "t")
        .agg(
            F.expr("first(glabels)").alias("glabels"),
            F.expr("sum(CAST(bucket_count != 0.0D AS INT))").alias("pop"),
            F.expr("count(*)").alias("nbuckets"),
        )
        .groupBy("gsig")
        .agg(
            F.expr("first(glabels)").alias("glabels"),
            F.expr("min(pop)").alias("minp"),
            F.expr("avg(pop)").alias("avgp"),
            F.expr("max(pop)").alias("maxp"),
            F.expr("max(nbuckets)").alias("total"),
            F.expr("count(*)").alias("nsamples"),
        )
        .filter("nsamples >= 2")
    )
    rows = classic.collect()
    for r in sorted(rows, key=lambda r: r["gsig"]):
        lbls = ", ".join(f'{k}="{v}"' for k, v in sorted(r["glabels"].items()))
        stat = f"{r['minp']}/{r['avgp']:.3f}/{r['maxp']}"
        if r["maxp"] != r["total"]:
            stat += f"/{r['total']}"
        print(f"- {match}_bucket{{{lbls}}} (classic): {stat}")

    # native: populated sparse buckets per histogram sample
    nat = eng.instant_query(f"{match}[{dur_ms}ms]", t_ms)
    if "hist" in nat.columns:
        nstats = (
            nat.filter("hist IS NOT NULL")
            .selectExpr(
                "sig", "labels",
                "size(filter(hist.pos_buckets, b -> b != 0.0D)) "
                "+ size(filter(hist.neg_buckets, b -> b != 0.0D)) "
                "+ CAST(hist.zero_count != 0.0D AS INT) AS pop",
            )
            .groupBy("sig")
            .agg(
                F.expr("first(labels)").alias("labels"),
                F.expr("min(pop)").alias("minp"),
                F.expr("avg(pop)").alias("avgp"),
                F.expr("max(pop)").alias("maxp"),
                F.expr("count(*)").alias("nsamples"),
            )
            .filter("nsamples >= 2")
        )
        for r in sorted(nstats.collect(), key=lambda r: r["sig"]):
            lbls = ", ".join(
                f'{k}="{v}"' for k, v in sorted(r["labels"].items())
                if k != "__name__"
            )
            print(
                f"- {match}{{{lbls}}} (native): "
                f"{r['minp']}/{r['avgp']:.3f}/{r['maxp']}"
            )
    return 0


def check_server(kind: str, url: str) -> int:
    """cmd/promtool check healthy/ready (main.go:149-156): GET the
    lifecycle endpoint and report."""
    import urllib.request

    path = "/-/healthy" if kind == "healthy" else "/-/ready"
    try:
        with urllib.request.urlopen(url.rstrip("/") + path, timeout=10) as r:
            body = r.read().decode().strip()
            print(f"  SUCCESS: {body}")
            return 0
    except Exception as e:  # noqa: BLE001 — CLI surface
        print(f"  FAILED: {e}", file=sys.stderr)
        return 1


def check_web_config(files: list[str]) -> int:
    """cmd/promtool check web-config: validate exporter-toolkit web
    config files — YAML shape, known top-level keys, TLS cert/key pair
    presence and file existence, basic-auth bcrypt-looking hashes."""
    import yaml as _yaml

    known = {"tls_server_config", "http_server_config", "basic_auth_users"}
    rc = 0
    for f in files:
        try:
            with open(f) as fh:
                doc = _yaml.safe_load(fh) or {}
            if not isinstance(doc, dict):
                raise ValueError("top level must be a mapping")
            unknown = set(doc) - known
            if unknown:
                raise ValueError(f"unknown fields: {sorted(unknown)}")
            tls = doc.get("tls_server_config") or {}
            cert, key = tls.get("cert_file", ""), tls.get("key_file", "")
            if bool(cert) != bool(key):
                raise ValueError(
                    "TLS config must set both cert_file and key_file"
                )
            base = os.path.dirname(os.path.abspath(f))
            for p in (cert, key):
                if p:
                    full = p if os.path.isabs(p) else os.path.join(base, p)
                    if not os.path.exists(full):
                        raise ValueError(f"missing file {p!r}")
            for user, h in (doc.get("basic_auth_users") or {}).items():
                if not str(h).startswith(("$2a$", "$2b$", "$2y$")):
                    raise ValueError(
                        f"basic_auth_users[{user!r}]: not a bcrypt hash"
                    )
        except Exception as e:  # noqa: BLE001 — CLI surface
            print(f"  FAILED: {f}: {e}")
            rc = 1
            continue
        print(f"  SUCCESS: {f}")
    return rc


def check_sd(config_file: str, job_name: str) -> int:
    """cmd/promtool check service-discovery (sd.go:41 CheckSD): run the
    job's discovery providers once and print per-target JSON with the
    pre-relabel (discovered) and post-relabel label sets."""
    import json

    from prometheus_spark.config import load_config
    from prometheus_spark.sources.discovery import (
        DNSDiscovery,
        FileDiscovery,
        HTTPDiscovery,
        StaticDiscovery,
        TargetGroup,
        sd_check,
    )

    cfg = load_config(config_file)
    jobcfg = next(
        (j for j in cfg.scrape_jobs if j.job_name == job_name), None
    )
    if jobcfg is None:
        jobs = ", ".join(j.job_name for j in cfg.scrape_jobs)
        print(f"Job {job_name!r} not found. Select one of: {jobs}",
              file=sys.stderr)
        return 1
    groups: list = []
    if jobcfg.static_groups:
        groups += StaticDiscovery(
            [TargetGroup(g["targets"], g["labels"]) for g in jobcfg.static_groups]
        ).refresh()
    for fs in jobcfg.file_sd:
        groups += FileDiscovery(fs["files"]).refresh()
    for hs in jobcfg.http_sd:
        groups += HTTPDiscovery(hs["url"]).refresh()
    for ds in jobcfg.dns_sd:
        groups += DNSDiscovery(ds["names"], ds["type"], ds["port"]).refresh()
    print(json.dumps(sd_check(jobcfg, groups), indent=2))
    return 0


def _go_g(v: float) -> str:
    """Go ``%g`` (strconv.FormatFloat 'g', -1): shortest round-trip form
    with Go's exponent switch-over."""
    import math

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e21:
        s = repr(v)
        return s[:-2] if s.endswith(".0") else s
    return repr(v)


def _labels_go(labels: dict) -> str:
    """labels.Labels.String(): ``{a="b", c="d"}`` sorted by name."""
    inner = ", ".join(f'{k}="{labels[k]}"' for k in sorted(labels))
    return "{" + inner + "}"


def _is_native_block_dir(store: str) -> bool:
    """A reference-format data dir: either one block (index file at the
    top) or a directory of ULID block dirs each holding an index."""
    import glob as _glob

    return os.path.exists(os.path.join(store, "index")) or bool(
        _glob.glob(os.path.join(store, "*", "index"))
    )


def _read_store(spark, store: str):
    """Dispatch on layout: reference-native TSDB blocks are read via
    the index/chunk codec (storage.tsdb_block); otherwise the parquet
    block store."""
    import glob as _glob

    from prometheus_spark.storage import read_block, read_samples

    if os.path.exists(os.path.join(store, "index")):
        return read_block(spark, store)
    native = sorted(
        os.path.dirname(p)
        for p in _glob.glob(os.path.join(store, "*", "index"))
    )
    if native:
        df = read_block(spark, native[0])
        for b in native[1:]:
            df = df.unionByName(read_block(spark, b))
        return df
    return read_samples(spark, store)


def _dump_frame(store: str, flags: dict):
    from pyspark.sql import functions as F

    from prometheus_spark.engine.selectors import matcher_predicate
    from prometheus_spark.parser import parse_expr

    spark = _spark()
    df = _read_store(spark, store)
    match = flags.get("--match")
    if match:
        node = parse_expr(match)
        df = df.filter(matcher_predicate(node.matchers, df.columns))
    if "--min-time" in flags:
        df = df.filter(F.col("t") >= int(flags["--min-time"]))
    if "--max-time" in flags:
        # reference dump range is [mint, maxt) (tsdb.go dumpSamples)
        df = df.filter(F.col("t") < int(flags["--max-time"]))
    return df.filter(~F.col("stale"))


def tsdb_dump(store: str, flags: dict) -> int:
    """cmd/promtool tsdb dump (tsdb.go:760): one line per sample,
    ``{labels} value ts``; toLocalIterator keeps the driver bounded."""
    df = _dump_frame(store, flags)
    for r in df.orderBy("sig", "t").toLocalIterator():
        if r["value"] is None:
            continue  # histogram rendering is dump-openmetrics' job
        print(f"{_labels_go(dict(r['labels']))} {_go_g(r['value'])} {r['t']}")
    return 0


def tsdb_dump_openmetrics(store: str, flags: dict) -> int:
    """cmd/promtool tsdb dump-openmetrics (tsdb.go:829):
    ``name{labels} value ts_seconds`` + ``# EOF``, excluding native
    histograms and staleness markers (not representable)."""
    df = _dump_frame(store, flags)
    for r in df.orderBy("sig", "t").toLocalIterator():
        if r["value"] is None:
            continue
        labels = dict(r["labels"])
        name = labels.pop("__name__", "")
        lstr = _labels_go(labels) if labels else ""
        print(f"{name}{lstr} {_go_g(r['value'])} {r['t'] / 1000.0:.3f}")
    print("# EOF")
    return 0


def tsdb_bench_write(out: str, flags: dict) -> int:
    """cmd/promtool tsdb bench write (tsdb.go:67 benchmarkWrite): ingest
    ``--metrics`` synthetic series × ``--scrapes`` scrape rounds into a
    fresh store and report per-stage wall times.  The generation and
    write are fully distributed (range() → samples frame → partitioned
    parquet) — nothing materializes on the driver."""
    import time

    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import sig_expr
    from prometheus_spark.storage import write_samples

    n_metrics = int(flags.get("--metrics", 10_000))
    n_scrapes = int(flags.get("--scrapes", 100))
    interval_ms = 15_000
    spark = _spark()

    def stage(name, fn):
        t0 = time.monotonic()
        print(f">> start stage={name}")
        res = fn()
        print(f">> completed stage={name} duration={time.monotonic() - t0:.3f}s")
        return res

    def gen():
        series = spark.range(n_metrics).selectExpr(
            "id AS m",
            "map('__name__', concat('bench_metric_', CAST(id AS STRING)), "
            "'job', 'bench', 'instance', "
            "concat('host-', CAST(id % 100 AS STRING))) AS labels",
        )
        scrapes = spark.range(n_scrapes).selectExpr(
            f"CAST(id * {interval_ms} AS BIGINT) AS t"
        )
        return (
            series.crossJoin(scrapes)
            .select(
                sig_expr("labels").alias("sig"),
                F.expr("element_at(labels, '__name__')").alias("name"),
                "labels",
                "t",
                (F.col("m") + F.col("t") / 1000.0).cast("double").alias("value"),
                F.lit(False).alias("stale"),
            )
        )

    df = stage("generate", gen)
    stage("ingestScrapes", lambda: write_samples(df, out))
    total = stage("count", lambda: _spark().read.parquet(out).count())
    print(f"ingested {total} samples ({n_metrics} series x {n_scrapes} scrapes)")
    return 0


def push_metrics(url: str, files: list[str], flags: dict) -> int:
    """cmd/promtool push metrics (main.go:226): parse exposition-format
    files and push them via remote-write (v1, or v2 with --v2)."""
    import time

    from prometheus_spark.sources.promtext import parse_exposition_text
    from prometheus_spark.sources.remote_write import (
        send_write_request,
        send_write_request_v2,
    )

    now_ms = int(time.time() * 1000)
    rows: list = []
    for path in files:
        with open(path) as f:
            rows.extend(parse_exposition_text(f.read(), now_ms))
    rows = [(labels, t, v) for labels, t, v in rows if not isinstance(v, dict)]
    send = send_write_request_v2 if "--v2" in flags else send_write_request
    try:
        status = send(url, rows)
    except Exception as e:  # noqa: BLE001 — CLI surface
        print(f"FAILED: {e}", file=sys.stderr)
        return 1
    print(f"SUCCESS: {len(rows)} samples pushed (HTTP {status})")
    return 0


def main(argv: list[str]) -> int:
    if len(argv) >= 3 and argv[0] == "check" and argv[1] == "rules":
        return check_rules(argv[2:])
    if len(argv) >= 2 and argv[0] == "check" and argv[1] == "metrics":
        return check_metrics()
    if len(argv) >= 3 and argv[0] == "check" and argv[1] == "config":
        return check_config(argv[2:])
    if len(argv) >= 4 and argv[0] == "check" and argv[1] == "service-discovery":
        return check_sd(argv[2], argv[3])
    if len(argv) >= 3 and argv[0] == "check" and argv[1] in ("healthy", "ready"):
        return check_server(argv[1], argv[2])
    if len(argv) >= 3 and argv[0] == "check" and argv[1] == "web-config":
        return check_web_config(argv[2:])
    if len(argv) >= 3 and argv[0] == "test" and argv[1] == "rules":
        return test_rules(argv[2:])
    if (len(argv) >= 5 and argv[0] == "tsdb"
            and argv[1] == "create-blocks-from" and argv[2] == "openmetrics"):
        return tsdb_import_openmetrics(argv[3], argv[4])
    if (len(argv) >= 6 and argv[0] == "tsdb"
            and argv[1] == "create-blocks-from" and argv[2] == "rules"):
        flags = dict(zip(argv[6::2], argv[7::2]))
        return tsdb_import_rules(argv[3], argv[4], argv[5], flags)
    if len(argv) >= 3 and argv[0] == "tsdb" and argv[1] == "dump":
        flags = dict(zip(argv[3::2], argv[4::2]))
        return tsdb_dump(argv[2], flags)
    if len(argv) >= 3 and argv[0] == "tsdb" and argv[1] == "dump-openmetrics":
        flags = dict(zip(argv[3::2], argv[4::2]))
        return tsdb_dump_openmetrics(argv[2], flags)
    if (len(argv) >= 4 and argv[0] == "tsdb" and argv[1] == "bench"
            and argv[2] == "write"):
        flags = dict(zip(argv[4::2], argv[5::2]))
        return tsdb_bench_write(argv[3], flags)
    if len(argv) >= 3 and argv[0] == "debug":
        out = argv[4] if len(argv) > 4 and argv[3] == "--output" else "debug.tar.gz"
        return debug(argv[1], argv[2], out)
    if len(argv) >= 4 and argv[0] == "push" and argv[1] == "metrics":
        flags = {a: "" for a in argv[2:] if a.startswith("--")}
        pos = [a for a in argv[2:] if not a.startswith("--")]
        return push_metrics(pos[0], pos[1:], flags)
    if len(argv) >= 3 and argv[0] == "tsdb" and argv[1] in ("blocks", "list"):
        # the reference names this subcommand ``tsdb list`` (main.go:269)
        return tsdb_blocks(argv[2])
    if len(argv) >= 2 and argv[0] == "tsdb" and argv[1] == "analyze" and len(argv) >= 3:
        return tsdb_analyze(argv[2], int(argv[3]) if len(argv) > 3 else 10)
    if len(argv) >= 4 and argv[0] == "query" and argv[1] in ("instant", "range"):
        flags = dict(zip(argv[4::2], argv[5::2]))
        return query(argv[1], argv[2], argv[3], flags)
    if len(argv) >= 4 and argv[0] == "query" and argv[1] == "series":
        pos = [a for a in argv[3:] if not a.startswith("--")]
        flags = dict(zip(
            [a for a in argv[3:] if a.startswith("--")],
            [argv[3:][i + 1] for i, a in enumerate(argv[3:]) if a.startswith("--")],
        ))
        return query_series(argv[2], pos, flags)
    if len(argv) >= 4 and argv[0] == "query" and argv[1] == "labels":
        flags = dict(zip(argv[4::2], argv[5::2]))
        return query_labels(argv[2], argv[3], flags)
    if len(argv) >= 3 and argv[0] == "query" and argv[1] == "analyze":
        flags = dict(zip(argv[3::2], argv[4::2]))
        return query_analyze(argv[2], flags)
    if len(argv) >= 3 and argv[0] == "promql" and argv[1] == "format":
        return promql_format(argv[2])
    if (len(argv) >= 5 and argv[0] == "promql" and argv[1] == "label-matchers"
            and argv[2] in ("set", "delete")):
        rest = [a for a in argv[3:] if not a.startswith("-")]
        mtype = "="
        if "-t" in argv:
            mtype = argv[argv.index("-t") + 1]
            rest = [a for a in rest if a != mtype]
        if argv[2] == "set":
            return promql_label_matchers(
                "set", rest[0], rest[1], rest[2] if len(rest) > 2 else "", mtype
            )
        return promql_label_matchers("delete", rest[0], rest[1])
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
