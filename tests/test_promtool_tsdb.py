"""promtool ``tsdb`` command family — backfill + dump parity.

Mirrors the reference's ``TestBackfill`` (cmd/promtool/backfill_test.go:88):
same OpenMetrics inputs, same expected samples, same min/max timestamps,
same 2h-aligned block counts (our block = the ``t_bucket`` parquet
partition, DefaultBlockDuration-aligned by construction), same error
cases.  Plus CLI round-trips for ``tsdb create-blocks-from openmetrics``,
``tsdb list``, ``tsdb analyze`` and ``tsdb dump``
(cmd/promtool/tsdb_test.go TestTSDBDump)."""

import importlib.util
import math
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
BLOCK_MS = 7_200_000  # tsdb.DefaultBlockDuration


def _promtool():
    spec = importlib.util.spec_from_file_location(
        "promtool", TOOLS / "promtool.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _backfill(spark, text, path, bucket_ms=BLOCK_MS):
    from prometheus_spark.storage.backfill import backfill_openmetrics

    return backfill_openmetrics(spark, text, str(path), bucket_ms=bucket_ms)


def _read_all(spark, path):
    df = spark.read.parquet(str(path))
    return sorted(
        ((r["t"], r["value"], tuple(sorted(r["labels"].items())))
         for r in df.collect())
    )


# (description, text, n_blocks, min_t, max_t, samples[(t, v, labels)])
# — transcribed from TestBackfill's IsOk cases
OK_CASES = [
    (
        "multiple samples, different ts, different series",
        '# HELP http_requests_total The total number of HTTP requests.\n'
        '# TYPE http_requests_total counter\n'
        'http_requests_total{code="200"} 1021 1565133713.989\n'
        'http_requests_total{code="400"} 1 1565133713.990\n'
        '# EOF\n',
        1, 1565133713989, 1565133713990,
        [(1565133713989, 1021.0, {"__name__": "http_requests_total", "code": "200"}),
         (1565133713990, 1.0, {"__name__": "http_requests_total", "code": "400"})],
    ),
    (
        "multiple samples separated by 3 days",
        '# TYPE http_requests_total counter\n'
        'http_requests_total{code="200"} 1021 1565133713.989\n'
        'http_requests_total{code="200"} 1022 1565392913.989\n'
        'http_requests_total{code="200"} 1023 1565652113.989\n'
        '# EOF\n',
        3, 1565133713989, 1565652113989,
        [(1565133713989, 1021.0, {"__name__": "http_requests_total", "code": "200"}),
         (1565392913989, 1022.0, {"__name__": "http_requests_total", "code": "200"}),
         (1565652113989, 1023.0, {"__name__": "http_requests_total", "code": "200"})],
    ),
    (
        "unordered samples from multiple series in different blocks",
        '# TYPE go info\n'
        'go_info{version="go1.15.3"} 1 1565392913.989\n'
        '# TYPE http_requests_total counter\n'
        'http_requests_total{code="200"} 1021 1565133713.989\n'
        '# EOF\n',
        2, 1565133713989, 1565392913989,
        [(1565133713989, 1021.0, {"__name__": "http_requests_total", "code": "200"}),
         (1565392913989, 1.0, {"__name__": "go_info", "version": "go1.15.3"})],
    ),
    (
        "multiple samples, same series",
        '# TYPE http_requests_total counter\n'
        'http_requests_total{code="200"} 1021 1565133713.989\n'
        'http_requests_total{code="200"} 1 1565133714.989\n'
        'http_requests_total{code="400"} 2 1565133715.989\n'
        '# EOF\n',
        1, 1565133713989, 1565133715989,
        [(1565133713989, 1021.0, {"__name__": "http_requests_total", "code": "200"}),
         (1565133714989, 1.0, {"__name__": "http_requests_total", "code": "200"}),
         (1565133715989, 2.0, {"__name__": "http_requests_total", "code": "400"})],
    ),
    (
        "samples ending up in four blocks",
        '# TYPE http_requests_total counter\n'
        'http_requests_total{code="200"} 1021 1565133713.989\n'
        'http_requests_total{code="200"} 1022 1565144513.989\n'
        'http_requests_total{code="400"} 2 1565155313.989\n'
        'http_requests_total{code="400"} 1 1565166113.989\n'
        '# EOF\n',
        4, 1565133713989, 1565166113989, None,
    ),
    (
        "bare sample, no HELP/TYPE",
        'bare_metric 42.24 1001\n# EOF\n',
        1, 1001000, 1001000,
        [(1001000, 42.24, {"__name__": "bare_metric"})],
    ),
    (
        "sample without newline after # EOF",
        'no_newline_after_eof 42 6900\n# EOF',
        1, 6900000, 6900000,
        [(6900000, 42.0, {"__name__": "no_newline_after_eof"})],
    ),
]


@pytest.mark.parametrize(
    "desc,text,n_blocks,min_t,max_t,samples",
    OK_CASES, ids=[c[0] for c in OK_CASES],
)
def test_backfill_ok(spark, tmp_path, desc, text, n_blocks, min_t, max_t,
                     samples):
    out = tmp_path / "store"
    n = _backfill(spark, text, out)
    got = _read_all(spark, out)
    assert n == len(got)
    assert got[0][0] == min_t and got[-1][0] == max_t
    # block = 2h-aligned t_bucket partition (tsdb.DefaultBlockDuration)
    buckets = {t // BLOCK_MS for t, _, _ in got}
    assert len(buckets) == n_blocks
    df = spark.read.parquet(str(out))
    assert df.select("t_bucket").distinct().count() == n_blocks
    if samples is not None:
        want = sorted(
            (t, v, tuple(sorted(ls.items()))) for t, v, ls in samples
        )
        assert got == want


def test_backfill_empty_file(spark, tmp_path):
    out = tmp_path / "store"
    assert _backfill(spark, "# EOF\n", out) == 0
    assert not out.exists()  # zero blocks


def test_backfill_long_block_duration(spark, tmp_path):
    """MaxBlockDuration analogue: a wider bucket_ms puts a month of data
    into one block (backfill_test.go 'Long maximum block duration')."""
    text = (
        '# TYPE http_requests_total counter\n'
        'http_requests_total{code="200"} 1021 1624463088.000\n'
        'http_requests_total{code="200"} 1 1627055153.000\n'
        'http_requests_total{code="400"} 2 1627056153.000\n'
        '# EOF\n'
    )
    out = tmp_path / "store"
    _backfill(spark, text, out, bucket_ms=2048 * 3600 * 1000)
    assert spark.read.parquet(str(out)).select("t_bucket").distinct().count() == 1


def test_backfill_external_labels(spark, tmp_path):
    from prometheus_spark.storage.backfill import backfill_openmetrics

    text = ('# TYPE http_requests_total counter\n'
            'http_requests_total{code="200"} 1021 1565133713.989\n# EOF\n')
    out = tmp_path / "store"
    backfill_openmetrics(spark, text, str(out),
                         extra_labels={"cluster_id": "123", "org_id": "999"})
    got = _read_all(spark, out)
    labels = dict(got[0][2])
    assert labels["cluster_id"] == "123" and labels["org_id"] == "999"


ERR_CASES = [
    ("does not have timestamp",
     '# HELP rpc_duration_seconds A summary of the RPC duration.\n'
     '# TYPE rpc_duration_seconds summary\n'
     'rpc_duration_seconds{quantile="0.01"} 3102\n# EOF\n'),
    ("bad type information",
     '# HELP bad_metric This a bad metric\n'
     '# TYPE bad_metric invalid_type\n'
     'bad_metric{type="has no type information"} 0.0001 111\n# EOF\n'),
    ("no newline",
     '# HELP no_nl This test has no newline so will fail\n'
     '# TYPE no_nl gauge\n'
     'no_nl{type="no newline"} 0.0001 111'),
    ("no EOF",
     '# HELP no_eof This test has no EOF so will fail\n'
     '# TYPE no_eof gauge\n'
     'no_eof 1 1\n'),
    ("data after EOF",
     '# HELP after_eof There is data after EOF.\n'
     '# TYPE after_eof gauge\n'
     'after_eof 1 1\n# EOF\n'
     'after_eof 1 2\n'),
]


@pytest.mark.parametrize("desc,text", ERR_CASES, ids=[c[0] for c in ERR_CASES])
def test_backfill_errors(spark, tmp_path, desc, text):
    with pytest.raises(ValueError):
        _backfill(spark, text, tmp_path / "store")


# ---------------------------------------------------------------------
# CLI round-trips (cmd/promtool/tsdb_test.go TestTSDBDump and friends)

def test_cli_tsdb_roundtrip(spark, tmp_path, capsys, monkeypatch):
    pt = _promtool()
    monkeypatch.setattr(pt, "_spark", lambda: spark)

    om = tmp_path / "in.om"
    om.write_text(
        '# TYPE metric gauge\n'
        'metric{foo="bar", baz="abc"} 1 60\n'
        'metric{foo="bar", baz="abc"} 2 120\n'
        'metric{foo="bar", baz="abc"} 3 180\n'
        '# TYPE heavy_metric gauge\n'
        'heavy_metric{foo="bar"} 5 60\n'
        'heavy_metric{foo="foo"} 5 60\n'
        '# EOF\n'
    )
    store = tmp_path / "store"
    assert pt.main(["tsdb", "create-blocks-from", "openmetrics",
                    str(om), str(store)]) == 0
    assert "SUCCESS" in capsys.readouterr().out

    # tsdb list: one 2h block
    assert pt.main(["tsdb", "list", str(store)]) == 0
    out = capsys.readouterr().out
    assert "t_bucket=0" in out

    # tsdb analyze: counts + label cardinality
    assert pt.main(["tsdb", "analyze", str(store)]) == 0
    out = capsys.readouterr().out
    assert "Samples: 5" in out and "Series: 3" in out
    assert "foo" in out

    # tsdb dump: every sample in the Go dump line format, and the
    # matcher + mint/maxt filters behave like TestTSDBDump's cases
    assert pt.main(["tsdb", "dump", str(store)]) == 0
    dump_all = capsys.readouterr().out
    assert len([ln for ln in dump_all.splitlines() if ln.strip()]) == 5

    assert pt.main(["tsdb", "dump", str(store),
                    "--match", '{__name__="metric"}',
                    "--min-time", "60000", "--max-time", "120000"]) == 0
    dump_win = capsys.readouterr().out
    lines = [ln for ln in dump_win.splitlines() if ln.strip()]
    # dump window is [mint, maxt): sample at 120000 excluded
    assert len(lines) == 1 and "60000" in lines[0]

    # dump-openmetrics → backfill round-trip (TestTSDBDumpOpenMetricsRoundTrip)
    assert pt.main(["tsdb", "dump-openmetrics", str(store)]) == 0
    om2 = capsys.readouterr().out
    assert om2.rstrip("\n").endswith("# EOF")
    store2 = tmp_path / "store2"
    from prometheus_spark.storage.backfill import backfill_openmetrics

    backfill_openmetrics(spark, om2, str(store2))
    a = _read_all(spark, store)
    b = _read_all(spark, store2)
    assert a == b
