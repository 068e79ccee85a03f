"""Golden parity for per-step query sample statistics.

Replays the expected-value tables of the reference's
``TestQueryStatistics`` (promql/engine_test.go:777) verbatim — the same
load block, the same queries, the same expected totalQueryableSamples /
totalQueryableSamplesPerStep / samplesRead / samplesReadPerStep /
peakSamples numbers."""

import pytest

from prometheus_spark.engine import PromQLEngine
from prometheus_spark.engine.stats import query_samples_stats
from prometheus_spark.storage import samples_from_rows
from prometheus_spark.testing.promqltest import LoadCmd, parse_test_text

LOAD = """
load 10s
  metricWith1SampleEvery10Seconds 1+1x100
  metricWith3SampleEvery10Seconds{a="1",b="1"} 1+1x100
  metricWith3SampleEvery10Seconds{a="2",b="2"} 1+1x100
  metricWith3SampleEvery10Seconds{a="3",b="2"} 1+1x100
  metricWith1HistogramEvery10Seconds {{schema:1 count:5 sum:20 buckets:[1 2 1 1]}}+{{schema:1 count:10 sum:5 buckets:[1 2 3 4]}}x100
"""


@pytest.fixture(scope="module")
def engine(spark):
    rows = []
    for cmd in parse_test_text(LOAD):
        assert isinstance(cmd, LoadCmd)
        for s in cmd.series:
            for idx, v in s.points:
                if v is None or (isinstance(v, str) and v == "stale"):
                    continue
                rows.append((s.labels, idx * cmd.interval_ms, v))
    return PromQLEngine(spark, samples_from_rows(spark, rows))


S = 1000  # seconds → ms

# (query, start_s, end_s, step_s, total, {t_ms: n}, read, {t_ms: n}, peak)
# end_s/step_s None → instant query.  Transcribed 1:1 from the
# reference's TestQueryStatistics cases (promql/engine_test.go:795+).
CASES = [
    ('"literal string"', 21, None, None, 0, {21000: 0}, 0, {21000: 0}, 0),
    ("1", 21, None, None, 0, {21000: 0}, 0, {21000: 0}, 1),
    ("metricWith1SampleEvery10Seconds", 21, None, None,
     1, {21000: 1}, 1, {21000: 1}, 1),
    ("metricWith1HistogramEvery10Seconds", 21, None, None,
     13, {21000: 13}, 13, {21000: 13}, 13),
    ("timestamp(metricWith1SampleEvery10Seconds)", 21, None, None,
     1, {21000: 1}, 1, {21000: 1}, 2),
    ("timestamp(metricWith1HistogramEvery10Seconds)", 21, None, None,
     1, {21000: 1}, 1, {21000: 1}, 2),
    ("metricWith1SampleEvery10Seconds", 22, None, None,
     1, {22000: 1}, 1, {22000: 1}, 1),
    ("metricWith1SampleEvery10Seconds offset 10s", 21, None, None,
     1, {21000: 1}, 1, {21000: 1}, 1),
    ("metricWith1SampleEvery10Seconds @ 15", 21, None, None,
     1, {21000: 1}, 1, {21000: 1}, 1),
    ('metricWith3SampleEvery10Seconds{a="1"}', 21, None, None,
     1, {21000: 1}, 1, {21000: 1}, 1),
    ('metricWith3SampleEvery10Seconds{a="1"} @ 19', 21, None, None,
     1, {21000: 1}, 1, {21000: 1}, 1),
    ('metricWith3SampleEvery10Seconds{a="1"}[20s] @ 19', 21, None, None,
     2, {21000: 2}, 2, {21000: 2}, 2),
    ("metricWith3SampleEvery10Seconds", 21, None, None,
     3, {21000: 3}, 3, {21000: 3}, 3),
    ("metricWith1SampleEvery10Seconds[60s]", 201, None, None,
     6, {201000: 6}, 6, {201000: 6}, 6),
    ("metricWith1HistogramEvery10Seconds[60s]", 201, None, None,
     78, {201000: 78}, 78, {201000: 78}, 78),
    ("max_over_time(metricWith1SampleEvery10Seconds[60s])[20s:5s]",
     201, None, None, 24, {201000: 24}, 8, {201000: 8}, 10),
    ("max_over_time(metricWith1SampleEvery10Seconds[61s])[20s:5s]",
     201, None, None, 26, {201000: 26}, 8, {201000: 8}, 11),
    ("max_over_time(metricWith1HistogramEvery10Seconds[60s])[20s:5s]",
     201, None, None, 312, {201000: 312}, 104, {201000: 104}, 78),
    ("metricWith1SampleEvery10Seconds[60s] @ 30", 201, None, None,
     4, {201000: 4}, 4, {201000: 4}, 4),
    ("metricWith1HistogramEvery10Seconds[60s] @ 30", 201, None, None,
     52, {201000: 52}, 52, {201000: 52}, 52),
    ("sum(max_over_time(metricWith3SampleEvery10Seconds[60s] @ 30))",
     201, None, None, 12, {201000: 12}, 12, {201000: 12}, 7),
    ("sum by (b) (max_over_time(metricWith3SampleEvery10Seconds[60s] @ 30))",
     201, None, None, 12, {201000: 12}, 12, {201000: 12}, 7),
    ("metricWith1SampleEvery10Seconds[60s] offset 10s", 201, None, None,
     6, {201000: 6}, 6, {201000: 6}, 6),
    ("metricWith3SampleEvery10Seconds[60s]", 201, None, None,
     18, {201000: 18}, 18, {201000: 18}, 18),
    ("max_over_time(metricWith1SampleEvery10Seconds[60s])", 201, None, None,
     6, {201000: 6}, 6, {201000: 6}, 7),
    ("absent_over_time(metricWith1SampleEvery10Seconds[60s])",
     201, None, None, 6, {201000: 6}, 6, {201000: 6}, 7),
    ("max_over_time(metricWith3SampleEvery10Seconds[60s])", 201, None, None,
     18, {201000: 18}, 18, {201000: 18}, 9),
    ("metricWith1SampleEvery10Seconds[60s:5s]", 201, None, None,
     12, {201000: 12}, 12, {201000: 12}, 12),
    ("metricWith1SampleEvery10Seconds[60s:5s] offset 10s", 201, None, None,
     12, {201000: 12}, 12, {201000: 12}, 12),
    ("max_over_time(metricWith3SampleEvery10Seconds[60s:5s])",
     201, None, None, 36, {201000: 36}, 36, {201000: 36}, 51),
    ("sum(max_over_time(metricWith3SampleEvery10Seconds[60s:5s])) + "
     "sum(max_over_time(metricWith3SampleEvery10Seconds[60s:5s]))",
     201, None, None, 72, {201000: 72}, 72, {201000: 72}, 52),
    ('metricWith3SampleEvery10Seconds{a="1"}', 201, 220, 5,
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1},
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1}, 4),
    ('metricWith3SampleEvery10Seconds{a="1"}', 204, 223, 5,
     4, {204000: 1, 209000: 1, 214000: 1, 219000: 1},
     4, {204000: 1, 209000: 1, 214000: 1, 219000: 1}, 4),
    ("metricWith1HistogramEvery10Seconds", 204, 223, 5,
     52, {204000: 13, 209000: 13, 214000: 13, 219000: 13},
     52, {204000: 13, 209000: 13, 214000: 13, 219000: 13}, 52),
    ("timestamp(metricWith1SampleEvery10Seconds)", 201, 220, 5,
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1},
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1}, 5),
    ("timestamp(metricWith1HistogramEvery10Seconds)", 201, 220, 5,
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1},
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1}, 5),
    ('max_over_time(metricWith3SampleEvery10Seconds{a="1"}[10s])',
     991, 1021, 10,
     2, {991000: 1, 1001000: 1, 1011000: 0, 1021000: 0},
     2, {991000: 1, 1001000: 1, 1011000: 0, 1021000: 0}, 2),
    ('metricWith3SampleEvery10Seconds{a="1"} offset 10s', 201, 220, 5,
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1},
     4, {201000: 1, 206000: 1, 211000: 1, 216000: 1}, 4),
    ("max_over_time(metricWith3SampleEvery10Seconds[60s] @ 30)", 201, 220, 5,
     48, {201000: 12, 206000: 12, 211000: 12, 216000: 12},
     12, {201000: 12, 206000: 0, 211000: 0, 216000: 0}, 12),
    ("metricWith3SampleEvery10Seconds", 201, 220, 5,
     12, {201000: 3, 206000: 3, 211000: 3, 216000: 3},
     12, {201000: 3, 206000: 3, 211000: 3, 216000: 3}, 12),
    ("max_over_time(metricWith3SampleEvery10Seconds[60s])", 201, 220, 5,
     72, {201000: 18, 206000: 18, 211000: 18, 216000: 18},
     21, {201000: 18, 206000: 0, 211000: 3, 216000: 0}, 18),
    ("max_over_time(metricWith3SampleEvery10Seconds[60s:5s])", 201, 220, 5,
     144, {201000: 36, 206000: 36, 211000: 36, 216000: 36},
     45, {201000: 36, 206000: 3, 211000: 3, 216000: 3}, 69),
    ("max_over_time(metricWith1SampleEvery10Seconds[60s:5s])", 201, 220, 5,
     48, {201000: 12, 206000: 12, 211000: 12, 216000: 12},
     15, {201000: 12, 206000: 1, 211000: 1, 216000: 1}, 31),
    ("sum by (b) (max_over_time(metricWith1SampleEvery10Seconds[60s:5s]))",
     201, 220, 5,
     48, {201000: 12, 206000: 12, 211000: 12, 216000: 12},
     15, {201000: 12, 206000: 1, 211000: 1, 216000: 1}, 31),
    ("sum(max_over_time(metricWith3SampleEvery10Seconds[60s:5s])) + "
     "sum(max_over_time(metricWith3SampleEvery10Seconds[60s:5s]))",
     201, 220, 5,
     288, {201000: 72, 206000: 72, 211000: 72, 216000: 72},
     90, {201000: 72, 206000: 6, 211000: 6, 216000: 6}, 73),
    ("sum(max_over_time(metricWith3SampleEvery10Seconds[60s:5s])) + "
     "sum(max_over_time(metricWith1SampleEvery10Seconds[60s:5s]))",
     201, 220, 5,
     192, {201000: 48, 206000: 48, 211000: 48, 216000: 48},
     60, {201000: 48, 206000: 4, 211000: 4, 216000: 4}, 69),
    # instant subquery: basic SamplesRead merging
    ("max_over_time(metricWith1SampleEvery10Seconds[20s:10s])",
     201, None, None, 2, {201000: 2}, 2, {201000: 2}, 5),
    # boundary: step == range, single inner evaluation
    ("sum_over_time(metricWith1SampleEvery10Seconds[30s:30s])",
     90, None, None, 1, {90000: 1}, 1, {90000: 1}, 3),
    # boundary: step > range, sparse sampling
    ("max_over_time(metricWith1SampleEvery10Seconds[30s:2m])",
     240, None, None, 1, {240000: 1}, 1, {240000: 1}, 3),
    # range + subquery, non-overlapping windows (step >= range)
    ("max_over_time(metricWith1SampleEvery10Seconds[30s:10s])", 201, 231, 30,
     6, {201000: 3, 231000: 3}, 6, {201000: 3, 231000: 3}, 11),
    # range + subquery, overlapping windows: windowed delta attribution
    ("max_over_time(metricWith1SampleEvery10Seconds[20s:10s])", 201, 261, 10,
     14, {201000: 2, 211000: 2, 221000: 2, 231000: 2, 241000: 2,
          251000: 2, 261000: 2},
     8, {201000: 2, 211000: 1, 221000: 1, 231000: 1, 241000: 1,
         251000: 1, 261000: 1}, 17),
    # range + subquery, outer step wider than subquery range (gap filter)
    ("max_over_time(metricWith1SampleEvery10Seconds[30s:10s])", 201, 261, 60,
     6, {201000: 3, 261000: 3}, 6, {201000: 3, 261000: 3}, 14),
    # histogram size counting in the subquery path
    ("histogram_count(max_over_time(metricWith1HistogramEvery10Seconds[20s:10s]))",
     201, None, None, 26, {201000: 26}, 26, {201000: 26}, 52),
    # histogram range query + subquery: histogram delta attribution
    ("avg_over_time(metricWith1HistogramEvery10Seconds[2m:1m])", 120, 240, 60,
     78, {120000: 26, 180000: 26, 240000: 26},
     52, {120000: 26, 180000: 13, 240000: 13}, 117),
    # multiple series + subquery: cardinality
    ("max_over_time(metricWith3SampleEvery10Seconds[60s:10s])", 200, 400, 30,
     126, {200000: 18, 230000: 18, 260000: 18, 290000: 18, 320000: 18,
           350000: 18, 380000: 18},
     72, {200000: 18, 230000: 9, 260000: 9, 290000: 9, 320000: 9,
          350000: 9, 380000: 9}, 99),
    # @ on a matrix selector under an at-unsafe function (not hoisted):
    # totals replay the frozen window; reads count once
    ("predict_linear(metricWith1SampleEvery10Seconds[60s] @ 100, 60)",
     100, 300, 100,
     18, {100000: 6, 200000: 6, 300000: 6},
     6, {100000: 6, 200000: 0, 300000: 0}, 12),
    # subquery with @
    ("sum_over_time(metricWith3SampleEvery10Seconds[20s:10s] @ 200)",
     250, None, None, 6, {250000: 6}, 6, {250000: 6}, 11),
    # subquery with offset
    ("sum_over_time(metricWith1SampleEvery10Seconds[20s:10s] offset 1m)",
     240, None, None, 2, {240000: 2}, 2, {240000: 2}, 5),
    # subquery with offset + @ combined
    ("sum_over_time(metricWith3SampleEvery10Seconds[1m:10s] @ 200 offset 1m)",
     300, None, None, 18, {300000: 18}, 18, {300000: 18}, 27),
    # nested subquery: recursive merging across two subquery levels
    ("sum_over_time(max_over_time(metricWith3SampleEvery10Seconds[60s] "
     "@ 300)[5m:1m] @ 600)[10m:2m]",
     800, None, None, 75, {800000: 75}, 18, {800000: 18}, 23),
    # outer subquery wrapping inner range-vector: SamplesRead > TotalSamples
    ("rate(sum_over_time(metricWith1SampleEvery10Seconds[30s])[1m:30s])",
     240, None, None, 2, {240000: 2}, 6, {240000: 6}, 5),
]


@pytest.mark.parametrize(
    "query,start,end,step,total,tps,read,rps,peak",
    CASES,
    ids=[f"{i}:{c[0][:48]}" for i, c in enumerate(CASES)],
)
def test_query_statistics(engine, query, start, end, step,
                          total, tps, read, rps, peak):
    if end is None:
        s = query_samples_stats(engine, query, start * S, start * S, 1)
    else:
        s = query_samples_stats(engine, query, start * S, end * S, step * S)
    got_tps = {int(t * 1000): n for t, n in s["totalQueryableSamplesPerStep"]}
    got_rps = {int(t * 1000): n for t, n in s["samplesReadPerStep"]}
    assert s["totalQueryableSamples"] == total, "TotalSamples mismatch"
    assert got_tps == tps, "Total samples per step mismatch"
    assert s["samplesRead"] == read, "SamplesRead mismatch"
    assert got_rps == rps, "Samples read per step mismatch"
    assert s["peakSamples"] == peak, "Peak samples mismatch"
