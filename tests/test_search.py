"""Search API tests — scorer parity against the reference's own golden
values (util/strutil/subsequence_test.go) and endpoint behavior."""

import pytest

from prometheus_spark.web.search import (
    build_search_filter,
    jaro_winkler_score,
    run_search,
    subsequence_score,
    substring_score,
)

S = 0.999  # subsequenceNonExactScoreScale


# golden cases from /root/reference/util/strutil/subsequence_test.go:108
@pytest.mark.parametrize("pattern,text,want", [
    ("", "anything", 1.0),
    ("abc", "", 0.0),
    ("my awesome text", "my awesome text", 1.0),
    ("my", "my awesome text", 107.0 / 120.0 * S),
    ("tex", "my awesome text", 247.0 / 270.0 * S),
    ("met", "my awesome text", 43.0 / 90.0 * S),
    ("bac", "babac", 43.0 / 45.0 * S),
    ("handler1", "handler10", 1149849.0 / 1152000.0),
    ("éàü", "éàü", 1.0),
    ("éà", "éàü", 23.0 / 24.0 * S),
    ("üé", "éàü", 0.0),
    ("éàx", "éàü", 0.0),
    ("éü", "éàü", 5.0 / 12.0 * S),
    ("aé", "aéb", 23.0 / 24.0 * S),
    ("a", "a", 1.0),
    ("oa", "goat", 29.0 / 32.0 * S),
    ("abaa", "abbaa", 39.0 / 80.0 * S),
    ("abcd", "abc", 0.0),
    ("pro", "prometheus", 173.0 / 180.0 * S),
])
def test_subsequence_score_reference_golden(pattern, text, want):
    assert subsequence_score(pattern, text) == pytest.approx(want, abs=1e-9)


def test_substring_score():
    assert substring_score("", "x") == (True, 1.0)
    assert substring_score("http", "http_requests") == (True, 1.0)  # prefix
    ok, s = substring_score("req", "http_requests")
    assert ok and 0.1 <= s < 1.0
    assert substring_score("zzz", "http")[0] is False


def test_jaro_winkler():
    assert jaro_winkler_score("abc", "abc") == 1.0
    assert jaro_winkler_score("", "abc") == 0.0
    # prefix boost: martha/marhta is the textbook JW example ≈ 0.9611
    assert jaro_winkler_score("martha", "marhta") == pytest.approx(
        0.9611, abs=1e-4
    )


def test_filter_or_combination_and_case_folding():
    f = build_search_filter(["http", "node"], case_sensitive=False)
    ok, score = f("HTTP_requests_total")
    assert ok and score == 1.0  # case-folded prefix
    assert f("process_cpu")[0] is False
    # best score across terms wins (search_filters.go:276)
    ok, s = build_search_filter(["xyz", "up"])("up")
    assert ok and s == 1.0


def test_run_search_batching_and_trailer():
    vals = [f"metric_{i:02d}" for i in range(25)]
    lines = run_search(vals, searches=[], limit=10, batch_size=4)
    assert lines[-1] == {"status": "success", "has_more": True}
    results = [r for ln in lines[:-1] for r in ln["results"]]
    assert len(results) == 10
    assert [len(ln["results"]) for ln in lines[:-1]] == [4, 4, 2]
    # empty result still emits a first batch (stream contract)
    lines = run_search([], searches=["nope"], limit=10)
    assert lines == [{"results": []},
                     {"status": "success", "has_more": False}]


def test_run_search_score_ordering():
    lines = run_search(
        ["zz_http", "http_total", "ahttpx"], searches=["http"],
        sort_by="score", include_score=True, result_key="name",
    )
    names = [r["name"] for r in lines[0]["results"]]
    assert names[0] == "http_total"  # prefix = 1.0 first
    scores = [r["score"] for r in lines[0]["results"]]
    assert scores == sorted(scores, reverse=True)


@pytest.fixture()
def api(spark):
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import samples_from_rows
    from prometheus_spark.web import PromAPI

    rows = []
    for name in ("http_requests_total", "http_errors_total", "node_load1"):
        rows.append(({"__name__": name, "job": "api", "env": "prod"},
                     60_000, 1.0))
    samples = samples_from_rows(spark, rows).cache()
    return PromAPI(PromQLEngine(spark, samples),
                   metadata={"http_requests_total":
                             {"type": "counter", "help": "reqs", "unit": ""}})


def test_search_metric_names_endpoint(api):
    code, resp = api.handle(
        "/api/v1/search/metric_names",
        {"search[]": ["http"], "include_score": ["true"],
         "include_metadata": ["true"], "sort_by": ["score"]},
    )
    assert code == 200
    lines = resp["__ndjson__"]
    assert lines[-1]["status"] == "success"
    names = [r["name"] for ln in lines[:-1] for r in ln["results"]]
    assert set(names) == {"http_requests_total", "http_errors_total"}
    md = {r["name"]: r for ln in lines[:-1] for r in ln["results"]}
    assert md["http_requests_total"]["type"] == "counter"
    assert "score" in md["http_requests_total"]


def test_search_label_names_and_values(api):
    code, resp = api.handle("/api/v1/search/label_names",
                            {"search[]": ["j"]})
    names = [r["name"] for ln in resp["__ndjson__"][:-1]
             for r in ln["results"]]
    assert "job" in names
    code, resp = api.handle(
        "/api/v1/search/label_values",
        {"label": ["job"], "search[]": ["ap"]},
    )
    vals = [r["value"] for ln in resp["__ndjson__"][:-1]
            for r in ln["results"]]
    assert vals == ["api"]
    # missing label param errors
    code, resp = api.handle("/api/v1/search/label_values", {})
    assert code == 400


def test_search_param_validation(api):
    code, _ = api.handle("/api/v1/search/metric_names",
                         {"fuzz_threshold": ["200"]})
    assert code == 400
    code, _ = api.handle("/api/v1/search/metric_names",
                         {"fuzz_alg": ["soundex"]})
    assert code == 400
    code, _ = api.handle("/api/v1/search/metric_names",
                         {"sort_by": ["score"]})
    assert code == 400  # requires search[]
    code, _ = api.handle("/api/v1/search/metric_names",
                         {"sort_dir": ["asc"]})
    assert code == 400  # sort_dir without sort_by
