"""End-to-end worker-equivalent surface: URL in, reference-shaped JSON out."""

import json

import pytest

from edgesearch_spark.app import SearchApp
from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.corpus import generate_corpus


@pytest.fixture(scope="module")
def app(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("appidx"))
    build_index(spark, generate_corpus(spark, 300, seed=6), out, IndexConfig(),
                order_cols=("repo", "path", "commit"))
    return SearchApp(spark, out)


def test_search_request_roundtrip(app):
    r = app.handle_search("/search?t=0_import&t=2_error&c=0")
    assert r.status == 200
    body = json.loads(r.body)
    assert body["total"] > 0
    assert len(body["results"]) == min(50, body["total"])
    if body["total"] > 50:
        assert body["continuation"] == 50


def test_continuation_chain(app):
    r1 = json.loads(app.handle_search("/search?t=0_the").body)
    if r1["continuation"] is not None:
        r2 = json.loads(app.handle_search(f"/search?t=0_the&c={r1['continuation']}").body)
        assert r2["total"] == r1["total"]
        assert r1["results"] != r2["results"]


def test_malformed_400(app):
    r = app.handle_search("/search?t=9_bogus")
    assert r.status == 400 and json.loads(r.body)["error"] == "Malformed query"


def test_too_many_terms_413(app):
    url = "/search?" + "&".join(f"t=0_w{i}" for i in range(51))
    r = app.handle_search(url)
    assert r.status == 413 and json.loads(r.body)["error"] == "Too many terms"


def test_missing_require_no_results_shape(app):
    r = app.handle_search("/search?t=0_zzzznothere")
    assert r.status == 200
    assert json.loads(r.body) == {"results": [], "continuation": None, "total": 0}


def test_empty_query_default_results(app):
    body = json.loads(app.handle_search("/search?c=0").body)
    assert body["total"] == 300 and body["continuation"] == 50 and len(body["results"]) == 50


def test_scored_mode(app):
    body = json.loads(app.handle_search("/search?t=1_import&t=1_license", scored=True).body)
    assert body["total"] > 0 and body["results"]


def test_empty_intersection_uses_normal_envelope(app):
    """Only missing-REQUIRE gets the http.ts no-results byte shape; an empty
    boolean result (here require X + exclude X) streams the normal envelope
    with key order total/continuation/results."""
    r = app.handle_search("/search?t=0_import&t=2_import")
    assert r.status == 200
    assert r.body == '{"total":0,"continuation":null,"results":[]}'
