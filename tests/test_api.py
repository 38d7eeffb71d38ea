"""Worker-API parity: query parsing, serialization, hash syntax, response
shapes — behaviors from script/src/main.ts, client/src/main.ts, and the
work-at-microsoft demo UI (no Spark needed)."""

from edgesearch_spark.api import (
    build_query_string,
    no_results_response,
    parse_hash_syntax,
    parse_query_params,
    parse_query_url,
    response_to_dict,
    search_response,
)
from edgesearch_spark.oracle import Query, SearchResult


def test_parse_query_params_modes():
    q = parse_query_params(["0_hello", "1_world", "2_spam", "0_abc"])
    assert q.require == ("abc", "hello")  # dedupe+sort normalization
    assert q.contain == ("world",)
    assert q.exclude == ("spam",)


def test_parse_query_params_malformed():
    assert parse_query_params(["3_badmode"]) is None
    assert parse_query_params(["nounderscore"]) is None
    assert parse_query_params(["0_"]) is None


def test_parse_query_params_continuation_clamped():
    assert parse_query_params([], "7").continuation == 7
    assert parse_query_params([], "-5").continuation == 0
    assert parse_query_params([], "xyz").continuation == 0
    assert parse_query_params([], None).continuation == 0


def test_parse_query_url_roundtrip():
    q = Query.make(require=["world"], contain=["hello", "big"], continuation=3)
    s = build_query_string(q)
    assert s == "c=3&t=0_world&t=1_big&t=1_hello"
    q2 = parse_query_url(f"https://x.example/search?{s}")
    assert q2 == q


def test_url_encoding_roundtrip():
    q = Query.make(require=["c++", "a b"])
    q2 = parse_query_url("/search?" + build_query_string(q))
    assert q2.require == ("a b", "c++")


def test_hash_syntax():
    q = parse_hash_syntax("#title:Hello+World|~loc:seattle|!dept:legal|from:50",
                          fields={"title", "loc", "dept"})
    assert q.require == ("title_hello", "title_world")
    assert q.contain == ("loc_seattle",)
    assert q.exclude == ("dept_legal",)
    assert q.continuation == 50


def test_hash_syntax_unknown_field_skipped():
    q = parse_hash_syntax("#bogus:x|title:y", fields={"title"})
    assert q.require == ("title_y",)


def test_response_shapes():
    r = SearchResult(total=12, continuation=None, doc_ids=[1, 2])
    body = search_response(r, ['{"id":1}', '{"id":2}'])
    assert response_to_dict(body) == {"total": 12, "continuation": None, "results": [{"id": 1}, {"id": 2}]}
    r2 = SearchResult(total=12, continuation=5, doc_ids=[1])
    assert response_to_dict(search_response(r2, ["7"]))["continuation"] == 5
    assert response_to_dict(no_results_response()) == {"results": [], "continuation": None, "total": 0}


def test_parse_blank_t_is_malformed():
    """Worker parity: a blank `t=` reaches the term regex and fails -> 400
    (parse returns None); the old keep_blank_values=False silently dropped it."""
    from edgesearch_spark.api import parse_query_url

    assert parse_query_url("/search?t=&c=0") is None


def test_parse_term_truncates_at_ampersand():
    """Worker regex /^([012])_([^&]+)/ has no $ anchor: a decoded '&' inside
    the value truncates the term instead of rejecting the query."""
    from edgesearch_spark.api import parse_query_url

    q = parse_query_url("/search?t=0_abc%26def")
    assert q is not None and q.require == ("abc",)
