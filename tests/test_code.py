"""Source-code identifier splitting (functions/code.py): boundary rules,
RE2-compatible semantics, stats, and the index composition that makes
'username' find `getUserName`."""

import pytest

from edgesearch_spark.functions.code import code_token_stats, identifier_subtokens_col


@pytest.fixture(scope="module")
def code_docs(spark):
    rows = [
        (0, "def getUserName(self): return self.userName"),
        (1, "class HTTPServer2: pass  # utf8 decoder"),
        (2, "parse_json_block = lambda x: x"),
        (3, "kebab-case-id and SCREAMING_SNAKE_CASE"),
        (4, "plain words only"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string").fillna({"content": ""})


def test_identifier_boundaries(spark, code_docs):
    got = {r["doc_id"]: r["t"] for r in code_docs.select(
        "doc_id", identifier_subtokens_col("content").alias("t")).collect()}
    assert got[0] == ["def", "get", "user", "name", "self", "return", "self", "user", "name"]
    assert got[1] == ["class", "http", "server", "2", "pass", "utf", "8", "decoder"]
    assert got[2] == ["parse", "json", "block", "lambda", "x", "x"]
    assert got[3] == ["kebab", "case", "id", "and", "screaming", "snake", "case"]
    assert got[5] == []


def test_code_token_stats_values(spark, code_docs):
    got = {r["doc_id"]: (r["n_subtokens"], r["n_distinct"], r["n_numeric"])
           for r in code_token_stats(code_docs).collect()}
    assert got[0] == (9, 6, 0)
    assert got[1] == (8, 8, 2)
    assert got[5] == (0, 0, 0)


def test_subtoken_index_finds_camelcase(spark, code_docs, tmp_path_factory):
    """The composition a code corpus wants: index the subtoken stream, so a
    single-word query matches inside multi-word identifiers."""
    from pyspark.sql import functions as F

    from edgesearch_spark.build import IndexConfig, build_index
    from edgesearch_spark.engine import SearchEngine
    from edgesearch_spark.oracle import Query

    out = str(tmp_path_factory.mktemp("codeidx"))
    sub = code_docs.select(
        "doc_id", F.array_join(identifier_subtokens_col("content"), " ").alias("content"))
    build_index(spark, sub, out, IndexConfig(block_size=8, salt_shift=4),
                doc_id_col="doc_id", content_col="content")
    eng = SearchEngine(spark, out)
    assert eng.search(Query.make(require=["user"])).doc_ids == [0]
    assert eng.search(Query.make(require=["server"])).doc_ids == [1]
    assert eng.search(Query.make(require=["json"])).doc_ids == [2]
    # the full identifier is NOT a term of the subtoken index
    assert eng.search(Query.make(require=["getusername"])).total == 0
