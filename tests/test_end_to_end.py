"""Golden end-to-end: Spark-built index + numpy kernel vs brute-force oracle.

The query set covers every pinned reference behavior (FIXTURES.md F5):
missing-term rules, exclude-only quirk, default results, pagination edges,
hot+rare term mixes, >max-terms error — semantics from wasm/index.c:76-131
and script/src/main.ts:346-436.
"""

import shutil

import numpy as np
import pytest

from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.corpus import generate_corpus, generate_corpus_pandas
from edgesearch_spark.engine import SearchEngine
from edgesearch_spark.oracle import BruteForceOracle, Query, QueryTooLarge

N_DOCS = 400


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    shutil.rmtree(out, ignore_errors=True)
    corpus = generate_corpus(spark, N_DOCS, seed=42)
    cfg = IndexConfig(block_size=16, salt_shift=6)  # small blocks/shards to exercise merges
    build_index(spark, corpus, out, cfg, order_cols=("repo", "path", "commit"))
    return out


@pytest.fixture(scope="module")
def oracle():
    pdf = generate_corpus_pandas(N_DOCS, seed=42)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    docs = list(zip(range(len(pdf)), pdf["content"]))
    return BruteForceOracle(docs)


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    return SearchEngine(spark, index_dir)


QUERIES = [
    Query.make(require=["import"]),
    Query.make(require=["import", "return"]),
    Query.make(require=["license", "util5"]),
    Query.make(contain=["util3", "helper7", "struct"]),
    Query.make(require=["the"], contain=["util1", "util2"]),
    Query.make(require=["data"], exclude=["error"]),
    Query.make(require=["value"], contain=["util9"], exclude=["test", "main"]),
    Query.make(require=["zzz_missing"]),  # missing REQUIRE → empty
    Query.make(require=["import"], contain=["zzz_missing"]),  # missing CONTAIN dropped
    Query.make(require=["import"], exclude=["zzz_missing"]),  # missing EXCLUDE dropped
    Query.make(exclude=["license"]),  # exclude-only quirk: docs HAVING license
    Query.make(exclude=["zzz_missing"]),  # exclude-only all-missing → default results
    Query.make(),  # empty query → default results
    Query.make(continuation=390),  # default results near end
    Query.make(continuation=1000),  # default results past end
    Query.make(require=["the"], continuation=37, k=10),  # pagination mid
    Query.make(require=["the"], continuation=10_000),  # pagination past end
    Query.make(require=["uid00000010"]),  # singleton term
    Query.make(require=["import"], contain=["uid00000020", "uid00000021"]),
]


def test_boolean_parity(engine, oracle):
    for q in QUERIES:
        got = engine.search(q)
        want = oracle.search(q)
        assert got.total == want.total, q
        assert got.continuation == want.continuation, q
        assert list(got.doc_ids) == list(want.doc_ids), q


def test_bm25_parity(engine, oracle):
    for q in QUERIES:
        got = engine.search_bm25(q)
        want = oracle.search_bm25(q)
        assert got.total == want.total, q
        assert got.continuation == want.continuation, q
        assert list(got.doc_ids) == list(want.doc_ids), q
        assert np.allclose(got.scores, want.scores, atol=1e-9), q


def test_bm25_pagination_consistent(engine, oracle):
    q1 = Query.make(require=["import"], k=10)
    r1 = engine.search_bm25(q1)
    assert r1.continuation == 10
    q2 = Query.make(require=["import"], k=10, continuation=r1.continuation)
    r2 = engine.search_bm25(q2)
    full = engine.search_bm25(Query.make(require=["import"], k=20))
    assert r1.doc_ids + r2.doc_ids == full.doc_ids


def test_too_many_terms(engine, oracle):
    q = Query.make(require=[f"t{i}" for i in range(60)])
    with pytest.raises(QueryTooLarge):
        engine.search(q)
    with pytest.raises(QueryTooLarge):
        oracle.search(q)


def test_sha256_invariant(spark, index_dir):
    """Per-row content sha256 equality between input and docs store
    (BASELINE.json input_hint invariant)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{index_dir}/docs")
    bad = docs.filter(F.sha2(F.col("content"), 256) != F.col("sha256")).count()
    assert bad == 0
    assert docs.count() == N_DOCS


def test_doc_fetch_join(engine, oracle):
    q = Query.make(require=["import", "return"], k=5)
    r = engine.search(q)
    fetched = engine.fetch_docs(r.doc_ids).orderBy("doc_id").collect()
    assert [row["doc_id"] for row in fetched] == sorted(r.doc_ids)
    assert all(row["content"] for row in fetched)


def test_build_rejects_bad_doc_ids(spark, tmp_path_factory):
    """User-supplied doc_id must be dense 0..n-1 (the engine's norms cache
    and positional semantics depend on it) — gaps and duplicates fail the
    build loudly instead of corrupting results silently."""
    import pytest

    from edgesearch_spark.build import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("badids"))
    gappy = spark.createDataFrame([(0, "a"), (2, "b"), (3, "c")], "doc_id long, content string")
    with pytest.raises(ValueError, match="dense"):
        build_index(spark, gappy, out + "/g", IndexConfig(), doc_id_col="doc_id", content_col="content")
    dup = spark.createDataFrame(
        [(i % 50, f"doc {i}") for i in range(100)], "doc_id long, content string")
    with pytest.raises(ValueError):
        build_index(spark, dup, out + "/d", IndexConfig(), doc_id_col="doc_id", content_col="content")
