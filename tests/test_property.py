"""Property-based parity: random queries over the fixture corpus must match
the brute-force oracle in both boolean and BM25 modes — beyond the frozen
golden set (random mode mixes, random continuations, random k)."""

import random

import numpy as np
import pytest

from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.corpus import generate_corpus, generate_corpus_pandas
from edgesearch_spark.engine import SearchEngine
from edgesearch_spark.oracle import BruteForceOracle, Query

N = 350
VOCAB = (
    ["import", "def", "return", "the", "a", "license", "data", "value", "error", "test"]
    + [f"util{k}" for k in (0, 1, 2, 5, 9, 40, 150)]
    + [f"helper{k}" for k in (0, 3, 7, 90)]
    + ["uid00000003", "uid00000050", "zz_missing1", "zz_missing2"]
)


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("propidx"))
    build_index(spark, generate_corpus(spark, N, seed=77), out,
                IndexConfig(block_size=8, salt_shift=5), order_cols=("repo", "path", "commit"))
    pdf = generate_corpus_pandas(N, seed=77).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return SearchEngine(spark, out), BruteForceOracle(list(zip(range(len(pdf)), pdf["content"])))


def test_random_queries_match_oracle_lazy_engine(spark, engines, tmp_path_factory):
    """Same parity property with EVERY term served lazily (lazy_min_df=1):
    the metadata-first/shard-fetch path must be indistinguishable."""
    eager, oracle = engines
    lazy = SearchEngine(spark, eager.index_dir, lazy_min_df=1)
    rng = random.Random(4040)
    for i in range(25):
        q = _random_query(rng)
        b_got, b_want = lazy.search(q), oracle.search(q)
        assert (b_got.total, b_got.continuation, list(b_got.doc_ids)) == (
            b_want.total, b_want.continuation, b_want.doc_ids), (i, q)
        s_got, s_want = lazy.search_bm25(q), oracle.search_bm25(q)
        assert list(s_got.doc_ids) == s_want.doc_ids, (i, q)
        assert np.allclose(s_got.scores, s_want.scores, atol=1e-9), (i, q)


def _random_query(rng: random.Random) -> Query:
    def pick(n):
        return rng.sample(VOCAB, k=rng.randint(0, n))

    return Query.make(
        require=pick(3),
        contain=pick(3),
        exclude=pick(2),
        continuation=rng.choice([0, 0, 0, 1, 7, 50, 400]),
        k=rng.choice([1, 3, 10, 50]),
    )


def test_random_queries_match_oracle(engines):
    engine, oracle = engines
    rng = random.Random(20260816)
    for i in range(60):
        q = _random_query(rng)
        b_got, b_want = engine.search(q), oracle.search(q)
        assert (b_got.total, b_got.continuation, list(b_got.doc_ids)) == (
            b_want.total, b_want.continuation, b_want.doc_ids), (i, q)
        s_got, s_want = engine.search_bm25(q), oracle.search_bm25(q)
        assert (s_got.total, s_got.continuation, list(s_got.doc_ids)) == (
            s_want.total, s_want.continuation, s_want.doc_ids), (i, q)
        assert np.allclose(s_got.scores, s_want.scores, atol=1e-9), (i, q)
        if q.require or q.contain:
            # the pruned kernel covers contain-only AND mixed require/exclude
            w = engine.search_bm25_wand(q)
            assert (w.total, list(w.doc_ids)) == (s_want.total, s_want.doc_ids), (i, q)
            assert np.allclose(w.scores, s_want.scores, atol=1e-9), (i, q)
            assert w.continuation == s_want.continuation, (i, q)


def test_random_queries_match_oracle_routed_engine(spark, engines):
    """Same parity property with the distributed auto-route forced on
    (hot_route_df=10 ⇒ nearly every union-shaped query runs as a Spark
    plan): the distributed twin must be indistinguishable from the kernel
    AND the brute-force oracle across random mode mixes, continuations and
    k — missing-term rules, the exclude-only quirk, require∩contain score
    dedup, and pagination all included."""
    eager, oracle = engines
    routed = SearchEngine(spark, eager.index_dir, lazy_min_df=10, hot_route_df=10)
    rng = random.Random(31337)
    n_routed = 0
    for i in range(18):
        q = _random_query(rng)
        b_got, b_want = routed.search(q), oracle.search(q)
        n_routed += routed.last_route == "distributed"
        assert (b_got.total, b_got.continuation, list(b_got.doc_ids)) == (
            b_want.total, b_want.continuation, b_want.doc_ids), (i, q)
        s_got, s_want = routed.search_bm25(q), oracle.search_bm25(q)
        assert (s_got.total, s_got.continuation, list(s_got.doc_ids)) == (
            s_want.total, s_want.continuation, s_want.doc_ids), (i, q)
        assert np.allclose(s_got.scores, s_want.scores, atol=1e-9), (i, q)
        if q.require or q.contain:
            w = routed.search_bm25_wand(q)
            assert (w.total, list(w.doc_ids)) == (s_want.total, s_want.doc_ids), (i, q)
            assert np.allclose(w.scores, s_want.scores, atol=1e-9), (i, q)
    assert n_routed >= 8, f"route never engaged ({n_routed})"
