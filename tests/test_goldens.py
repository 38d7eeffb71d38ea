"""Frozen golden query set (tests/goldens/query_set.json): both the oracle
and the Spark-built engine must reproduce the committed goldens exactly —
pins reference semantics + BM25 scoring across refactors."""

import json
import os

import numpy as np
import pytest

from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.corpus import generate_corpus, generate_corpus_pandas
from edgesearch_spark.engine import SearchEngine
from edgesearch_spark.oracle import BruteForceOracle, Query, QueryTooLarge

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__), "goldens", "query_set.json")))


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    meta = GOLDENS["corpus"]
    out = str(tmp_path_factory.mktemp("goldidx"))
    build_index(spark, generate_corpus(spark, meta["n"], seed=meta["seed"]), out,
                IndexConfig(), order_cols=tuple(meta["order"]))
    return SearchEngine(spark, out)


@pytest.fixture(scope="module")
def oracle():
    meta = GOLDENS["corpus"]
    pdf = generate_corpus_pandas(meta["n"], seed=meta["seed"]).sort_values(meta["order"]).reset_index(drop=True)
    return BruteForceOracle(list(zip(range(len(pdf)), pdf["content"])))


@pytest.mark.parametrize("name", sorted(GOLDENS["queries"]))
def test_golden(name, engine, oracle):
    g = GOLDENS["queries"][name]
    if "error" in g:
        with pytest.raises(QueryTooLarge):
            engine.search(Query.make(**g["query"]))
        return
    q = Query.make(**g["query"])
    for impl in (engine, oracle):
        b = impl.search(q)
        assert (b.total, b.continuation, list(b.doc_ids)) == (
            g["boolean"]["total"], g["boolean"]["continuation"], g["boolean"]["doc_ids"]), (name, impl)
        s = impl.search_bm25(q)
        assert (s.total, s.continuation, list(s.doc_ids)) == (
            g["bm25"]["total"], g["bm25"]["continuation"], g["bm25"]["doc_ids"]), (name, impl)
        assert np.allclose(s.scores, g["bm25"]["scores"], atol=1e-8), (name, impl)
