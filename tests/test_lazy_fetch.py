"""Hot-term driver safety: terms with df > lazy_min_df are served via
LazyTermPostings — block metadata up front (payload column pruned from the
scan), payload fetched per candidate-bearing (term, salt) shard only.
A require+rare query against a df=N term must transfer ≪ the full posting
list while producing byte-identical results to the eager engine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.engine import LazyTermPostings, SearchEngine, TermPostings
from edgesearch_spark.oracle import Query

N = 2000
RARE_DOCS = list(range(100, 110)) + list(range(140, 150))  # 20 docs, 1 salt bucket at shift 7


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lazyidx"))
    rows = []
    for i in range(N):
        text = f"hot common{i % 7} filler{i % 31}"
        if i in RARE_DOCS:
            text += " rare"
        if i % 3 == 0:
            text += " third"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    build_index(spark, docs, out, IndexConfig(block_size=16, salt_shift=7),
                doc_id_col="doc_id", content_col="content")
    return out


@pytest.fixture()
def engines(spark, index_dir):
    eager = SearchEngine(spark, index_dir)              # default threshold: nothing lazy here
    lazy = SearchEngine(spark, index_dir, lazy_min_df=100)  # 'hot'(2000), 'third'(667) go lazy
    return eager, lazy


def test_require_rare_plus_hot_bounded_fetch(engines):
    eager, lazy = engines
    q = Query.make(require=["rare", "hot"], k=50)
    a, b = eager.search(q), lazy.search(q)
    assert (a.total, a.continuation, list(a.doc_ids)) == (b.total, b.continuation, list(b.doc_ids))
    hot = lazy._cache["hot"]
    assert isinstance(hot, LazyTermPostings)
    assert isinstance(lazy._cache["rare"], TermPostings)
    # the rare docs live in ~2 of the 16 salt buckets: ≪ full payload moved
    assert hot.bytes_fetched > 0
    assert hot.bytes_fetched < hot.total_payload_bytes / 4, (
        hot.bytes_fetched, hot.total_payload_bytes)


def test_bm25_rank_identical_under_laziness(engines):
    eager, lazy = engines
    for spec in (
        dict(require=["rare"], contain=["hot", "third"], k=20),
        dict(require=["rare", "third"], exclude=["common1"], k=20),
        dict(require=["rare"], contain=["common2"], exclude=["third"], k=20),
    ):
        q = Query.make(**spec)
        a, b = eager.search_bm25(q), lazy.search_bm25(q)
        assert list(a.doc_ids) == list(b.doc_ids), spec
        assert np.allclose(a.scores, b.scores, atol=1e-12), spec
        assert a.total == b.total, spec


def test_boolean_contain_exclude_probe_not_decode(engines):
    """require + hot contain/exclude: the hot terms are probed on the
    candidate set only — no full union decode."""
    eager, lazy = engines
    q = Query.make(require=["rare"], contain=["hot"], exclude=["third"], k=50)
    a, b = eager.search(q), lazy.search(q)
    assert (a.total, list(a.doc_ids)) == (b.total, list(b.doc_ids))
    hot = lazy._cache["hot"]
    assert hot.bytes_fetched < hot.total_payload_bytes / 4


def test_wand_lazy_rank_identical(engines):
    eager, lazy = engines
    q = Query.make(contain=["rare", "third", "common3"], k=10)
    a = eager.search_bm25(q)
    w = lazy.search_bm25_wand(q, exact_total=False)
    assert list(w.doc_ids) == list(a.doc_ids)
    assert np.allclose(w.scores, a.scores, atol=1e-12)


def test_exclude_only_quirk_with_lazy_terms(engines):
    eager, lazy = engines
    q = Query.make(exclude=["third"], k=30)
    a, b = eager.search(q), lazy.search(q)
    assert (a.total, list(a.doc_ids)) == (b.total, list(b.doc_ids))


def test_missing_terms_still_routed(engines):
    _, lazy = engines
    assert lazy.search(Query.make(require=["zzz_nope"], k=10)).total == 0
    r = lazy.search(Query.make(require=["rare"], contain=["zzz_nope"], k=10))
    assert r.total == len(RARE_DOCS)
