"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: build the compressed inverted index over the
                 sf0.001 documents table, run a BM25 top-k search through
                 the block-max kernel, join the doc store, return ranked hits.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); implementations in
                 edgesearch_spark/plans/contract.py.
oracle_sql()   — DuckDB-equivalent SQL per query (same aliases/rounding).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index build + block-max BM25 top-k + doc fetch on sf0.001."""
    from pyspark.sql import functions as F

    from edgesearch_spark.plans.contract import BM25_TERMS, _index_for
    from edgesearch_spark.engine import SearchEngine
    from edgesearch_spark.oracle import Query

    sf_dir = "/root/testdata/sf0.001"
    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    # block-max WAND kernel, mixed require+contain — rank-identical to the
    # exhaustive scorer (tests/test_wand.py, tests/test_property.py)
    r = eng.search_bm25_wand(Query.make(require=["table"], contain=BM25_TERMS, k=50))
    ranked = spark.createDataFrame(
        [(i, int(d), float(s)) for i, (d, s) in enumerate(zip(r.doc_ids, r.scores))],
        "rank long, doc_id long, score double",
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ranked.join(docs, "doc_id").select("rank", "doc_id", "score", "lang", "source").orderBy("rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from edgesearch_spark.plans.contract import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from edgesearch_spark.plans.contract import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
