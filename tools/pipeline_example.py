"""End-to-end training-data pipeline example: how the operators compose.

    raw corpus ──► quality filter ──► exact dedup ──► near-dup prune (LSH)
                                   │
                                   ▼
                        inverted-index build ──► BM25 / boolean serving

Each arrow is one declarative Spark plan; nothing collects to the driver
until the final top-k page. Run locally:

    python tools/pipeline_example.py [n_docs] [out_dir]

or on a cluster via spark-submit --py-files (see tools/submit_job.py for
the production entry point).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(spark, corpus, out_dir: str, quality_min_tokens: int = 20,
                 near_dup_jaccard: float = 0.9) -> dict:
    from edgesearch_spark.build import IndexConfig, build_index
    from edgesearch_spark.engine import SearchEngine
    from edgesearch_spark.functions.textstats import quality_score
    from edgesearch_spark.operators.dedup import exact_dedup, minhash_lsh_candidates, shingle_jaccard_pairs
    from edgesearch_spark.oracle import Query

    stats: dict = {"input_docs": corpus.count()}

    # 1. quality filter (pure JVM token stats)
    good = corpus.join(
        quality_score(corpus, "doc_id", "content")
        .filter(F.col("n_tokens") >= quality_min_tokens).select("doc_id"),
        "doc_id", "left_semi",
    )
    stats["after_quality"] = good.count()

    # 2. exact dedup (hash aggregate; min docID survives)
    kept = exact_dedup(good, "doc_id", "content").select(F.col("keep_doc_id").alias("doc_id"))
    good = good.join(kept, "doc_id", "left_semi")
    stats["after_exact_dedup"] = good.count()

    # 3. near-dup prune: LSH candidates → exact Jaccard confirm → drop the
    #    higher docID of each confirmed pair (candidates only, never n²)
    cand = minhash_lsh_candidates(good, "doc_id", "content", n=3, num_hashes=32, band_size=4)
    confirmed = (
        shingle_jaccard_pairs(good, "doc_id", "content", n=3, threshold=near_dup_jaccard)
        .join(cand, ["a", "b"], "left_semi")
    )
    drop = confirmed.select(F.col("b").alias("doc_id")).distinct()
    good = good.join(drop, "doc_id", "left_anti")
    stats["after_near_dedup"] = good.count()

    # 4. index build (resumable, salted, adaptive containers)
    build_index(spark, good, out_dir, IndexConfig(), doc_id_col="doc_id",
                content_col="content", resume=False)

    # 5. serve
    eng = SearchEngine(spark, out_dir).warm()
    r = eng.search_bm25_wand(Query.make(require=["import"], contain=["return", "license"], k=10))
    stats["query_total"] = r.total
    stats["query_top"] = [int(d) for d in r.doc_ids[:5]]
    return stats


def main() -> None:
    from edgesearch_spark.corpus import generate_corpus
    from edgesearch_spark.docids import assign_doc_ids
    from edgesearch_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pipeline_example_idx"
    spark = get_spark(app_name="pipeline-example")
    corpus = assign_doc_ids(generate_corpus(spark, n, seed=11), ("repo", "path", "commit"))
    print(json.dumps(run_pipeline(spark, corpus, out)))


if __name__ == "__main__":
    main()
