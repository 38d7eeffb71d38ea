"""Resumability: interrupted build + resume ≡ clean build (north rule;
the reference's upload-cursor pattern generalized, deploy.ts:10-56).

Equality is logical-byte-level: identical (term, salt, payload) rows in
postings — payload bytes are the compressed blocks, so this is the
"byte-identical postings" criterion — plus identical docs and stats."""

import json
import os

import pytest
from pyspark.sql import functions as F

from edgesearch_spark.build import IndexConfig, build_index, load_stats
from edgesearch_spark.corpus import generate_corpus

N = 600
CFG = IndexConfig(block_size=32, salt_shift=7)


def _postings_fingerprint(spark, out):
    rows = (
        spark.read.parquet(f"{out}/postings")
        .select("term", "salt", "df", F.sha2(F.col("payload"), 256).alias("ph"))
        .orderBy("term", "salt")
        .collect()
    )
    return [(r["term"], r["salt"], r["df"], r["ph"]) for r in rows]


def _docs_fingerprint(spark, out):
    return {
        r["doc_id"]: r["sha256"]
        for r in spark.read.parquet(f"{out}/docs").select("doc_id", "sha256").collect()
    }


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, N, seed=3)


def test_interrupted_then_resumed_equals_clean(spark, corpus, tmp_path_factory):
    clean = str(tmp_path_factory.mktemp("clean"))
    resumed = str(tmp_path_factory.mktemp("resumed"))
    build_index(spark, corpus, clean, CFG, order_cols=("repo", "path", "commit"))

    # simulate a crash after stage 2 of 4
    m1 = build_index(spark, corpus, resumed, CFG, order_cols=("repo", "path", "commit"), stop_after="stats")
    assert [m.stage for m in m1] == ["docs", "stats"]
    # resume: only the remaining stages run
    m2 = build_index(spark, corpus, resumed, CFG, order_cols=("repo", "path", "commit"))
    assert [m.stage for m in m2] == ["postings", "terms", "blooms", "oltrigrams"]

    assert _postings_fingerprint(spark, resumed) == _postings_fingerprint(spark, clean)
    assert _docs_fingerprint(spark, resumed) == _docs_fingerprint(spark, clean)
    assert load_stats(resumed) == load_stats(clean)


def test_lost_stage_is_rebuilt(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lost"))
    build_index(spark, corpus, out, CFG, order_cols=("repo", "path", "commit"))
    before = _postings_fingerprint(spark, out)
    # invalidate the postings stage (as if the job died mid-write)
    os.remove(f"{out}/_manifest/postings.json")
    m = build_index(spark, corpus, out, CFG, order_cols=("repo", "path", "commit"))
    assert [x.stage for x in m] == ["postings"]
    assert _postings_fingerprint(spark, out) == before


def test_manifest_lineage_recorded(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lineage"))
    build_index(spark, corpus, out, CFG, order_cols=("repo", "path", "commit"))
    for stage in ("docs", "stats", "postings", "terms", "blooms"):
        with open(f"{out}/_manifest/{stage}.json") as f:
            m = json.load(f)
        assert m["rows"] > 0 and m["seconds"] >= 0 and "lineage" in m, stage
    with open(f"{out}/_manifest/postings.json") as f:
        pm = json.load(f)
    assert pm["extra"]["total_postings"] > 0 and pm["extra"]["payload_bytes"] > 0
