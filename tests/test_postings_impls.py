"""The two postings-build paths (sortstream: one-shuffle streaming encode;
collect: agg+collect_list) must produce logically byte-identical postings,
and the two tokenizers must agree."""

import pytest
from pyspark.sql import functions as F

from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.corpus import generate_corpus
from edgesearch_spark.tokenizer import tokenize_pairs, tokenize_pairs_pandas

N = 700


def _fingerprint(spark, out):
    rows = (
        spark.read.parquet(f"{out}/postings")
        .select("term", "salt", "df", "cf", F.sha2(F.col("payload"), 256).alias("ph"),
                F.col("block_max_doc").cast("string").alias("bmd"))
        .orderBy("term", "salt")
        .collect()
    )
    return [tuple(r) for r in rows]


def test_sortstream_equals_collect(spark, tmp_path_factory):
    corpus = generate_corpus(spark, N, seed=8)
    outs = {}
    for impl in ("sortstream", "collect", "arrow", "pack"):
        out = str(tmp_path_factory.mktemp(impl))
        build_index(spark, corpus, out,
                    IndexConfig(block_size=16, salt_shift=6, postings_impl=impl),
                    order_cols=("repo", "path", "commit"))
        outs[impl] = out
    fp = {impl: _fingerprint(spark, out) for impl, out in outs.items()}
    assert fp["sortstream"] == fp["collect"] == fp["arrow"]


def test_tokenizers_agree(spark):
    docs = generate_corpus(spark, 200, seed=4).withColumn("doc_id", F.monotonically_increasing_id())
    a = tokenize_pairs(docs, "doc_id", "content").orderBy("doc_id", "term").collect()
    b = tokenize_pairs_pandas(docs, "doc_id", "content").orderBy("doc_id", "term").collect()
    assert [(r["doc_id"], r["term"], r["tf"], r["dl"]) for r in a] == [
        (r["doc_id"], r["term"], r["tf"], r["dl"]) for r in b
    ]


def test_doc_length_col_matches_tokenizer(spark):
    from pyspark.sql import functions as F

    from edgesearch_spark.tokenizer import _tokens_col, doc_length_col

    rows = [
        (0, "hello world (x) = 12"),
        (1, ""),
        (2, "___"),
        (3, "a" * 300 + " short " + "b" * 255),  # overlong run counts 0; 255-run counts 1
        (4, "tab\tnewline\nmix 42x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"]: r["dl"] for r in df.select("doc_id", doc_length_col("content").alias("dl")).collect()}
    want = {r["doc_id"]: r["dl"] for r in df.select("doc_id", F.size(_tokens_col("content")).cast("long").alias("dl")).collect()}
    assert got == want == {0: 4, 1: 0, 2: 0, 3: 2, 4: 4}


def test_pandas_tokenizer_wordmap_merges_counts(spark):
    rows = [(0, "ms loves Microsoft ms"), (1, "plain text")]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    out = tokenize_pairs_pandas(df, "doc_id", "content", word_map={"ms": "microsoft"}).collect()
    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in out}
    assert got[(0, "microsoft")] == (3, 4)  # 2×ms + 1×Microsoft merged
    assert got[(0, "loves")] == (1, 4)
    assert got[(1, "plain")] == (1, 2)


def test_pandas_tokenizer_field_prefix(spark):
    df = spark.createDataFrame([(0, "alpha beta")], "doc_id long, content string")
    out = tokenize_pairs_pandas(df, "doc_id", "content", field_prefix="title").collect()
    assert sorted(r["term"] for r in out) == ["title_alpha", "title_beta"]


def test_word_map_field_prefix_parity_arrow_vs_pandas(spark, tmp_path_factory):
    """IndexConfig word_map/field_prefix must produce byte-identical postings
    on the arrow (default) and sortstream tokenizers, with mapped terms
    merging their counts (ms→microsoft + literal microsoft combine)."""
    from edgesearch_spark.build import IndexConfig, build_index

    corpus = generate_corpus(spark, 300, seed=12)
    wmap = {"util1": "helper", "import": "include"}
    outs, dirs = {}, {}
    for impl in ("arrow", "sortstream", "pack"):
        out = str(tmp_path_factory.mktemp(f"wm_{impl}"))
        build_index(
            spark, corpus, out,
            IndexConfig(postings_impl=impl, word_map=wmap, field_prefix="body"),
            order_cols=("repo", "path", "commit"),
        )
        outs[impl] = _fingerprint(spark, out)
        dirs[impl] = out
    assert outs["arrow"] == outs["sortstream"]
    tdf = spark.read.parquet(f"{dirs['arrow']}/term_stats")
    names = {r["term"] for r in tdf.select("term").collect()}
    assert "body_helper" in names and "body_include" in names
    assert "body_util1" not in names and "body_import" not in names
    assert all(t.startswith("body_") for t in names)


def test_collect_impl_refuses_word_map(spark, tmp_path_factory):
    from edgesearch_spark.build import IndexConfig, build_index
    import pytest as _pt

    with _pt.raises(ValueError):
        build_index(
            spark, generate_corpus(spark, 10, seed=1), str(tmp_path_factory.mktemp("wm_bad")),
            IndexConfig(postings_impl="collect", word_map={"a": "b"}),
            order_cols=("repo", "path", "commit"),
        )


def test_postings_file_size_budget(spark, tmp_path_factory):
    """B12: maxRecordsPerFile derived from measured bytes/row keeps postings
    files near the configured byte target even when one range partition holds
    far more rows."""
    import os

    from edgesearch_spark.build import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("sized"))
    build_index(
        spark, generate_corpus(spark, 1200, seed=13), out,
        IndexConfig(target_file_bytes=24 << 10, num_partitions=4),
        order_cols=("repo", "path", "commit"),
    )
    sizes = []
    for f in os.listdir(f"{out}/postings"):
        if f.endswith(".parquet"):
            sizes.append(os.path.getsize(f"{out}/postings/{f}"))
    assert len(sizes) > 4, "budget should split beyond the 4 range partitions"
    # parquet per-file floor is a few KB of footer; assert no file blows past
    # the target by more than the expected overhead factor
    assert max(sizes) < (24 << 10) * 4, sorted(sizes)[-3:]


def test_tokenizer_unicode_null_parity(spark):
    """The arrow tokenizer's C++ ASCII fast path + Python fallback must be
    row-for-row identical to the pandas tokenizer on unicode, null, empty,
    over-long-token, and emoji content (and under word_map/prefix)."""
    from edgesearch_spark.arrow_pipeline import tokenize_pairs_arrow
    from edgesearch_spark.tokenizer import tokenize_pairs_pandas

    rows = [
        (0, "Hello WORLD foo123 bar"),
        (1, "café résumé naïve"),
        (2, "İstanbul STRASSE ß gross"),
        (3, None),
        (4, ""),
        (5, "日本語 text mixed 中文 abc42"),
        (6, "x" * 600 + " short ok"),
        (7, "emoji 🎉 party42"),
        (8, "plain ascii only line two three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    for kw in ({}, dict(word_map={"abc42": "merged", "text": "merged"}, field_prefix="f")):
        a = sorted(map(tuple, tokenize_pairs_arrow(df, "doc_id", "content", **kw).collect()))
        p = sorted(map(tuple, tokenize_pairs_pandas(df, "doc_id", "content", **kw).collect()))
        assert a == p, kw
    assert len(a) > 0
