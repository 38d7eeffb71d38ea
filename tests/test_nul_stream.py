"""Reference build-input format readers: NUL-delimited documents and
document-terms streams (README.md:91-96 contract, incl. empty-term doc
boundaries and termless documents)."""

import pytest

from edgesearch_spark.sources.nul_stream import (
    read_document_terms_file,
    read_documents_file,
    write_documents_file,
)

DOCS = ['{"t":"a"}', '{"t":"b"}', '{"t":"c"}', '{"t":"d"}']
# doc0: hello world | doc1: (termless) | doc2: world | doc3: foo bar baz
TERMS = [["hello", "world"], [], ["world"], ["foo", "bar", "baz"]]


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("nul")
    docs_path = str(d / "documents")
    with open(docs_path, "wb") as f:
        for doc in DOCS:
            f.write(doc.encode() + b"\x00")
    terms_path = str(d / "document-terms")
    with open(terms_path, "wb") as f:
        for terms in TERMS:
            for t in terms:
                f.write(t.encode() + b"\x00")
            f.write(b"\x00")  # empty term = end of document
    return docs_path, terms_path


def test_read_documents_positions(spark, files):
    docs_path, _ = files
    rows = read_documents_file(spark, docs_path).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["content"]) for r in rows] == list(enumerate(DOCS))


def test_read_document_terms_boundaries(spark, files):
    _, terms_path = files
    df = read_document_terms_file(spark, terms_path)
    got = {}
    for r in df.collect():
        got.setdefault(r["doc_id"], []).append(r["term"])
    df._docid_cache.unpersist()
    want = {i: terms for i, terms in enumerate(TERMS) if terms}
    assert {k: sorted(v) for k, v in got.items()} == {k: sorted(v) for k, v in want.items()}


def test_full_reference_format_to_index(spark, files, tmp_path_factory):
    """End-to-end: reference-format files → index → search, with the
    positional docIDs preserved."""
    from edgesearch_spark.build import IndexConfig, build_index
    from edgesearch_spark.engine import SearchEngine
    from edgesearch_spark.oracle import Query

    docs_path, terms_path = files
    docs = read_documents_file(spark, docs_path)
    # reference contract: terms are decoupled from content; here we index the
    # terms stream by joining it as synthetic content per doc
    from pyspark.sql import functions as F

    terms = read_document_terms_file(spark, terms_path)
    content = terms.groupBy("doc_id").agg(F.concat_ws(" ", F.collect_list("term")).alias("content"))
    corpus = docs.select("doc_id").join(content, "doc_id", "left").fillna({"content": ""})
    out = str(tmp_path_factory.mktemp("nulidx"))
    build_index(spark, corpus, out, IndexConfig(block_size=4, salt_shift=4),
                doc_id_col="doc_id", content_col="content")
    eng = SearchEngine(spark, out)
    assert eng.search(Query.make(require=["world"])).doc_ids == [0, 2]
    assert eng.search(Query.make(require=["hello"], exclude=["foo"])).doc_ids == [0]
    assert eng.search(Query.make()).total == 4  # termless doc still counted


def test_write_documents_roundtrip(spark, files, tmp_path_factory):
    docs_path, _ = files
    df = read_documents_file(spark, docs_path)
    out = str(tmp_path_factory.mktemp("roundtrip") / "documents")
    write_documents_file(df, out)
    with open(docs_path, "rb") as a, open(out, "rb") as b:
        assert a.read() == b.read()


def test_iceberg_source_fallback(spark, tmp_path_factory):
    """Without Iceberg jars the corpus source falls back to parquet
    transparently (same schema, same downstream plan)."""
    from edgesearch_spark.corpus import generate_corpus
    from edgesearch_spark.sources.iceberg import iceberg_available, read_corpus, write_snapshot

    assert iceberg_available(spark) in (True, False)
    p = str(tmp_path_factory.mktemp("ice") / "corpus")
    write_snapshot(generate_corpus(spark, 50, seed=2), p)
    df = read_corpus(spark, p)
    assert df.count() == 50 and set(df.columns) == {"repo", "path", "commit", "lang", "content"}


def test_mid_stream_empty_payload_is_a_document(spark, tmp_path_factory):
    """A mid-stream double-NUL is an empty-payload document WITH a docID
    (src/data/documents.rs:20-30); only the trailing empty record is EOF."""
    d = tmp_path_factory.mktemp("nul_empty")
    p = str(d / "documents")
    with open(p, "wb") as f:
        f.write(b'{"a":1}\x00\x00{"b":2}\x00')  # doc0, empty doc1, doc2
    rows = read_documents_file(spark, p).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["content"]) for r in rows] == [
        (0, '{"a":1}'), (1, ""), (2, '{"b":2}')]


def test_documents_positions_across_input_splits(spark, tmp_path_factory):
    """Records split across Hadoop input-split boundaries must keep exact
    positional docIDs (the classic delimiter-at-block-boundary failure).
    Force many small splits over a ~1.5 MB file and check every position."""
    d = tmp_path_factory.mktemp("nul_splits")
    p = str(d / "documents")
    docs = [f'{{"i":{i},"pad":"{"x" * (17 + (i * 7) % 91)}"}}' for i in range(10_000)]
    with open(p, "wb") as f:
        for doc in docs:
            f.write(doc.encode() + b"\x00")
    old = spark.sparkContext._jsc.hadoopConfiguration().get(
        "mapreduce.input.fileinputformat.split.maxsize")
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "mapreduce.input.fileinputformat.split.maxsize", str(64 * 1024))
    try:
        rows = read_documents_file(spark, p).orderBy("doc_id").collect()
    finally:
        if old is None:
            spark.sparkContext._jsc.hadoopConfiguration().unset(
                "mapreduce.input.fileinputformat.split.maxsize")
        else:
            spark.sparkContext._jsc.hadoopConfiguration().set(
                "mapreduce.input.fileinputformat.split.maxsize", old)
    assert len(rows) == 10_000
    assert [(r["doc_id"], r["content"]) for r in rows] == list(enumerate(docs))
