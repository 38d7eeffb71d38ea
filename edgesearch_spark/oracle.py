"""Independent brute-force oracle — pins the reference's query semantics.

Pure-python dict/set reimplementation of the behavior observed in the
reference (wasm/index.c:76-131 kernel, script/src/main.ts:346-436 handler,
client/src/main.ts:10-35 normalization). Shares NO code with the engine
kernel (codec/engine are numpy; this is sets and sorting) so pytest
comparisons are meaningful.

Pinned behaviors (each has a golden test):
  * missing REQUIRE term → zero results immediately (main.ts:368-374)
  * missing CONTAIN / EXCLUDE terms → dropped (main.ts:375-376)
  * all modes empty after dropping → "default results": docIDs
    [c, c+k) ∩ [0, N), total = N, continuation = c+k if N > c+k else None
    (main.ts:379-389 — note continuation is c+k even when the page was
    clipped by N; we reproduce that exactly)
  * REQUIRE = AND-fold; CONTAIN = OR, ANDed into result (or becomes it);
    EXCLUDE = OR, ANDNOT (or *becomes the result* if nothing else set a
    bitmap — the exclude-only quirk, index.c:98-104)
  * pagination: ranks [c, min(total-1, c+k-1)] in ascending docID;
    continuation = last_rank+1, or None when the page reaches the end;
    c ≥ total → count 0, continuation None (index.c:115-128)
  * BM25 (our additive layer; the reference computes df and never scores —
    src/build/mod.rs:62,88): k1=1.2 b=0.75,
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    score = Σ idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    scoring terms = existing require+contain terms, candidates = the boolean
    result set, order = (score desc, doc_id asc).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

TOKEN_RE = re.compile(r"[a-zA-Z0-9]+")


@dataclass(frozen=True)
class Query:
    require: tuple[str, ...] = ()
    contain: tuple[str, ...] = ()
    exclude: tuple[str, ...] = ()
    continuation: int = 0
    k: int = 50

    @staticmethod
    def make(require=(), contain=(), exclude=(), continuation=0, k=50) -> "Query":
        """Client-style normalization: per-mode dedupe + sort
        (client/src/main.ts:15-34); continuation clamped ≥ 0 (main.ts:354-356)."""
        return Query(
            tuple(sorted(set(require))),
            tuple(sorted(set(contain))),
            tuple(sorted(set(exclude))),
            max(0, int(continuation)),
            int(k),
        )


@dataclass
class SearchResult:
    total: int
    continuation: int | None
    doc_ids: list[int]
    scores: list[float] = field(default_factory=list)


class QueryTooLarge(Exception):
    """> max_query_terms terms (reference: HTTP 413, main.ts:358-364)."""


class BruteForceOracle:
    def __init__(self, docs: list[tuple[int, str]], k1: float = 1.2, b: float = 0.75,
                 max_query_terms: int = 50):
        self.k1, self.b = k1, b
        self.max_query_terms = max_query_terms
        self.n_docs = len(docs)
        self.postings: dict[str, dict[int, int]] = {}  # term -> {doc_id: tf}
        self.dl: dict[int, int] = {}
        for doc_id, content in docs:
            toks = [t.lower() for t in TOKEN_RE.findall(content) if len(t.encode()) <= 255]
            self.dl[doc_id] = len(toks)
            for t in toks:
                self.postings.setdefault(t, {})
                self.postings[t][doc_id] = self.postings[t].get(doc_id, 0) + 1
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    # ---- boolean semantics ----
    def _result_set(self, q: Query) -> set[int] | None:
        """None ⇒ default-results path. Raises nothing; missing-REQUIRE is
        signalled by an empty set with a sentinel via tuple."""
        n_terms = len(q.require) + len(q.contain) + len(q.exclude)
        if n_terms > self.max_query_terms:
            raise QueryTooLarge(n_terms)
        if any(t not in self.postings for t in q.require):
            return set()  # instant empty (main.ts:368-374)
        contain = [t for t in q.contain if t in self.postings]
        exclude = [t for t in q.exclude if t in self.postings]
        if not q.require and not contain and not exclude:
            return None  # default results
        result: set[int] | None = None
        for t in q.require:
            s = set(self.postings[t])
            result = s if result is None else (result & s)
        if contain:
            union = set().union(*(self.postings[t] for t in contain))
            result = union if result is None else (result & union)
        if exclude:
            union = set().union(*(self.postings[t] for t in exclude))
            result = union if result is None else (result - union)  # quirk: becomes result
        assert result is not None
        return result

    def _paginate(self, ordered: list[int], total: int, c: int, k: int) -> SearchResult:
        if c >= total:
            return SearchResult(total, None, [])
        last = min(total - 1, c + k - 1)
        page = ordered[c : last + 1]
        cont = None if last == total - 1 else last + 1
        return SearchResult(total, cont, page)

    def search(self, q: Query) -> SearchResult:
        rs = self._result_set(q)
        if rs is None:
            # default results (main.ts:379-389): continuation is c+k whenever
            # N > c+k, independent of page clipping
            after = q.continuation + q.k
            docs = [i for i in range(q.continuation, after) if 0 <= i < self.n_docs]
            return SearchResult(self.n_docs, after if self.n_docs > after else None, docs)
        ordered = sorted(rs)
        return self._paginate(ordered, len(ordered), q.continuation, q.k)

    # ---- BM25 ----
    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, doc_id: int, terms: list[str]) -> float:
        s = 0.0
        for t in terms:
            tf = self.postings.get(t, {}).get(doc_id, 0)
            if not tf:
                continue
            denom = tf + self.k1 * (1 - self.b + self.b * self.dl[doc_id] / self.avgdl)
            s += self.idf(t) * tf * (self.k1 + 1) / denom
        return s

    def search_bm25(self, q: Query) -> SearchResult:
        rs = self._result_set(q)
        if rs is None:
            after = q.continuation + q.k
            docs = [i for i in range(q.continuation, after) if 0 <= i < self.n_docs]
            return SearchResult(self.n_docs, after if self.n_docs > after else None, docs, [0.0] * len(docs))
        scoring = [t for t in dict.fromkeys(q.require + q.contain) if t in self.postings]
        scored = sorted(((-self.score(d, scoring), d) for d in rs))
        total = len(scored)
        res = self._paginate([d for _, d in scored], total, q.continuation, q.k)
        res.scores = [-s for s, d in scored[q.continuation : q.continuation + len(res.doc_ids)]]
        return res
