"""Query engine over a built index — reference semantics + BM25 top-k.

Mirrors the reference's query lifecycle (SURVEY.md §3.2) Spark-style:

  parse/normalize (Query.make)                 ← client/src/main.ts:10-35
  validate ≤ max_query_terms                   ← script/src/main.ts:358-364
  batched postings fetch: ONE filtered scan
  serves all query terms                       ← findAllInChunks batching,
                                                 script/src/main.ts:191-240;
                                                 Catalyst pushes term ∈ (…)
                                                 into the parquet scan, so
                                                 file/row-group min-max stats
                                                 prune like the reference's
                                                 chunk first-key binary search
                                                 (wasm/chunks.c:56-72)
  missing-term rules / default results         ← script/src/main.ts:368-389
  boolean kernel AND/OR/ANDNOT                 ← wasm/index.c:76-104
  rank-select pagination                       ← wasm/index.c:115-128
  doc fetch join                               ← script/src/main.ts:408-416

The kernel is numpy over decoded posting blocks. Intersections decode ONLY
the blocks whose [min,max] docID range can contain a candidate (the
block_max_doc skip list); BM25 uses per-term upper bounds
(idf·(k1+1)·max_weight) for MaxScore-style term pruning and the same block
skipping for tf lookup — the block-max machinery the reference lacks
because it never scores.

The driver-side kernel is the low-latency path (query terms ≤ 50, postings
for ≤ 50 terms fit one machine — same deployment shape as the reference's
worker). ``postings_for_terms``/``doc_fetch`` expose the distributed pieces.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import idf_value, load_stats
from .codec import PostingBlocks, concat_blocks, decode_all, decode_block
from .oracle import Query, QueryTooLarge, SearchResult


def _row_to_blocks(row) -> PostingBlocks:
    return PostingBlocks(
        first_doc=np.array(row["block_first_doc"], dtype=np.int64),
        max_doc=np.array(row["block_max_doc"], dtype=np.int64),
        counts=np.array(row["block_count"], dtype=np.int32),
        offsets=np.array(row["block_offset"], dtype=np.int64),
        max_weight=np.array(row["block_max_weight"], dtype=np.float32),
        kinds=np.array(row["block_kind"], dtype=np.uint8),
        payload=bytes(row["payload"]),
    )


def lookup_tfs(pb: PostingBlocks, doc_ids: np.ndarray) -> np.ndarray:
    """tf for each (sorted) candidate docID, 0 when absent.

    Sparse candidates → block-skip path (decode only candidate-bearing
    blocks). Dense candidates (would touch most blocks anyway) → one
    vectorized full decode + searchsorted, which beats ~10 µs/block python
    looping by ~100× on hot terms."""
    out = np.zeros(doc_ids.size, dtype=np.int64)
    if pb.n_blocks == 0 or doc_ids.size == 0:
        return out
    # block index owning each candidate: first block with max_doc >= cand
    blk = np.searchsorted(pb.max_doc, doc_ids, side="left")
    valid = blk < pb.n_blocks
    touched = np.unique(blk[valid])
    if touched.size > max(32, pb.n_blocks // 4):
        docs, tfs = decode_all(pb)
        pos = np.searchsorted(docs, doc_ids)
        pos_ok = pos < docs.size
        hit = np.zeros(doc_ids.size, dtype=bool)
        hit[pos_ok] = docs[pos[pos_ok]] == doc_ids[pos_ok]
        out[hit] = tfs[pos[hit]]
        return out
    for b in touched:
        sel = valid & (blk == b)
        docs, tfs = decode_block(pb, int(b))
        pos = np.searchsorted(docs, doc_ids[sel])
        pos_ok = pos < docs.size
        hit = np.zeros(int(sel.sum()), dtype=bool)
        hit[pos_ok] = docs[pos[pos_ok]] == doc_ids[sel][pos_ok]
        idx = np.flatnonzero(sel)[hit]
        out[idx] = tfs[pos[hit]]
    return out


class TermPostings:
    __slots__ = ("term", "df", "max_weight", "blocks")

    def __init__(self, term: str, df: int, max_weight: float, blocks: PostingBlocks):
        self.term, self.df, self.max_weight, self.blocks = term, df, max_weight, blocks

    # ---- kernel interface (shared with LazyTermPostings) ----
    @property
    def n_blocks(self) -> int:
        return self.blocks.n_blocks

    def block_max_weights(self) -> np.ndarray:
        return self.blocks.max_weight

    def block_ranges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(first_doc, max_doc, counts) per block — metadata only."""
        return self.blocks.first_doc, self.blocks.max_doc, self.blocks.counts

    def all_docs(self) -> np.ndarray:
        return decode_all(self.blocks)[0]

    def lookup_tfs(self, doc_ids: np.ndarray) -> np.ndarray:
        return lookup_tfs(self.blocks, doc_ids)

    def decode_blocks_docs(self, block_idx: np.ndarray) -> np.ndarray:
        if block_idx.size == 0:
            return np.empty(0, np.int64)
        return np.concatenate([decode_block(self.blocks, int(i))[0] for i in block_idx])


class LazyTermPostings:
    """Hot-term postings with driver-bounded memory: only block METADATA is
    collected up front (the payload column is pruned from the scan); payload
    bytes are fetched on demand at (term, salt)-shard granularity, and only
    for shards that can contain a candidate. This is the driver-kernel
    analogue of the reference worker streaming one chunk at a time
    (script/src/main.ts:191-240) — at 10^12 docs a df≈N term's full posting
    list is tens of GB and must never be collected whole; a require+rare
    query touches only the rare term's salt ranges of it.

    ``bytes_fetched`` counts actual payload bytes transferred (test-asserted
    ≪ total_payload_bytes)."""

    __slots__ = (
        "term", "df", "max_weight", "_engine", "_salts", "_shard_meta",
        "_shard_payload", "_blk_shard", "_first_doc", "_max_doc", "_max_w",
        "bytes_fetched", "total_payload_bytes",
    )

    def __init__(self, engine: "SearchEngine", term: str, meta_rows: list):
        self._engine = engine
        self.term = term
        # shards in docID order (salt, then first-block first_doc for
        # multi-segment splits of one salt bucket)
        shards = sorted(
            meta_rows,
            key=lambda r: (r["salt"], r["block_first_doc"][0] if r["block_first_doc"] else -1),
        )
        self.df = int(sum(r["df"] for r in shards))
        self._salts = [int(r["salt"]) for r in shards]
        self._shard_meta = []
        self._shard_payload: dict[int, PostingBlocks] = {}
        blk_shard = []
        for si, r in enumerate(shards):
            meta = {
                "first_doc": np.array(r["block_first_doc"], dtype=np.int64),
                "max_doc": np.array(r["block_max_doc"], dtype=np.int64),
                "counts": np.array(r["block_count"], dtype=np.int32),
                "offsets": np.array(r["block_offset"], dtype=np.int64),
                "max_weight": np.array(r["block_max_weight"], dtype=np.float32),
                "kinds": np.array(r["block_kind"], dtype=np.uint8),
            }
            self._shard_meta.append(meta)
            blk_shard.append(np.full(meta["counts"].size, si, dtype=np.int64))
        self._blk_shard = np.concatenate(blk_shard) if blk_shard else np.empty(0, np.int64)
        self._first_doc = np.concatenate([m["first_doc"] for m in self._shard_meta])
        self._max_doc = np.concatenate([m["max_doc"] for m in self._shard_meta])
        self._max_w = np.concatenate([m["max_weight"] for m in self._shard_meta])
        self.max_weight = float(self._max_w.max()) if self._max_w.size else 0.0
        self.bytes_fetched = 0
        self.total_payload_bytes = int(sum(int(m["offsets"][-1]) for m in self._shard_meta))

    @property
    def n_blocks(self) -> int:
        return int(self._blk_shard.size)

    def block_max_weights(self) -> np.ndarray:
        return self._max_w

    def block_ranges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        counts = np.concatenate([m["counts"] for m in self._shard_meta])
        return self._first_doc, self._max_doc, counts

    # ---- shard payload fetch ----
    def _ensure_shards(self, shard_idx: np.ndarray) -> None:
        need = [int(s) for s in np.unique(shard_idx) if int(s) not in self._shard_payload]
        if not need:
            return
        salts = sorted({self._salts[s] for s in need})
        rows = (
            self._engine._postings_df
            .filter((F.col("term") == self.term) & F.col("salt").isin(salts))
            .collect()
        )
        # rebuild shard order exactly as __init__ did, then keep needed ones
        fetched = sorted(
            rows, key=lambda r: (r["salt"], r["block_first_doc"][0] if r["block_first_doc"] else -1)
        )
        by_key = {(int(r["salt"]), int(r["block_first_doc"][0])): r for r in fetched if r["block_first_doc"]}
        for s in need:
            m = self._shard_meta[s]
            r = by_key[(self._salts[s], int(m["first_doc"][0]))]
            self._shard_payload[s] = _row_to_blocks(r)
            self.bytes_fetched += len(self._shard_payload[s].payload)

    def _blocks_for_docs(self, doc_ids: np.ndarray) -> np.ndarray:
        blk = np.searchsorted(self._max_doc, doc_ids, side="left")
        return blk[blk < self.n_blocks]

    # ---- kernel interface ----
    def lookup_tfs(self, doc_ids: np.ndarray) -> np.ndarray:
        out = np.zeros(doc_ids.size, dtype=np.int64)
        if doc_ids.size == 0 or self.n_blocks == 0:
            return out
        blk = self._blocks_for_docs(doc_ids)
        if blk.size == 0:
            return out
        shards = np.unique(self._blk_shard[blk])
        self._ensure_shards(shards)
        for s in shards:
            m = self._shard_meta[int(s)]
            lo, hi = int(m["first_doc"][0]), int(m["max_doc"][-1])
            sel = (doc_ids >= lo) & (doc_ids <= hi)
            if sel.any():
                out[sel] = lookup_tfs(self._shard_payload[int(s)], doc_ids[sel])
        return out

    def all_docs(self) -> np.ndarray:
        """Full decode — fetches every shard. Kept for contain/exclude-union
        queries with no require clause; bounded paths never call this."""
        if self.n_blocks == 0:
            return np.empty(0, np.int64)
        self._ensure_shards(np.arange(len(self._shard_meta)))
        return np.concatenate(
            [decode_all(self._shard_payload[s])[0] for s in range(len(self._shard_meta))]
        )

    def decode_blocks_docs(self, block_idx: np.ndarray) -> np.ndarray:
        if block_idx.size == 0:
            return np.empty(0, np.int64)
        shards = self._blk_shard[block_idx]
        self._ensure_shards(np.unique(shards))
        shard_base = np.concatenate([[0], np.cumsum([m["counts"].size for m in self._shard_meta])])
        return np.concatenate(
            [
                decode_block(self._shard_payload[int(s)], int(b - shard_base[int(s)]))[0]
                for b, s in zip(block_idx, shards)
            ]
        )


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str, lazy_min_df: int | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        self.n_docs: int = self.stats["n_docs"]
        self.k1: float = self.stats["k1"]
        self.b: float = self.stats["b"]
        self.avgdl: float = self.stats["avgdl"] or 1.0
        self.max_query_terms: int = self.stats.get("max_query_terms", 50)
        self.max_results: int = self.stats.get("max_results", 50)
        # terms with df above this are served lazily: metadata first, payload
        # per candidate-bearing shard — bounds driver memory on hot terms
        self.lazy_min_df: int = lazy_min_df if lazy_min_df is not None else 1_000_000
        self._postings_df = spark.read.parquet(f"{index_dir}/postings")
        self._term_stats_df = spark.read.parquet(f"{index_dir}/term_stats")
        self._docs_df = spark.read.parquet(f"{index_dir}/docs")
        self._cache: dict[str, TermPostings | LazyTermPostings | None] = {}
        self._df_cache: dict[str, int | None] = {}
        self._dict_complete = False  # warm() may load the whole term dict
        self._doclens: np.ndarray | None = None

    def warm(self, max_dict_terms: int = 2_000_000) -> "SearchEngine":
        """Pin the postings table in executor memory (Spark cache), load the
        norms, and (when the dictionary fits) pull the whole term→df map to
        the driver so query routing never runs a term_stats job — the serving
        posture for repeated queries. At 10^12-doc scale one caches the hot
        term range, not the whole table; the filter pushdown path is
        identical either way."""
        self._postings_df = self._postings_df.cache()
        self._postings_df.count()
        _ = self.doclens
        rows = self._term_stats_df.select("term", "df").limit(max_dict_terms + 1).collect()
        if len(rows) <= max_dict_terms:
            dfs: dict[str, int] = {}
            for r in rows:  # multi-segment unions: one row per segment
                dfs[r["term"]] = dfs.get(r["term"], 0) + int(r["df"])
            self._df_cache.update(dfs)
            self._dict_complete = True
        return self

    # ---- doc-length norms cache (Lucene-norms analogue) ----
    @property
    def doclens(self) -> np.ndarray:
        if self._doclens is None:
            pdf = self.spark.read.parquet(f"{self.index_dir}/doclens").toPandas()
            arr = np.zeros(self.n_docs, dtype=np.int64)
            arr[pdf["doc_id"].to_numpy()] = pdf["dl"].to_numpy()
            self._doclens = arr
        return self._doclens

    # ---- term existence + df from the (tiny) term_stats table ----
    def _term_dfs(self, terms: list[str]) -> dict[str, int | None]:
        missing = [t for t in set(terms) if t not in self._df_cache]
        if missing and self._dict_complete:
            for t in missing:
                self._df_cache[t] = None  # complete dict ⇒ absent term
            missing = []
        if missing:
            rows = (
                self._term_stats_df.filter(F.col("term").isin(missing))
                .select("term", "df").collect()
            )
            found: dict[str, int] = {}
            for r in rows:  # multi-segment unions yield one row per segment
                found[r["term"]] = found.get(r["term"], 0) + int(r["df"])
            for t in missing:
                self._df_cache[t] = found.get(t)
        return {t: self._df_cache[t] for t in terms}

    _META_COLS = (
        "term", "salt", "df", "block_first_doc", "block_max_doc",
        "block_count", "block_offset", "block_max_weight", "block_kind",
    )

    # ---- batched postings fetch: one scan serves all terms ----
    def fetch_terms(self, terms: list[str]) -> dict[str, TermPostings | LazyTermPostings | None]:
        missing = [t for t in set(terms) if t not in self._cache]
        if missing:
            # routing first: term_stats (narrow, range-sorted, pushdown) says
            # which terms exist and how hot they are. Small terms get ONE
            # payload scan serving the whole query (reference Q6); hot terms
            # get a metadata-only scan (payload column pruned) and fetch
            # payload lazily per candidate-bearing shard (LazyTermPostings).
            dfs = self._term_dfs(missing)
            small = [t for t in missing if dfs[t] is not None and dfs[t] <= self.lazy_min_df]
            hot = [t for t in missing if dfs[t] is not None and dfs[t] > self.lazy_min_df]
            for t in missing:
                if dfs[t] is None:
                    self._cache[t] = None
            if small:
                rows = self._postings_df.filter(F.col("term").isin(small)).collect()
                by_term: dict[str, list] = {}
                for r in rows:
                    by_term.setdefault(r["term"], []).append(r)
                for t in small:
                    if t not in by_term:
                        self._cache[t] = None
                        continue
                    # order shards by (salt, first-block docID): multi-segment
                    # indexes can split one salt bucket across segments with
                    # disjoint docID ranges — the secondary key orders those
                    shards = sorted(
                        by_term[t],
                        key=lambda r: (r["salt"], r["block_first_doc"][0] if r["block_first_doc"] else -1),
                    )
                    pb = concat_blocks([_row_to_blocks(r) for r in shards])
                    self._cache[t] = TermPostings(
                        t,
                        int(sum(r["df"] for r in shards)),
                        float(pb.max_weight.max()) if pb.n_blocks else 0.0,
                        pb,
                    )
            if hot:
                meta = (
                    self._postings_df.select(*self._META_COLS)
                    .filter(F.col("term").isin(hot)).collect()
                )
                by_term = {}
                for r in meta:
                    by_term.setdefault(r["term"], []).append(r)
                for t in hot:
                    self._cache[t] = LazyTermPostings(self, t, by_term[t]) if t in by_term else None
        return {t: self._cache[t] for t in terms}

    def idf(self, df: int) -> float:
        return float(idf_value(self.n_docs, df, self.stats.get("idf", "lucene")))

    # ---- boolean result set (reference semantics incl. quirks) ----
    def _result_docs(self, q: Query) -> np.ndarray | None:
        """Sorted docID array, or None ⇒ default-results path."""
        n_terms = len(q.require) + len(q.contain) + len(q.exclude)
        if n_terms > self.max_query_terms:
            raise QueryTooLarge(n_terms)
        tp = self.fetch_terms(list(q.require) + list(q.contain) + list(q.exclude))
        if any(tp[t] is None for t in q.require):
            return np.empty(0, np.int64)  # missing REQUIRE → instant empty
        contain = [t for t in q.contain if tp[t] is not None]
        exclude = [t for t in q.exclude if tp[t] is not None]
        if not q.require and not contain and not exclude:
            return None
        result: np.ndarray | None = None
        if q.require:
            # smallest-df-first: seed with the rarest list, then block-skip
            # intersect (the reference AND-folds in input order — result set
            # is identical, order of folding is a pure optimization, SURVEY §4).
            # Hot terms past the seed are PROBED, never decoded whole — with a
            # lazy seed-mate only candidate-bearing shards are even fetched.
            req = sorted((tp[t] for t in q.require), key=lambda p: p.df)
            result = req[0].all_docs()
            for p in req[1:]:
                if result.size == 0:
                    break
                result = result[p.lookup_tfs(result) > 0]
        if contain:
            if result is None:
                result = np.unique(np.concatenate([tp[t].all_docs() for t in contain]))
            else:
                # probe instead of union-decode: docs already out stay out
                mask = np.zeros(result.size, dtype=bool)
                for t in contain:
                    rem = ~mask
                    if not rem.any():
                        break
                    mask[rem] = tp[t].lookup_tfs(result[rem]) > 0
                result = result[mask]
        if exclude:
            if result is None:
                # exclude-only quirk: union BECOMES the result (wasm/index.c:100-104)
                result = np.unique(np.concatenate([tp[t].all_docs() for t in exclude]))
            else:
                mask = np.zeros(result.size, dtype=bool)
                for t in exclude:
                    rem = ~mask
                    if not rem.any():
                        break
                    mask[rem] = tp[t].lookup_tfs(result[rem]) > 0
                result = result[~mask]
        assert result is not None
        return result

    def _default_results(self, q: Query) -> SearchResult:
        after = q.continuation + q.k
        docs = [i for i in range(q.continuation, after) if 0 <= i < self.n_docs]
        cont = after if self.n_docs > after else None
        return SearchResult(self.n_docs, cont, docs, [0.0] * len(docs))

    @staticmethod
    def _paginate(ordered: np.ndarray, c: int, k: int) -> tuple[np.ndarray, int | None]:
        total = ordered.size
        if c >= total:
            return np.empty(0, np.int64), None
        last = min(total - 1, c + k - 1)
        return ordered[c : last + 1], (None if last == total - 1 else last + 1)

    def search(self, q: Query) -> SearchResult:
        """Boolean mode — bit-for-bit reference semantics."""
        docs = self._result_docs(q)
        if docs is None:
            return self._default_results(q)
        page, cont = self._paginate(docs, q.continuation, q.k)
        return SearchResult(int(docs.size), cont, page.tolist())

    def search_bm25(self, q: Query) -> SearchResult:
        """BM25 top-k over the boolean candidate set; order (score desc,
        doc_id asc). Uses MaxScore term bounds: terms whose upper bound
        cannot alter the current page are still scored here for exactness —
        bound-based early exit lives in wand.py (same results, fewer
        decodes)."""
        cands = self._result_docs(q)
        if cands is None:
            return self._default_results(q)
        if cands.size == 0:
            return SearchResult(0, None, [], [])
        tp = self.fetch_terms(list(dict.fromkeys(q.require + q.contain)))
        scoring = [p for p in tp.values() if p is not None]
        scores = np.zeros(cands.size, dtype=np.float64)
        dl = self.doclens[cands]
        knorm = self.k1 * (1 - self.b + self.b * dl / self.avgdl)
        for p in scoring:
            tf = p.lookup_tfs(cands)
            mask = tf > 0
            if mask.any():
                w = tf[mask] / (tf[mask] + knorm[mask])
                scores[mask] += self.idf(p.df) * (self.k1 + 1) * w
        order = np.lexsort((cands, -scores))
        ranked_docs = cands[order]
        ranked_scores = scores[order]
        page, cont = self._paginate(ranked_docs, q.continuation, q.k)
        lo = q.continuation
        return SearchResult(int(cands.size), cont, page.tolist(),
                            ranked_scores[lo : lo + page.size].tolist())

    def _union_total(self, present: list) -> int:
        """Exact |∪ postings| from block METADATA where possible: a block
        whose [first,max] docID range intersects no other term's blocks holds
        docs unique to its term (a shared doc would sit in an overlapping
        block of the other term), so its count adds directly; only blocks
        overlapping another term's range are decoded and deduped. For salted
        range-bucketed lists disjoint salt ranges never decode at all."""
        if len(present) == 1:
            return int(present[0].df)
        ranges = [p.block_ranges() for p in present]
        decode_idx: list[np.ndarray] = []
        total = 0
        for i, (fi, mi, ci) in enumerate(ranges):
            overlap = np.zeros(fi.size, dtype=bool)
            for j, (fj, mj, _cj) in enumerate(ranges):
                if i == j or fj.size == 0:
                    continue
                # block b of i overlaps some block of j iff the last j-block
                # starting ≤ mi[b] ends ≥ fi[b]; j's blocks are disjoint+sorted
                k = np.searchsorted(fj, mi, side="right") - 1
                ok = k >= 0
                overlap[ok] |= mj[k[ok]] >= fi[ok]
            total += int(ci[~overlap].sum())
            decode_idx.append(np.flatnonzero(overlap))
        dec = [p.decode_blocks_docs(idx) for p, idx in zip(present, decode_idx) if idx.size]
        if dec:
            total += int(np.unique(np.concatenate(dec)).size)
        return total

    def search_bm25_wand(self, q: Query, exact_total: bool = True) -> SearchResult:
        """BM25 top-k via the block-max WAND/MaxScore kernel (wand.py) —
        rank-identical to search_bm25, pruned.

        Mixed-mode queries (require/exclude present) run WAND over the
        scoring terms (dedup of require+contain, like the reference-shaped
        scorer) with a candidate filter from the boolean kernel: every
        candidate appears in every require term, so the WAND unseen-doc
        invariant still holds and pruning can only skip docs that provably
        cannot enter the page. total is exactly |candidates| — free.

        Contain-only queries seed purely from block maxima; exact_total=True
        computes the union cardinality from block metadata, decoding only
        blocks whose ranges overlap another term's (exact, usually cheap).
        exact_total=False skips it (total = -1) — the latency-optimal mode
        when callers only need the page."""
        if not q.contain and not q.require:
            return self.search_bm25(q)  # default page / exclude-only quirk path
        n_terms = len(q.require) + len(q.contain) + len(q.exclude)
        if n_terms > self.max_query_terms:
            raise QueryTooLarge(n_terms)
        from .wand import wand_topk

        k_eff = q.continuation + q.k
        candidate_filter = None
        if q.require or q.exclude:
            cands = self._result_docs(q)
            if cands is None:
                return self._default_results(q)
            if cands.size == 0:
                return SearchResult(0, None, [], [])
            total = int(cands.size)

            def candidate_filter(docs: np.ndarray, _c=cands) -> np.ndarray:
                pos = np.searchsorted(_c, docs)
                ok = pos < _c.size
                ok[ok] = _c[pos[ok]] == docs[ok]
                return docs[ok]

            tp = self.fetch_terms(list(dict.fromkeys(q.require + q.contain)))
            present = [p for p in tp.values() if p is not None]
            if not present:
                # no scoring term exists (e.g. all contain terms missing on an
                # exclude-quirk candidate set): every candidate scores 0 and
                # pages by docID — the exhaustive path, nothing to prune
                return self.search_bm25(q)
        else:
            tp = self.fetch_terms(list(q.contain))
            present = [p for p in tp.values() if p is not None]
            if not present:
                return self._default_results(q)
            total = self._union_total(present) if exact_total else -1
        res = wand_topk(
            [(self.idf(p.df), p) for p in present],
            k_eff,
            self.doclens,
            self.k1,
            self.b,
            self.avgdl,
            candidate_filter=candidate_filter,
        )
        if q.continuation >= res.doc_ids.size:
            return SearchResult(total, None, [], [])
        page = res.doc_ids[q.continuation : k_eff]
        scores = res.scores[q.continuation : k_eff]
        last = q.continuation + page.size - 1
        cont = None if (total >= 0 and last == total - 1) or page.size < q.k else last + 1
        return SearchResult(total, cont, page.tolist(), scores.tolist())

    # ---- doc fetch (reference Q15: join result IDs to the docs store) ----
    def fetch_docs(self, doc_ids: list[int]) -> DataFrame:
        ids_df = self.spark.createDataFrame([(int(d),) for d in doc_ids] or [(None,)], "doc_id long")
        return self._docs_df.join(F.broadcast(ids_df.filter(F.col("doc_id").isNotNull())), "doc_id")
