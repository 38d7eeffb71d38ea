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

import os
from collections import OrderedDict

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import idf_value, load_stats
from .codec import PostingBlocks, concat_blocks, decode_all, decode_block
from .oracle import Query, QueryTooLarge, SearchResult

# Stored block/shard max weights are float32 while exact scores are float64:
# round-to-nearest can put the stored bound up to 0.5 ulp BELOW the true
# maximum score (relative ~6e-8), so a pruning bound compared ≥ θ without
# slack could drop a doc that ties or infinitesimally beats θ (observable on
# uniform corpora where θ lands exactly on the top bound). One float32 ulp of
# inflation (2^-23 ≈ 1.2e-7) restores a true upper bound; real skip margins
# are orders of magnitude larger, so pruning power is unaffected.
F32_BOUND_SLACK = 1.0 + 2.0**-23


def _row_to_blocks(row) -> PostingBlocks:
    mtf = (row["block_max_tf"]
           if "block_max_tf" in row.__fields__ and row["block_max_tf"] is not None
           else None)
    return PostingBlocks(
        first_doc=np.array(row["block_first_doc"], dtype=np.int64),
        max_doc=np.array(row["block_max_doc"], dtype=np.int64),
        counts=np.array(row["block_count"], dtype=np.int32),
        offsets=np.array(row["block_offset"], dtype=np.int64),
        max_weight=np.array(row["block_max_weight"], dtype=np.float32),
        kinds=np.array(row["block_kind"], dtype=np.uint8),
        payload=bytes(row["payload"]),
        max_tf=np.array(mtf, dtype=np.int32) if mtf is not None else None,
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


class NormsCache:
    """docID-range-paged doc-length norms with a bounded LRU — the norms
    twin of the two-level lazy postings fetch (VERDICT r4 #4).

    The eager norms array is the serving-node ceiling at extreme scale
    (int32 × n_docs = 4 GB at 10^9 docs); a kernel query only ever norms
    its CANDIDATE docs, which cluster in few docID ranges. Pages load on
    demand via driver-local pyarrow (zero Spark jobs — the doclens parquet
    is docID-ordered, so range filters prune row groups), and the LRU
    bounds residency at max_pages × page_docs × 4 bytes.

    Supports exactly the kernel's access pattern: ``norms[np.ndarray]``
    fancy indexing, returning int32 (score arithmetic promotes to float64
    identically to the eager array). ``pages_fetched`` is test-asserted."""

    def __init__(self, doclens_dirs: list[str], n_docs: int,
                 page_docs: int = 1 << 22, max_pages: int = 64):
        import glob as _glob

        import pyarrow.dataset as ds

        # one child dataset PER DIR, each bound to its own filesystem
        # (ADVICE r5: a shared `fs` from the last remote dir would resolve
        # local / other-scheme segment paths against the wrong filesystem
        # in a mixed multi-segment engine); union-ed below.
        dsets = []
        for d in doclens_dirs:
            if "://" not in d or d.startswith("file://"):
                local = d[len("file://"):] if d.startswith("file://") else d
                files = sorted(_glob.glob(os.path.join(local, "*.parquet")))
                if files:
                    dsets.append(ds.dataset(files, format="parquet"))
            else:
                # remote (hdfs://, s3a://) index dir: glob sees nothing —
                # list through pyarrow's filesystem (bloom-sidecar posture)
                from pyarrow import fs as pafs

                uri = "s3://" + d[len("s3a://"):] if d.startswith("s3a://") else d
                fs, rel = pafs.FileSystem.from_uri(uri)
                infos = fs.get_file_info(pafs.FileSelector(rel, recursive=False))
                files = sorted(i.path for i in infos
                               if i.type == pafs.FileType.File
                               and i.path.endswith(".parquet"))
                if files:
                    dsets.append(ds.dataset(files, format="parquet", filesystem=fs))
        if not dsets and n_docs:
            # an empty dataset would fail only at first query with an opaque
            # ArrowInvalid — fail construction loudly instead
            raise FileNotFoundError(f"no doclens parquet under {doclens_dirs}")
        self._dset = (None if not dsets
                      else dsets[0] if len(dsets) == 1 else ds.dataset(dsets))
        self._ds = ds
        self.n_docs = int(n_docs)
        self.page_docs = int(page_docs)
        self.max_pages = max(1, int(max_pages))
        self._pages: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self.pages_fetched = 0

    def _page(self, pid: int) -> np.ndarray:
        pages = self._pages
        if pid in pages:
            pages.move_to_end(pid)
            return pages[pid]
        lo = pid * self.page_docs
        hi = min(lo + self.page_docs, self.n_docs)
        if self._dset is None:  # only reachable when n_docs == 0
            page = np.zeros(max(hi - lo, 0), dtype=np.int32)
            pages[pid] = page
            return page
        tbl = self._dset.to_table(
            columns=["doc_id", "dl"],
            filter=(self._ds.field("doc_id") >= lo) & (self._ds.field("doc_id") < hi))
        page = np.zeros(hi - lo, dtype=np.int32)
        if tbl.num_rows:
            ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
            page[ids - lo] = tbl["dl"].to_numpy(zero_copy_only=False)
        self.pages_fetched += 1
        pages[pid] = page
        while len(pages) > self.max_pages:
            pages.popitem(last=False)
        return page

    def __getitem__(self, docs: np.ndarray) -> np.ndarray:
        docs = np.asarray(docs, dtype=np.int64)
        out = np.zeros(docs.shape, dtype=np.int32)
        if docs.size == 0:
            return out
        pids = docs // self.page_docs
        for pid in np.unique(pids):
            sel = pids == pid
            out[sel] = self._page(int(pid))[docs[sel] - int(pid) * self.page_docs]
        return out

    def __len__(self) -> int:
        return self.n_docs


class TermPostings:
    lazy = False  # fully materialized on the driver (wand.py skips θ-bootstrap)

    __slots__ = ("term", "df", "max_weight", "blocks", "_dec", "_on_decode")

    def __init__(self, term: str, df: int, max_weight: float, blocks: PostingBlocks,
                 on_decode=None):
        self.term, self.df, self.max_weight, self.blocks = term, df, max_weight, blocks
        # decode-once memo (docs, tfs): a query touches the same list many
        # times (boolean kernel, WAND seeding, exact rescoring) and the
        # repeated decode_all was the measured kernel hotspot (~0.05 s per
        # decode of a df≈500k list, up to 7 decodes per mixed query). Per
        # term the memo is ≤ 16 MB (eager terms hold ≤ lazy_min_df postings;
        # hotter terms are LazyTermPostings); ACROSS terms the owning engine
        # bounds live memos with an LRU via ``on_decode`` — only the
        # compressed blocks stay cached for evicted terms, so a long-running
        # serving process doesn't grow driver RSS with every distinct term.
        self._dec: tuple[np.ndarray, np.ndarray] | None = None
        self._on_decode = on_decode

    # ---- kernel interface (shared with LazyTermPostings) ----
    @property
    def n_blocks(self) -> int:
        return self.blocks.n_blocks

    def _decoded(self) -> tuple[np.ndarray, np.ndarray]:
        if self._dec is None:
            self._dec = decode_all(self.blocks)
            if self._on_decode is not None:
                self._on_decode(self)
        return self._dec

    def block_ranges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(first_doc, max_doc, counts) per block — metadata only."""
        return self.blocks.first_doc, self.blocks.max_doc, self.blocks.counts

    def all_docs(self) -> np.ndarray:
        return self._decoded()[0]

    def lookup_tfs(self, doc_ids: np.ndarray) -> np.ndarray:
        if self._dec is None:
            # not decoded yet: sparse probes take the block-skip path (never
            # force a full decode for a few candidates); dense probes decode
            # once and keep it
            blk = np.searchsorted(self.blocks.max_doc, doc_ids, side="left")
            touched = np.unique(blk[blk < self.blocks.n_blocks])
            if touched.size <= max(32, self.blocks.n_blocks // 4):
                return lookup_tfs(self.blocks, doc_ids)
            self._decoded()
        docs, tfs = self._dec
        out = np.zeros(doc_ids.size, dtype=np.int64)
        pos = np.searchsorted(docs, doc_ids)
        ok = pos < docs.size
        hit = np.zeros(doc_ids.size, dtype=bool)
        hit[ok] = docs[pos[ok]] == doc_ids[ok]
        out[hit] = tfs[pos[hit]]
        return out

    def decode_blocks_docs(self, block_idx: np.ndarray) -> np.ndarray:
        if block_idx.size == 0:
            return np.empty(0, np.int64)
        if self._dec is not None:  # slice the memo — no decoding at all
            bs = np.concatenate([[0], np.cumsum(self.blocks.counts)]).astype(np.int64)
            docs = self._dec[0]
            return np.concatenate([docs[bs[i] : bs[i + 1]] for i in block_idx])
        return np.concatenate([decode_block(self.blocks, int(i))[0] for i in block_idx])

    # ---- WAND seeding protocol ----
    def seed_docs(self, bound_if_new: float, theta: float, idf_k: float) -> tuple[np.ndarray, int]:
        """Doc IDs of this term, decoding only blocks whose bound
        idf_k·block_max_weight + bound_if_new can reach θ for an unseen doc."""
        keep = (idf_k * self.blocks.max_weight.astype(np.float64) * F32_BOUND_SLACK
                + bound_if_new) >= theta
        skipped = int((~keep).sum())
        if not keep.any():
            return np.empty(0, np.int64), skipped
        if keep.all():
            return self.all_docs(), skipped
        if self._dec is None and int(keep.sum()) > self.blocks.n_blocks // 4:
            # mostly-kept: one vectorized decode (memoized) then slice beats
            # a python decode_block call per kept block by ~10×
            self._decoded()
        return self.decode_blocks_docs(np.flatnonzero(keep)), skipped

    def bootstrap_docs(self, n_blocks: int) -> np.ndarray:
        """Docs from the ``n_blocks`` highest-max_weight blocks — the θ
        bootstrap sample (wand.py) that keeps the first seeding term from
        ever decoding its whole list."""
        mw = self.blocks.max_weight
        if mw.size <= n_blocks:
            return self.all_docs()
        top = np.sort(np.argpartition(mw, -n_blocks)[-n_blocks:])
        return self.decode_blocks_docs(top)


class LazyTermPostings:
    """Hot-term postings with TWO-LEVEL lazy metadata and driver-bounded
    memory. Mirrors the reference's two-level chunk lookup (chunk first-keys
    → in-chunk BST, src/build/chunks/mod.rs:24-26, bst.rs:111-131):

      level 1 — one SUMMARY row per (term, salt) shard, aggregated inside
        the scan (min/max docID, df, max weight, payload bytes, n_blocks):
        O(df / 2^salt_shift) driver rows, ~40 B each — at df = 10^11 that is
        ~60 MB of summaries instead of tens of GB of block metadata;
      level 2 — block metadata (33 B / 128-posting block), fetched lazily
        per candidate shard (payload column still pruned from that scan);
      level 3 — payload bytes, fetched per shard only when blocks of that
        shard actually decode.

    This is the driver-kernel analogue of the reference worker streaming one
    chunk at a time (script/src/main.ts:191-240) — a require+rare query
    touches only the rare term's salt ranges of a df≈N list.

    Counters (test-asserted): ``bytes_fetched`` payload bytes actually
    transferred; ``meta_shards_fetched`` shards whose block metadata was
    pulled — both ≪ totals for bounded query shapes.

    Shards are docID-range-disjoint by construction (salt = doc_id >> shift
    is a range bucket; multi-segment splits of one salt carry disjoint
    global docID ranges), so candidate→shard routing is a searchsorted."""

    lazy = True  # wand.py θ-bootstraps before seeding a lazy top term

    __slots__ = (
        "term", "df", "max_weight", "_engine", "_salts", "_smin", "_smax",
        "_smw", "_sdf", "_sbytes", "_snblocks", "_meta", "_payload",
        "bytes_fetched", "total_payload_bytes", "meta_shards_fetched",
    )

    def __init__(self, engine: "SearchEngine", term: str, summary_rows: list):
        self._engine = engine
        self.term = term
        # shards in docID order (salt, then min docID for multi-segment
        # splits of one salt bucket — ranges are disjoint, so this is global
        # docID order)
        shards = sorted(summary_rows, key=lambda r: (r["salt"], r["min_doc"]))
        self.df = int(sum(r["df"] for r in shards))
        self._salts = [int(r["salt"]) for r in shards]
        self._smin = np.array([r["min_doc"] for r in shards], dtype=np.int64)
        self._smax = np.array([r["max_doc"] for r in shards], dtype=np.int64)
        if engine._tf_bounds:
            # stored weights are stale; shard bound from avgdl-free max_tf
            # (vectorized — shards can number df/2^16; -1 marks a missing
            # max_tf, bounded by 1.0 like _bound_arr's None case)
            smtf = np.array(
                [r["max_tf"] if "max_tf" in r.__fields__ and r["max_tf"] is not None
                 else -1 for r in shards], dtype=np.float64)
            c = engine.k1 * (1.0 - engine.b)
            self._smw = np.where(
                (smtf > 0) & (c > 0), (smtf / (smtf + c)) * (1.0 + 1e-12), 1.0)
        else:
            self._smw = np.array([r["max_weight"] for r in shards], dtype=np.float64)
        self._sdf = np.array([r["df"] for r in shards], dtype=np.int64)
        self._sbytes = np.array([r["payload_bytes"] for r in shards], dtype=np.int64)
        self._snblocks = np.array([r["n_blocks"] for r in shards], dtype=np.int64)
        self.max_weight = float(self._smw.max()) if self._smw.size else 0.0
        self._meta: dict[int, dict] = {}
        self._payload: dict[int, PostingBlocks] = {}
        self.bytes_fetched = 0
        self.meta_shards_fetched = 0
        self.total_payload_bytes = int(self._sbytes.sum())

    @property
    def n_shards(self) -> int:
        return int(self._smin.size)

    # ---- level-2/3 fetches ----
    def _match_rows(self, rows: list, need: list[int], what: str) -> dict[int, object]:
        by_key = {(int(r["salt"]), int(r["block_first_doc"][0])): r
                  for r in rows if r["block_first_doc"]}
        out = {}
        for s in need:
            key = (self._salts[s], int(self._smin[s]))
            if key not in by_key:
                raise RuntimeError(
                    f"postings {what} fetch for term={self.term!r} found no row for "
                    f"shard (salt={key[0]}, first_doc={key[1]}) — the index under "
                    f"{self._engine.index_dir!r} changed between the summary scan and "
                    f"this lazy fetch (rewritten/compacted?); rebuild the engine"
                )
            out[s] = by_key[key]
        return out

    def _ensure_meta(self, shard_idx) -> None:
        need = [int(s) for s in np.unique(shard_idx) if int(s) not in self._meta]
        if not need:
            return
        salts = sorted({self._salts[s] for s in need})
        rows = (
            self._engine._postings_df.select(*self._engine._meta_cols)
            .filter((F.col("term") == self.term) & F.col("salt").isin(salts))
            .collect()
        )
        for s, r in self._match_rows(rows, need, "metadata").items():
            n_blk = len(r["block_count"])
            if self._engine._tf_bounds:
                mtf = (r["block_max_tf"]
                       if "block_max_tf" in r.__fields__ and r["block_max_tf"] is not None
                       else None)
                mw = self._engine._bound_arr(mtf, n_blk)
            else:
                mw = np.array(r["block_max_weight"], dtype=np.float32)
            self._meta[s] = {
                "first_doc": np.array(r["block_first_doc"], dtype=np.int64),
                "max_doc": np.array(r["block_max_doc"], dtype=np.int64),
                "counts": np.array(r["block_count"], dtype=np.int32),
                "offsets": np.array(r["block_offset"], dtype=np.int64),
                "max_weight": mw,
                "kinds": np.array(r["block_kind"], dtype=np.uint8),
            }
            self.meta_shards_fetched += 1

    def _ensure_payload(self, shard_idx) -> None:
        need = [int(s) for s in np.unique(shard_idx) if int(s) not in self._payload]
        if not need:
            return
        salts = sorted({self._salts[s] for s in need})
        rows = (
            self._engine._postings_df
            .filter((F.col("term") == self.term) & F.col("salt").isin(salts))
            .collect()
        )
        for s, r in self._match_rows(rows, need, "payload").items():
            pb = _row_to_blocks(r)
            if self._engine._tf_bounds:
                pb.max_weight = self._engine._bound_arr(pb.max_tf, pb.n_blocks)
            self._payload[s] = pb
            self.bytes_fetched += len(pb.payload)
            if s not in self._meta:  # the full row carries metadata too
                self._meta[s] = {
                    "first_doc": pb.first_doc, "max_doc": pb.max_doc,
                    "counts": pb.counts, "offsets": pb.offsets,
                    "max_weight": pb.max_weight, "kinds": pb.kinds,
                }
                self.meta_shards_fetched += 1

    def _shards_for_docs(self, doc_ids: np.ndarray) -> np.ndarray:
        s = np.searchsorted(self._smax, doc_ids, side="left")
        return np.unique(s[s < self.n_shards])

    # ---- kernel interface ----
    def lookup_tfs(self, doc_ids: np.ndarray) -> np.ndarray:
        out = np.zeros(doc_ids.size, dtype=np.int64)
        if doc_ids.size == 0 or self.n_shards == 0:
            return out
        shards = self._shards_for_docs(doc_ids)
        if shards.size == 0:
            return out
        self._ensure_payload(shards)
        for s in shards:
            lo, hi = int(self._smin[s]), int(self._smax[s])
            sel = (doc_ids >= lo) & (doc_ids <= hi)
            if sel.any():
                out[sel] = lookup_tfs(self._payload[int(s)], doc_ids[sel])
        return out

    def all_docs(self) -> np.ndarray:
        """Full decode — fetches every shard. Only reachable below the
        engine's hot_route_df budget; bigger unions are auto-routed to the
        distributed plan and never materialize here."""
        if self.n_shards == 0:
            return np.empty(0, np.int64)
        allsh = np.arange(self.n_shards)
        self._ensure_payload(allsh)
        return np.concatenate([decode_all(self._payload[s])[0] for s in range(self.n_shards)])

    def first_docs(self, n: int) -> np.ndarray:
        """First ``n`` docIDs in ascending order, fetching only the leading
        shards that cover them (shards are docID-disjoint and sorted) —
        O(page), never O(df). The shard summaries' exact per-shard counts
        pick the covering prefix up front, so this is ONE payload fetch.
        Serves single-term docID-ordered pagination."""
        if self.n_shards == 0 or n <= 0:
            return np.empty(0, np.int64)
        cum = np.cumsum(self._sdf)
        k = int(np.searchsorted(cum, n)) + 1  # shards 0..k-1 cover n docs
        need = np.arange(min(k, self.n_shards))
        self._ensure_payload(need)
        return np.concatenate([decode_all(self._payload[int(s)])[0] for s in need])[:n]

    # ---- _union_total interface: shard granularity ----
    def block_ranges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Shard-level ranges (disjoint, sorted, exact counts) — the union
        cardinality algebra in _union_total works at any granularity."""
        return self._smin, self._smax, self._sdf

    def decode_blocks_docs(self, idx: np.ndarray) -> np.ndarray:
        """Indices are SHARD indices (matching block_ranges granularity)."""
        if idx.size == 0:
            return np.empty(0, np.int64)
        shards = np.unique(idx)
        self._ensure_payload(shards)
        return np.concatenate([decode_all(self._payload[int(s)])[0] for s in shards])

    # ---- WAND seeding protocol (two-level: shard skip, then block skip) ----
    def seed_docs(self, bound_if_new: float, theta: float, idf_k: float) -> tuple[np.ndarray, int]:
        keep_shard = (idf_k * self._smw * F32_BOUND_SLACK + bound_if_new) >= theta
        skipped = int(self._snblocks[~keep_shard].sum())
        if not keep_shard.any():
            return np.empty(0, np.int64), skipped
        cand = np.flatnonzero(keep_shard)
        self._ensure_meta(cand)
        docs: list[np.ndarray] = []
        fetch: list[int] = []
        blocks_per_shard: dict[int, np.ndarray] = {}
        for s in cand:
            m = self._meta[int(s)]
            keep_blk = (idf_k * m["max_weight"].astype(np.float64) * F32_BOUND_SLACK
                        + bound_if_new) >= theta
            skipped += int((~keep_blk).sum())
            if keep_blk.any():
                fetch.append(int(s))
                blocks_per_shard[int(s)] = np.flatnonzero(keep_blk)
        if fetch:
            self._ensure_payload(np.array(fetch))
            for s in fetch:
                pb = self._payload[s]
                docs.extend(decode_block(pb, int(b))[0] for b in blocks_per_shard[s])
        return (np.concatenate(docs) if docs else np.empty(0, np.int64)), skipped

    def bootstrap_docs(self, n_blocks: int) -> np.ndarray:
        """Docs from ~n_blocks highest-promise blocks: shards by max_weight
        desc until the block budget is covered, then the top blocks within
        those shards only — never touches the rest of the list."""
        if self.n_shards == 0:
            return np.empty(0, np.int64)
        order = np.argsort(-self._smw, kind="stable")
        take, acc = [], 0
        for s in order:
            take.append(int(s))
            acc += int(self._snblocks[s])
            if acc >= n_blocks:
                break
        self._ensure_meta(np.array(take))
        mws = np.concatenate([self._meta[s]["max_weight"] for s in take])
        owner = np.concatenate([np.full(self._meta[s]["max_weight"].size, s) for s in take])
        local = np.concatenate([np.arange(self._meta[s]["max_weight"].size) for s in take])
        if mws.size > n_blocks:
            sel = np.argpartition(mws, -n_blocks)[-n_blocks:]
        else:
            sel = np.arange(mws.size)
        fetch = np.unique(owner[sel])
        self._ensure_payload(fetch)
        return np.concatenate(
            [decode_block(self._payload[int(owner[i])], int(local[i]))[0] for i in sel]
        ) if sel.size else np.empty(0, np.int64)


class SearchEngine:
    # df budget above which union-shaped work auto-routes to the distributed
    # plan (_search_distributed / _bm25_distributed): the driver never holds
    # more than ~hot_route_df candidate docIDs. Class attribute so subclasses
    # that skip __init__ (MultiSegmentEngine) inherit the posture.
    hot_route_df: int = 5_000_000
    # payload bytes the single-hot-term union-total probe may pull to the
    # driver before it switches to the distributed distinct-count
    union_probe_budget_bytes: int = 32 << 20
    # below this many total postings across a _decoded_for term list, the
    # pre-decode (term, shard) repartition is skipped — the work is too
    # small to straggle and the shuffle stage would be pure fixed latency
    decode_spread_min_postings: int = 65_536
    # terms allowed to hold a live decode memo at once (LRU; ≤16 MB each ⇒
    # ~1 GB decoded ceiling). Class attr so MultiSegmentEngine inherits.
    max_decoded_terms: int = 64
    # norms posture: corpora up to this many docs load the full int32 array
    # (64 MB at the default); bigger ones page norms by docID range with an
    # LRU (NormsCache) — max_pages × page_docs × 4 B resident (1 GB default)
    norms_eager_max_docs: int = 1 << 24
    norms_page_docs: int = 1 << 22
    norms_max_pages: int = 64
    last_route: str = "kernel"  # diagnostics: "kernel" | "distributed"
    # True ⇒ stored block-max WEIGHTS are stale (baked under a different
    # avgdl than the live one — multi-segment, pre-compact) and every
    # pruning bound must be derived from block max_tf instead, which is
    # avgdl-free: w = tf/(tf + k1(1-b+b·dl/avgdl)) ≤ max_tf/(max_tf + k1(1-b))
    _tf_bounds: bool = False

    def __init__(self, spark: SparkSession, index_dir: str, lazy_min_df: int | None = None,
                 hot_route_df: int | None = None):
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
        if hot_route_df is not None:
            self.hot_route_df = hot_route_df
        self._postings_df = spark.read.parquet(f"{index_dir}/postings")
        self._term_stats_df = spark.read.parquet(f"{index_dir}/term_stats")
        self._docs_df = spark.read.parquet(f"{index_dir}/docs")
        self._init_meta_cols()
        self._cache: dict[str, TermPostings | LazyTermPostings | None] = {}
        # LRU of terms currently holding a live decode memo (~16 B/posting
        # of int64 docs+tfs). Eviction drops only the memo — the compressed
        # blocks stay in _cache — so the decoded footprint is bounded at
        # ~max_decoded_terms × 16 MB instead of growing with every distinct
        # term a long-lived serving process ever scores.
        self._dec_lru: "OrderedDict[str, TermPostings]" = OrderedDict()
        self._df_cache: dict[str, int | None] = {}
        self._dict_complete = False  # warm() may load the whole term dict
        self._doclens: np.ndarray | None = None
        self._blooms: list | bool = False  # False = not loaded yet

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

    def _note_decoded(self, tp: TermPostings) -> None:
        """Register a freshly-decoded term in the memo LRU; evict the
        oldest memos past ``max_decoded_terms`` (the compressed blocks
        remain cached — only the 16 B/posting decode is dropped)."""
        lru = self._dec_lru
        lru[tp.term] = tp
        lru.move_to_end(tp.term)
        while len(lru) > max(1, self.max_decoded_terms):
            _, old = lru.popitem(last=False)
            if old is not tp:
                old._dec = None

    # ---- doc-length norms cache (Lucene-norms analogue) ----
    def _doclens_dirs(self) -> list[str]:
        return [f"{self.index_dir}/doclens"]

    @property
    def doclens(self) -> "np.ndarray | NormsCache":
        """int32 norms, indexable by a docID array. Small corpora load the
        whole array once (int32 halves it vs int64; score arithmetic
        promotes to float64 identically from either width); above
        norms_eager_max_docs the norms page in by docID range with an LRU
        (NormsCache) so the kernel's driver footprint is O(hot ranges),
        not O(n_docs) — the 10^9+-doc serving posture."""
        if self._doclens is None:
            if self.n_docs > self.norms_eager_max_docs:
                self._doclens = NormsCache(
                    self._doclens_dirs(), self.n_docs,
                    page_docs=self.norms_page_docs,
                    max_pages=self.norms_max_pages)
            else:
                pdf = self.spark.read.parquet(*self._doclens_dirs()).select("doc_id", "dl").toPandas()
                arr = np.zeros(self.n_docs, dtype=np.int32)
                arr[pdf["doc_id"].to_numpy()] = pdf["dl"].to_numpy()
                self._doclens = arr
        return self._doclens

    # ---- absent-term bloom sidecar (driver-local, no job per novel term) ----
    def _bloom_dirs(self) -> list[str]:
        return [self.index_dir]

    def _bloom_absent(self, term: str) -> bool:
        """True ⇒ the term is definitely not indexed (no false negatives).
        Sidecar access is driver-local pyarrow (zero Spark jobs): small
        dictionaries load whole, huge ones per-range into a bounded LRU;
        indexes built before the sidecar existed fall back to the
        term_stats scan."""
        if self._blooms is False:
            from .bloom import load_term_bloom

            self._blooms = [b for d in self._bloom_dirs()
                            if (b := load_term_bloom(self.spark, d)) is not None]
            if len(self._blooms) < len(self._bloom_dirs()):
                self._blooms = []  # any sidecar-less segment ⇒ can't conclude absence
        if not self._blooms:
            return False
        return all(b.definitely_absent(term) for b in self._blooms)

    # ---- term existence + df from the (tiny) term_stats table ----
    def _term_dfs(self, terms: list[str]) -> dict[str, int | None]:
        missing = [t for t in set(terms) if t not in self._df_cache]
        if missing and self._dict_complete:
            for t in missing:
                self._df_cache[t] = None  # complete dict ⇒ absent term
            missing = []
        if missing:
            # bloom short-circuit: definitely-absent terms never cost a job
            still = []
            for t in missing:
                if self._bloom_absent(t):
                    self._df_cache[t] = None
                else:
                    still.append(t)
            missing = still
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

    def _init_meta_cols(self) -> None:
        """Metadata column set + max_tf availability (pre-max_tf indexes
        lack the column; everything falls back to stored weights)."""
        self._has_max_tf = "block_max_tf" in self._postings_df.columns
        self._meta_cols = self._META_COLS + (("block_max_tf",) if self._has_max_tf else ())

    def _bound_arr(self, max_tf, n_blocks: int) -> np.ndarray:
        """Per-block tf-weight upper bound valid under ANY avgdl:
        w = tf/(tf + k1(1-b+b·dl/avgdl)) ≤ max_tf/(max_tf + k1(1-b)).
        float64 with a hair of headroom so rounding can never understate;
        missing max_tf ⇒ 1.0 (w < 1 always — valid, just unprunable)."""
        if max_tf is None:
            return np.ones(n_blocks, dtype=np.float64)
        t = np.asarray(max_tf, dtype=np.float64)
        c = self.k1 * (1.0 - self.b)
        if c <= 0:
            return np.ones(t.size, dtype=np.float64)
        return (t / (t + c)) * (1.0 + 1e-12)

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
                    if self._tf_bounds:
                        # stale stored weights (multi-segment, pre-compact):
                        # rebind the block maxima from avgdl-free max_tf
                        pb.max_weight = self._bound_arr(pb.max_tf, pb.n_blocks)
                    self._cache[t] = TermPostings(
                        t,
                        int(sum(r["df"] for r in shards)),
                        float(pb.max_weight.max()) if pb.n_blocks else 0.0,
                        pb,
                        on_decode=self._note_decoded,
                    )
            if hot:
                # level-1 summary scan: ONE aggregated row per (term, salt)
                # shard — block metadata stays executor-side until a shard
                # is an actual candidate (two-level lookup, reference
                # src/build/chunks/mod.rs:24-26)
                summ_cols = [
                    "term", "salt", "df",
                    F.element_at("block_first_doc", 1).alias("min_doc"),
                    F.element_at("block_max_doc", -1).alias("max_doc"),
                    F.array_max("block_max_weight").alias("max_weight"),
                    F.element_at("block_offset", -1).alias("payload_bytes"),
                    F.size("block_count").alias("n_blocks"),
                ]
                if self._has_max_tf:
                    summ_cols.append(F.array_max("block_max_tf").alias("max_tf"))
                summ = (
                    self._postings_df.filter(F.col("term").isin(hot))
                    .select(*summ_cols)
                    .collect()
                )
                by_term = {}
                for r in summ:
                    by_term.setdefault(r["term"], []).append(r)
                for t in hot:
                    self._cache[t] = LazyTermPostings(self, t, by_term[t]) if t in by_term else None
        return {t: self._cache[t] for t in terms}

    def idf(self, df: int) -> float:
        return float(idf_value(self.n_docs, df, self.stats.get("idf", "lucene")))

    # ---- query-term fetch + routing ----
    def _fetch_query_terms(self, q: Query) -> dict:
        n_terms = len(q.require) + len(q.contain) + len(q.exclude)
        if n_terms > self.max_query_terms:
            raise QueryTooLarge(n_terms)
        return self.fetch_terms(list(q.require) + list(q.contain) + list(q.exclude))

    def _route_distributed(self, q: Query, tp: dict, for_wand: bool = False) -> bool:
        """True ⇒ this query's driver-kernel work is union-shaped beyond the
        hot_route_df budget and must run as a Spark plan instead (same
        results). Rules (VERDICT r2 'what's wrong #1'):

          * require present: the kernel seeds from the smallest require list
            and probes the rest — bounded unless even the SMALLEST require
            df blows the budget (all-hot-require);
          * contain-only, boolean/exhaustive: the union itself is the result
            set, so ANY contain term above budget routes;
          * contain-only, WAND: seeding is θ/block-bounded, so only the
            all-hot case (min df above budget — no rare term to anchor θ
            cheaply) routes;
          * exclude-only: the quirk materializes the excluded union — any
            hot exclude term routes."""
        budget = self.hot_route_df
        contain = [t for t in q.contain if tp[t] is not None]
        exclude = [t for t in q.exclude if tp[t] is not None]
        if q.require:
            return min(tp[t].df for t in q.require) > budget
        if contain:
            dfs = [tp[t].df for t in contain]
            # WAND's min-df shortcut only applies when it truly runs
            # candidate-free (no exclude clause — even an all-missing one
            # makes the kernel materialize the union as a candidate set)
            return (min(dfs) if for_wand and not q.exclude else max(dfs)) > budget
        if exclude:
            return max(tp[t].df for t in exclude) > budget
        return False

    # ---- boolean result set (reference semantics incl. quirks) ----
    def _result_docs(self, q: Query) -> np.ndarray | None:
        """Sorted docID array, or None ⇒ default-results path."""
        tp = self._fetch_query_terms(q)
        if any(tp[t] is None for t in q.require):
            return np.empty(0, np.int64)  # missing REQUIRE → instant empty
        return self._bool_kernel(q, tp)

    def _bool_kernel(self, q: Query, tp: dict) -> np.ndarray | None:
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
        """Boolean mode — bit-for-bit reference semantics. Union-shaped
        queries over terms hotter than hot_route_df run as a distributed
        plan (identical results; the driver holds only the page)."""
        tp = self._fetch_query_terms(q)
        if any(tp[t] is None for t in q.require):
            return SearchResult(0, None, [])
        if self._route_distributed(q, tp):
            self.last_route = "distributed"
            return self._search_distributed(q, tp)
        self.last_route = "kernel"
        docs = self._bool_kernel(q, tp)
        if docs is None:
            return self._default_results(q)
        page, cont = self._paginate(docs, q.continuation, q.k)
        return SearchResult(int(docs.size), cont, page.tolist())

    def search_df(self, q: Query) -> DataFrame:
        """The boolean result SET as a DataFrame of ``doc_id`` — the fully
        distributed surface for downstream joins (phrase/regex verify,
        batch analytics): no pagination, no ordering, and no driver
        materialization at any candidate cardinality. Membership is
        identical to paging search() to exhaustion (same reference rules:
        missing REQUIRE → empty, missing contain/exclude dropped,
        exclude-only quirk, no clauses → every live doc)."""
        tp = self._fetch_query_terms(q)
        if any(tp[t] is None for t in q.require):
            return self.spark.range(0).select(F.col("id").alias("doc_id"))
        contain = [t for t in q.contain if tp[t] is not None]
        exclude = [t for t in q.exclude if tp[t] is not None]
        if not q.require and not contain and not exclude:
            return self._all_docs_df()
        return self._matched_docs_df(q, tp, scored=False).select("doc_id")

    def _all_docs_df(self) -> DataFrame:
        """Every live docID — the default-results set, distributed."""
        return self.spark.range(self.n_docs).select(F.col("id").cast("long").alias("doc_id"))

    def facets_df(self, q: Query, cols: list[str]) -> DataFrame:
        """Hit counts grouped by docs-store metadata columns — the
        aggregations-alongside-search surface (Elasticsearch terms-agg
        shape). One distributed plan: the boolean result SET (search_df,
        never on the driver) joins the docs store pruned to ``cols`` and
        aggregates; facet cardinality bounds the result size, not the hit
        count — safe at any selectivity."""
        hits = self.search_df(q)
        store = self._docs_df.select("doc_id", *cols)
        return (store.join(hits, "doc_id")
                .groupBy(*cols).agg(F.count(F.lit(1)).alias("n_docs")))

    def suggest_terms(self, term: str, max_distance: int = 1, k: int = 5) -> DataFrame:
        """Did-you-mean: dictionary terms within ``max_distance`` edits,
        best-first by (distance, df desc, term). The scan is pruned by a
        pushed length window before any edit-distance evaluates — over a
        10^9-term dictionary the levenshtein runs on the tiny length band,
        not the dictionary. (term, dist, df) rows; multi-segment dfs sum."""
        t = term.lower()
        n = len(t)
        return (
            self._term_stats_df
            .filter(F.length("term").between(n - max_distance, n + max_distance))
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("dist") <= max_distance)
            .groupBy("term", "dist").agg(F.sum("df").alias("df"))
            .orderBy("dist", F.col("df").desc(), "term")
            .limit(k)
        )

    def _score_docs(self, scoring: list, cands: np.ndarray) -> np.ndarray:
        """Exact BM25 over given docs, summing terms in caller order — the
        single scoring code path, so kernel / WAND / distributed-rescore
        results are bit-identical."""
        scores = np.zeros(cands.size, dtype=np.float64)
        dl = self.doclens[cands]
        knorm = self.k1 * (1 - self.b + self.b * dl / self.avgdl)
        for p in scoring:
            tf = p.lookup_tfs(cands)
            mask = tf > 0
            if mask.any():
                w = tf[mask] / (tf[mask] + knorm[mask])
                scores[mask] += self.idf(p.df) * (self.k1 + 1) * w
        return scores

    def search_bm25(self, q: Query) -> SearchResult:
        """BM25 top-k over the boolean candidate set; order (score desc,
        doc_id asc). Uses MaxScore term bounds: terms whose upper bound
        cannot alter the current page are still scored here for exactness —
        bound-based early exit lives in wand.py (same results, fewer
        decodes). Union-shaped hot queries route to the distributed plan."""
        tp_all = self._fetch_query_terms(q)
        if any(tp_all[t] is None for t in q.require):
            return SearchResult(0, None, [], [])
        if self._route_distributed(q, tp_all):
            self.last_route = "distributed"
            return self._bm25_distributed(q, tp_all, q.continuation + q.k)
        self.last_route = "kernel"
        cands = self._bool_kernel(q, tp_all)
        if cands is None:
            return self._default_results(q)
        if cands.size == 0:
            return SearchResult(0, None, [], [])
        tp = self.fetch_terms(list(dict.fromkeys(q.require + q.contain)))
        scoring = [p for p in tp.values() if p is not None]
        scores = self._score_docs(scoring, cands)
        order = np.lexsort((cands, -scores))
        ranked_docs = cands[order]
        ranked_scores = scores[order]
        page, cont = self._paginate(ranked_docs, q.continuation, q.k)
        lo = q.continuation
        return SearchResult(int(cands.size), cont, page.tolist(),
                            ranked_scores[lo : lo + page.size].tolist())

    # ---- distributed twin: hot union-shaped queries as ONE Spark plan ----
    def _decoded_for(self, terms: "list[str] | Column",
                     postings_df: DataFrame | None = None) -> DataFrame:
        """(term, doc_id, tf) rows for the given terms, decoded executor-side
        (scan pruned by the term filter). Uses self._postings_df so it is
        multi-segment-correct; pass postings_df to decode a sidecar table in
        the same schema (e.g. the hot-bigram common-grams sidecar).
        ``terms`` may be a Column predicate over ``term`` instead of a list —
        e.g. startswith for prefix queries, where the parquet scan prunes by
        the pushed StringStartsWith on the range-sorted term column.

        The compressed shard rows are REPARTITIONED by (term, shard) before
        decode: the build salts hot terms across 2^salt_shift shard rows
        precisely so this work spreads, but the range-sorted layout packs a
        term's shards into ONE row group, so Spark's file-packing hands them
        all to a single scan task — decode, the doclens join, and the
        partial aggregation of a df≈N term then run serially (a measured
        ~2 s straggler at 500k docs, the r6 hot-route regression). The
        shuffle moves only the pruned COMPRESSED payload (~1.6 bits/posting
        × query terms), strictly smaller than the decoded shuffle the
        downstream groupBy pays anyway.

        The spread is GATED on term hotness (ADVICE r6): when every
        requested term's df is already known (the _df_cache fetch_terms
        populates on the query path) and the total postings volume is below
        decode_spread_min_postings, the straggler it fixes cannot exist —
        one task decodes everything in milliseconds — so cold lookups skip
        the extra shuffle stage rather than pay it as fixed latency.
        Unknown dfs (sidecar tables, Column predicates like prefix
        StartsWith) keep the spread: it is the safe default."""
        from .sources.postings import DECODED_SCHEMA, _decode_rows

        pred = terms if isinstance(terms, Column) else F.col("term").isin(terms)
        pt = (postings_df if postings_df is not None else self._postings_df
              ).filter(pred).select(
            "term", "block_first_doc", "block_max_doc", "block_count",
            "block_offset", "block_kind", "payload",
        )
        spread = True
        if (postings_df is None and not isinstance(terms, Column)
                and all(t in self._df_cache for t in terms)):
            total = sum(self._df_cache[t] or 0 for t in terms)
            spread = total > self.decode_spread_min_postings
        if spread:
            pt = pt.repartition(F.col("term"), F.col("block_first_doc"))
        return pt.mapInPandas(_decode_rows, schema=DECODED_SCHEMA)

    def _doclens_df(self) -> DataFrame:
        # project away the per-doc overlong flag (regex-only metadata) so
        # scoring joins never carry it through a shuffle
        return self.spark.read.parquet(f"{self.index_dir}/doclens").select("doc_id", "dl")

    def _overlong_docs_df(self) -> DataFrame | None:
        """docIDs whose content holds a dropped (>MAX_TERM_BYTES)
        alphanumeric run — the only docs where a regex literal can hide
        outside the term dictionary. None when the index predates the
        per-doc flag (0.3.1) — callers must then treat pruning as unsound."""
        df = self.spark.read.parquet(f"{self.index_dir}/doclens")
        if "ol" not in df.columns:
            return None
        return df.filter(F.col("ol") == 1).select("doc_id")

    def bigram_postings_df(self) -> DataFrame | None:
        """The hot-bigram common-grams sidecar (build stage 7), or None when
        the index was built without one. Presence comes from stats.json, not
        a filesystem probe (remote index dirs, ADVICE r4 bloom lesson)."""
        if self.stats.get("bigram_min_df") is None:
            return None
        if not hasattr(self, "_bigram_df"):
            self._bigram_df = self.spark.read.parquet(f"{self.index_dir}/bigram_postings")
        return self._bigram_df

    def bigram_pair_plan(self, pairs: list[str]):
        """Serving plan for adjacent-pair keys ("t1 t2") off the common-grams
        sidecar: ``(exact_df, maybe_df)`` where ``exact_df`` holds
        (term, doc_id) rows that ARE pair adjacency (verify-free) and
        ``maybe_df`` (or None) holds sound-superset rows — docs holding both
        terms — for corpus regions whose sidecar does not cover the pair,
        which the caller must verify. ``None`` when no sidecar exists at
        all. A single-shot index covers every hot pair by construction, so
        the plan is all-exact; MultiSegmentEngine overrides this with the
        per-segment route (each segment serves its own sidecar where the
        pair qualifies LOCALLY, AND-candidates otherwise)."""
        bg = self.bigram_postings_df()
        if bg is None:
            self.last_bigram_plan = None
            return None
        exact = self._decoded_for(pairs, postings_df=bg).select("term", "doc_id")
        self.last_bigram_plan = {"pairs": len(pairs),
                                 "covered_segments": {p: 1 for p in pairs},
                                 "fallback_segments": {p: 0 for p in pairs}}
        return self._live_filter_df(exact), None

    def oltrigrams_df(self) -> DataFrame | None:
        """The overlong-run trigram sidecar (build stage 8), or None when
        the index predates it. Postings over the lowercased trigrams of
        DROPPED (>MAX_TERM_BYTES) alphanumeric runs — the literal evidence
        that lets index_regex_search intersect the overlong-flagged set
        instead of unioning it wholesale. Presence from stats.json, not a
        fs probe (remote index dirs, ADVICE r4 bloom lesson)."""
        if not self.stats.get("overlong_trigrams") or \
                not self.stats.get("overlong_trigram_rows"):
            return None  # rows=0: clean corpus — no table was written
        if not hasattr(self, "_oltri_df"):
            self._oltri_df = self.spark.read.parquet(
                f"{self.index_dir}/overlong_trigrams")
        return self._oltri_df

    def positions_df(self) -> DataFrame | None:
        """The positional sidecar (build stage 6), or None when the index
        was built without one. Presence from stats.json, not a fs probe."""
        if not self.stats.get("positions"):
            return None
        if not hasattr(self, "_positions_df"):
            self._positions_df = self.spark.read.parquet(f"{self.index_dir}/positions")
        return self._positions_df

    def positions_plan(self):
        """Per-segment positional serving plan: ``(pos_df, uncov_postings)``
        where ``pos_df`` (or None when no sidecar exists anywhere) is the
        positional sidecar covering part of the corpus and
        ``uncov_postings`` (or None when coverage is total) is the plain
        postings table of the UNCOVERED part, for the caller's AND+verify
        fallback. A single-shot index is all-or-nothing by construction so
        the fallback side is always None here; MultiSegmentEngine overrides
        with the covered/uncovered split (mirroring bigram_pair_plan — one
        positions-less segment must not disable the sidecar for the whole
        index). Sets ``last_positions_plan`` for observability."""
        pos = self.positions_df()
        self.last_positions_plan = (None if pos is None else
                                    {"covered_segments": 1, "fallback_segments": 0})
        return pos, None

    def _decoded_positions_for(self, terms: list[str],
                               positions_df: DataFrame | None = None) -> DataFrame | None:
        """(term, doc_id, positions array<long>) rows for the given terms,
        decoded executor-side off the positional sidecar (scan pruned by the
        term filter — the same pruned-fetch shape as _decoded_for). None
        when the index carries no sidecar. Pass ``positions_df`` to decode
        an explicit sidecar table (the covered-segment union from
        positions_plan) instead of the engine-wide one."""
        from .sources.postings import POS_DECODED_SCHEMA, _decode_pos_rows

        pt = positions_df if positions_df is not None else self.positions_df()
        if pt is None:
            return None
        pruned = pt.filter(F.col("term").isin(terms)).select(
            "term", "salt", "df", "payload")
        # spread a hot term's salt shards across decode tasks (the range-
        # sorted layout packs them into one row group → one scan task; see
        # _decoded_for) — the shuffle moves only compressed position blobs
        pruned = pruned.repartition(F.col("term"), F.col("salt")).drop("salt")
        return pruned.mapInPandas(_decode_pos_rows, schema=POS_DECODED_SCHEMA)

    def _live_filter_df(self, df: DataFrame) -> DataFrame:
        """Visibility-filter a (doc_id, …) DataFrame against tombstones.
        Identity on a plain engine; MultiSegmentEngine anti-joins deletes —
        positional/sidecar plans call this so their results honor
        Lucene-live-docs semantics like every other result surface."""
        return df

    def _matched_docs_df(self, q: Query, tp: dict, scored: bool) -> DataFrame:
        """(doc_id, score) rows satisfying the boolean clauses — the
        distributed twin of _bool_kernel (+ BM25 partials when scored).
        Missing require terms are the caller's short-circuit; missing
        contain/exclude terms are dropped here (reference rule); the
        exclude-only quirk (union becomes the result) is the final branch.

        Scores are BIT-IDENTICAL to _score_docs (VERDICT r6 #5 — this is
        what lets _bm25_distributed skip the driver rescore): each term's
        partial replicates the kernel's exact float64 operation order —
        the per-term constant idf·(k1+1) is computed driver-side in Python
        (column ``c``), knorm associates as k1·((1−b) + (b·dl)/avgdl),
        w = tf/(tf+knorm) — and the per-doc sum folds the partials in
        CALLER TERM ORDER via a sorted-struct aggregate, not F.sum (whose
        partition-dependent add order reorders float sums). A doc missing a
        contain term contributes no struct for it, exactly the kernel's
        tf>0 mask."""
        require = list(dict.fromkeys(q.require))
        contain = [t for t in dict.fromkeys(q.contain) if tp[t] is not None]
        exclude = [t for t in dict.fromkeys(q.exclude) if tp[t] is not None]
        terms = list(dict.fromkeys(require + contain + exclude))
        # caller scoring order: first occurrence in require+contain — the
        # order _score_docs sums in (fetch_terms preserves input order)
        score_order = {t: i for i, t in enumerate(dict.fromkeys(list(q.require) + list(q.contain)))}
        rset, cset, eset = set(require), set(contain), set(exclude)
        tmeta = self.spark.createDataFrame(
            [
                (t, float(self.idf(tp[t].df)) * (self.k1 + 1),
                 score_order.get(t, -1), t in rset, t in cset, t in eset,
                 t in score_order and tp[t] is not None)
                for t in terms
            ],
            "term string, c double, ord int, is_r boolean, is_c boolean, is_e boolean, is_s boolean",
        )
        hits = self._decoded_for(terms).join(F.broadcast(tmeta), "term")
        # Caller-term-order fold as NESTED CONDITIONAL SUMS: each
        # (doc, ord) has at most ONE row (decoded rows unique per
        # (term, doc), ord unique per term), so sum(when(ord==i, tf)) is
        # order-independent, and chaining the per-ord results
        # ((0+p0)+p1)+… replays _score_docs' float64 operation order
        # exactly — a missing term contributes literal 0.0, and
        # x + 0.0 == x bitwise for the non-negative partials, so the
        # result is bit-identical to the kernel (tested). This replaces
        # a collect_list + array_sort + lambda-aggregate fold that cost
        # ~1 s/query on a df≈N term (ObjectHashAggregate + per-group
        # array machinery vs plain codegen'd HashAggregate). Only the raw
        # per-ord tf crosses the aggregation; the doclens join and the
        # score arithmetic run AFTER the clause filter, on the (smaller)
        # matched set — c = idf·(k1+1) is a driver float per term, exactly
        # the kernel's.
        per_doc = hits.groupBy("doc_id").agg(
            # decoded rows are unique per (term, doc) — shards are docID-
            # disjoint and tmeta has one row per term — so the distinct
            # require count is a plain conditional sum; countDistinct
            # planned an extra two-phase distinct aggregation pass
            F.sum(F.col("is_r").cast("int")).alias("req_hit"),
            F.max(F.col("is_c").cast("int")).alias("con_hit"),
            F.max(F.col("is_e").cast("int")).alias("exc_hit"),
            *[F.sum(F.when(F.col("ord") == i, F.col("tf"))).alias(f"__tf{i}")
              for i in range(len(score_order) if scored else 0)],
        )
        if require or contain:
            cond = (F.col("req_hit") == len(require)) & (F.col("exc_hit") == 0)
            if contain:
                cond = cond & (F.col("con_hit") == 1)
            matched = per_doc.filter(cond)
        else:
            # exclude-only quirk: the excluded union IS the result (wasm/index.c:100-104)
            matched = per_doc.filter(F.col("exc_hit") == 1)
        if not scored:
            return matched.select("doc_id", F.lit(0.0).alias("score"))
        c_of_ord = {score_order[t]: float(self.idf(tp[t].df)) * (self.k1 + 1)
                    for t in score_order if tp.get(t) is not None}
        knorm = F.lit(self.k1) * (
            F.lit(1 - self.b) + (F.lit(self.b) * F.col("dl")) / F.lit(float(self.avgdl))
        )
        score = F.lit(0.0)
        for i in range(len(score_order)):
            if i not in c_of_ord:
                continue  # missing term: no rows, no contribution
            tfi = F.col(f"__tf{i}")
            score = score + F.coalesce(
                F.when(tfi.isNotNull(), F.lit(c_of_ord[i]) * (tfi / (tfi + knorm))),
                F.lit(0.0))
        return (matched.join(self._doclens_df(), "doc_id")
                .select("doc_id", score.alias("score")))

    def _single_union_term(self, q: Query, tp: dict):
        """The postings object when the boolean result set is exactly ONE
        term's posting list (contain-only with one existing contain term
        and no existing exclude, or the exclude-only quirk with one existing
        exclude term) — the most common hot-query shape. Else None."""
        if q.require:
            return None
        contain = [t for t in q.contain if tp[t] is not None]
        exclude = [t for t in q.exclude if tp[t] is not None]
        if contain:
            return tp[contain[0]] if len(contain) == 1 and not exclude else None
        if exclude:
            return tp[exclude[0]] if len(exclude) == 1 else None
        return None

    @staticmethod
    def _fused_topk_count(df: DataFrame, limit: int, by_score: bool):
        """ONE Spark action returning (top-``limit`` (doc_id, score) rows
        under the given order, exact row count) for a (doc_id, score) frame.

        The distributed route's latency floor was Spark job SCHEDULING, not
        work: count + TakeOrdered ran as two actions (VERDICT r5 #4). Here a
        partition-local top-k (vectorized pandas, incremental
        concat+sort+head per Arrow batch) bounds what crosses to the driver
        at (n_partitions+1)·limit rows REGARDLESS of the matched-set size —
        the scale posture of TakeOrdered — while the partition row count
        rides the same pass as a sentinel row (doc_id = −1, impossible for
        real docs; score carries the count exactly up to 2^53). The driver
        merges ≤ n_partitions tails. Top-limit set and tie order
        (score desc, doc_id asc / doc_id asc) are identical to the
        orderBy().limit() they replace."""
        import pandas as pd

        keys = ["score", "doc_id"] if by_score else ["doc_id"]
        asc = [False, True] if by_score else [True]

        def fuse(it):
            n = 0
            best = None
            for pdf in it:
                n += len(pdf)
                cur = pdf if best is None else pd.concat((best, pdf))
                best = cur.sort_values(keys, ascending=asc).head(limit)
            out = [] if best is None else [best]
            out.append(pd.DataFrame({"doc_id": [-1], "score": [float(n)]}))
            yield pd.concat(out)

        rows = df.mapInPandas(fuse, schema="doc_id long, score double").collect()
        total = int(sum(r["score"] for r in rows if r["doc_id"] == -1))
        tops = [r for r in rows if r["doc_id"] != -1]
        if by_score:
            tops.sort(key=lambda r: (-r["score"], r["doc_id"]))
        else:
            tops.sort(key=lambda r: r["doc_id"])
        return tops[:limit], total

    def _search_distributed(self, q: Query, tp: dict) -> SearchResult:
        """Boolean page + exact total without driver materialization: ONE
        fused cluster-side action (partition-local top-k + count — see
        _fused_topk_count) hands the driver ≤ continuation+k docIDs per
        partition and the exact total.

        Single-term unions skip the cluster entirely: total = df (exact,
        from shard summaries) and the docID-ordered page decodes only the
        leading shards — O(page) driver work, zero Spark jobs."""
        single = self._single_union_term(q, tp)
        if single is not None:
            total = int(single.df)
            if q.continuation >= total:
                return SearchResult(total, None, [])
            k_eff = q.continuation + q.k
            page = (single.first_docs(k_eff) if isinstance(single, LazyTermPostings)
                    else single.all_docs()[:k_eff])[q.continuation :]
            last = q.continuation + page.size - 1
            return SearchResult(total, None if last == total - 1 else last + 1, page.tolist())
        matched = self._matched_docs_df(q, tp, scored=False)
        k_eff = q.continuation + q.k
        tops, total = self._fused_topk_count(matched, k_eff, by_score=False)
        if q.continuation >= total:
            return SearchResult(total, None, [])
        page = [int(r["doc_id"]) for r in tops][q.continuation :]
        last = q.continuation + len(page) - 1
        return SearchResult(total, None if last == total - 1 else last + 1, page)

    def _bm25_distributed(
        self, q: Query, tp: dict, k_eff: int, exact_total: bool = True
    ) -> SearchResult:
        """Distributed BM25 page as ONE fused cluster action: the matched
        plan's scores are already BIT-IDENTICAL to the kernel's
        (_matched_docs_df replicates _score_docs' float64 operation order
        and folds partials in caller term order — see its docstring), so
        the partition-local top-k + exact count of _fused_topk_count IS the
        final page. No driver rescore, no verification margin, no retry
        loop, and no lazy candidate-shard fetches (VERDICT r6 #5 — the
        rescore stage was the route's remaining per-query job floor; its
        margin machinery existed only because F.sum's partition-dependent
        add order made cluster scores inexact by up to float noise)."""
        single = self._single_union_term(q, tp)
        matched = self._matched_docs_df(q, tp, scored=True)
        tops, n = self._fused_topk_count(matched, k_eff, by_score=True)
        if single is not None:
            total = int(single.df)  # exact from shard summaries
        else:
            total = n if exact_total else -1
        if total >= 0 and q.continuation >= total:
            return SearchResult(total, None, [], [])
        page = tops[q.continuation : k_eff]
        if not page:
            return SearchResult(max(total, 0), None, [], [])
        docs = [int(r["doc_id"]) for r in page]
        scores = [float(r["score"]) for r in page]
        last = q.continuation + len(docs) - 1
        cont = None if (total >= 0 and last == total - 1) or len(docs) < q.k else last + 1
        return SearchResult(total, cont, docs, scores)

    def _live_docs_filter(self):
        """Hook: fn(docs)->docs dropping non-visible docs, or None when all
        docs are live. The base engine has no deletes; MultiSegmentEngine
        returns its tombstone mask so the pruned WAND kernel keeps
        block-skipping on a live index (VERDICT r4 #1)."""
        return None

    def _union_total_live(self, present: list) -> int:
        """Hook: exact |∪ postings ∩ live docs| — equals _union_total when
        nothing is deleted."""
        return self._union_total(present)

    def _union_total(self, present: list) -> int:
        """Exact |∪ postings| from block METADATA where possible: a block
        whose [first,max] docID range intersects no other term's blocks holds
        docs unique to its term (a shared doc would sit in an overlapping
        block of the other term), so its count adds directly; only blocks
        overlapping another term's range are decoded and deduped. For salted
        range-bucketed lists disjoint salt ranges never decode at all.

        Hot (lazy) terms never decode whole here: with ONE hot term,
        |∪| = df_hot + |eager_union \\ hot| via a bounded membership probe
        (inclusion–exclusion); with ≥2 hot terms the exact union count runs
        as one distributed job (their ranges overlap everywhere, so the
        metadata algebra would decode them fully on the driver)."""
        if len(present) == 1:
            return int(present[0].df)
        hot = [p for p in present if isinstance(p, LazyTermPostings)]
        if len(hot) >= 2:
            return int(
                self._decoded_for([p.term for p in present])
                .select("doc_id").distinct().count()
            )
        if len(hot) == 1:
            h = hot[0]
            eager = [p for p in present if p is not h]
            rest = np.unique(np.concatenate([p.all_docs() for p in eager]))
            # shard-summary range algebra BEFORE any payload fetch: an eager
            # doc outside every shard's [min,max] range is provably not in
            # the hot list; only range-containing shards are probe
            # candidates. Their pending payload bytes are known from the
            # summaries — over budget, the probe would pull ~the whole df≈N
            # list onto the driver (ADVICE r3 medium), so run the same
            # distributed distinct-count the ≥2-hot case uses instead.
            sidx = np.searchsorted(h._smax, rest, side="left")
            ok = sidx < h.n_shards
            ok[ok] &= rest[ok] >= h._smin[sidx[ok]]
            outside = int((~ok).sum())
            shards = np.unique(sidx[ok])
            pending = np.array(
                [s for s in shards if int(s) not in h._payload], dtype=np.int64
            )
            est_bytes = int(h._sbytes[pending].sum()) if pending.size else 0
            if est_bytes <= self.union_probe_budget_bytes:
                return int(h.df) + outside + int((h.lookup_tfs(rest[ok]) == 0).sum())
            return int(
                self._decoded_for([p.term for p in present])
                .select("doc_id").distinct().count()
            )
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
        from .wand import wand_topk

        tp_all = self._fetch_query_terms(q)
        if any(tp_all[t] is None for t in q.require):
            return SearchResult(0, None, [], [])
        k_eff = q.continuation + q.k
        if self._route_distributed(q, tp_all, for_wand=True):
            self.last_route = "distributed"
            return self._bm25_distributed(q, tp_all, k_eff, exact_total=exact_total)
        self.last_route = "kernel"
        candidate_filter = None
        if q.require or q.exclude:
            cands = self._bool_kernel(q, tp_all)
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
            # live-docs hooks (MultiSegmentEngine tombstones): the filter
            # drops deleted docs BEFORE they are scored or can set θ
            # (wand.absorb applies it ahead of the θ update), so block
            # skipping stays rank-safe — deletes only shrink the candidate
            # pool, never raise any bound
            candidate_filter = self._live_docs_filter()
            total = self._union_total_live(present) if exact_total else -1
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

    def fetch_docs_df(self, ids_df: DataFrame, prune_range: bool = False) -> DataFrame:
        """Join a docID DataFrame (e.g. search_df output) to the docs store
        — the cluster-side twin of fetch_docs: candidates never visit the
        driver, and AQE picks broadcast vs shuffle join by the ids side's
        runtime size.

        ``prune_range=True`` additionally computes the candidates' docID
        [min,max] (two scalars — driver-safe at any cardinality) and pushes
        ``doc_id BETWEEN`` into the docs scan: the store is docID-sorted, so
        parquet zone maps skip whole row groups/files outside the candidate
        span. Costs one extra small aggregation job (candidates recompute)."""
        ids = ids_df.select("doc_id")
        store = self._docs_df
        if prune_range:
            b = ids.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
            if b["lo"] is None:
                return store.filter(F.lit(False))
            store = store.filter(F.col("doc_id").between(int(b["lo"]), int(b["hi"])))
        return store.join(ids, "doc_id")
