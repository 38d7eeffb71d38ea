"""Posting-list block codec: delta + varint, vectorized with numpy.

Plays the role of the reference's Roaring portable serialization
(reference: src/build/bitmap/portable.rs:14-33, container model in
wasm/roaring.c — 16-bit-partitioned containers). Our analogue is
fixed-size blocks of BLOCK_SIZE postings, each independently decodable
(the first docID of each block is stored absolute, the rest as deltas),
so salted partial posting lists can be merged by pure concatenation and
query-time skipping never decodes a block it can prune.

Unlike the reference (which never scores), every block carries BM25
block-max metadata: the maximum tf-weight w = tf / (tf + k1*(1 - b + b*dl/avgdl))
over the block, enabling block-max WAND pruning at query time.

All encode/decode paths are numpy-vectorized — no per-value Python loops
(loops run over *byte positions* of the varint, max 10 iterations).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128  # postings per block (like a Roaring container, sized for SIMD-ish decode)

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints. Vectorized: the only loop
    is over the ≤10 varint byte positions."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value: 1 + sum(v >= 2^(7k)) for k=1..9
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(10):
        mask = nbytes > k
        if not mask.any():
            break
        pos = starts[mask] + k
        byte = ((v[mask] >> _U64(7 * k)) & _MASK7).astype(np.uint8)
        cont = (nbytes[mask] > (k + 1)).astype(np.uint8) * _CONT
        out[pos] = byte | cont
    return out.tobytes()


def decode_varint(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte stream into a uint64 array. Vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    ends = np.flatnonzero((b & _CONT) == 0)
    if count is not None:
        ends = ends[:count]
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=_U64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        vals[mask] |= (b[starts[mask] + k] & _MASK7).astype(_U64) << _U64(7 * k)
    return vals


@dataclass
class PostingBlocks:
    """One term's (or one term-shard's) posting list as independent blocks.

    Parallel metadata arrays allow skip/prune decisions without touching
    ``payload``; ``offsets[i]:offsets[i+1]`` slices block i's bytes.
    """

    max_doc: np.ndarray  # int64[n_blocks] — last (max) docID per block
    counts: np.ndarray  # int32[n_blocks] — postings per block
    offsets: np.ndarray  # int64[n_blocks + 1] — byte offsets into payload
    max_weight: np.ndarray  # float32[n_blocks] — max tf-weight per block (block-max)
    payload: bytes

    @property
    def n_blocks(self) -> int:
        return int(self.counts.size)

    @property
    def n_postings(self) -> int:
        return int(self.counts.sum())


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, weights: np.ndarray, block_size: int = BLOCK_SIZE
) -> PostingBlocks:
    """Encode sorted (doc_id, tf) postings into delta+varint blocks.

    ``weights`` is the per-posting BM25 tf-weight (tf / (tf + K(dl))); only its
    per-block max is stored. Block payload = varint[first_doc, delta_1.., tf_1..tf_c]
    where deltas are (d[i] - d[i-1] - 1) (docIDs strictly increasing) and tfs
    are stored as (tf - 1) (tf >= 1).
    """
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    n = d.size
    if n == 0:
        return PostingBlocks(
            max_doc=np.empty(0, np.int64),
            counts=np.empty(0, np.int32),
            offsets=np.zeros(1, np.int64),
            max_weight=np.empty(0, np.float32),
            payload=b"",
        )
    if n > 1 and not (d[1:] > d[:-1]).all():
        raise ValueError("doc_ids must be strictly increasing")
    n_blocks = (n + block_size - 1) // block_size
    bounds = [(i * block_size, min((i + 1) * block_size, n)) for i in range(n_blocks)]
    # delta stream: first absolute, then delta-1 within the block
    deltas = np.empty(n, dtype=_U64)
    deltas[:] = 0
    chunks: list[bytes] = []
    max_doc = np.empty(n_blocks, np.int64)
    counts = np.empty(n_blocks, np.int32)
    max_w = np.empty(n_blocks, np.float32)
    w = np.ascontiguousarray(weights, dtype=np.float32)
    for i, (lo, hi) in enumerate(bounds):
        blk = d[lo:hi]
        stream = np.empty((hi - lo) * 2, dtype=_U64)
        stream[0] = _U64(blk[0])
        if hi - lo > 1:
            stream[1 : hi - lo] = (blk[1:] - blk[:-1] - 1).astype(_U64)
        stream[hi - lo :] = (t[lo:hi] - 1).astype(_U64)
        chunks.append(encode_varint(stream))
        max_doc[i] = blk[-1]
        counts[i] = hi - lo
        max_w[i] = w[lo:hi].max() if w.size else np.float32(0)
    offsets = np.zeros(n_blocks + 1, dtype=np.int64)
    offsets[1:] = np.cumsum([len(c) for c in chunks])
    return PostingBlocks(max_doc, counts, offsets, max_w, b"".join(chunks))


def decode_block(pb: PostingBlocks, i: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode block i → (doc_ids int64, tfs int64)."""
    c = int(pb.counts[i])
    raw = np.frombuffer(pb.payload, dtype=np.uint8, count=int(pb.offsets[i + 1] - pb.offsets[i]), offset=int(pb.offsets[i]))
    vals = decode_varint(raw, count=2 * c).astype(np.int64)
    docs = vals[:c].copy()
    if c > 1:
        docs[1:] += 1
        np.cumsum(docs, out=docs)
    tfs = vals[c:] + 1
    return docs, tfs


def decode_all(pb: PostingBlocks) -> tuple[np.ndarray, np.ndarray]:
    """Decode every block → (doc_ids, tfs), concatenated."""
    if pb.n_blocks == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    parts = [decode_block(pb, i) for i in range(pb.n_blocks)]
    return np.concatenate([p[0] for p in parts]), np.concatenate([p[1] for p in parts])


def concat_blocks(parts: list[PostingBlocks]) -> PostingBlocks:
    """Merge posting-block runs whose docID ranges are disjoint and ascending
    (the salted-shard merge: salt = docID range bucket ⇒ concatenation is the
    merge — the reference's PQ multiway union, wasm/roaring.c:18715, degenerates
    to concat because our shards never interleave)."""
    parts = [p for p in parts if p.n_blocks > 0]
    if not parts:
        return encode_postings(np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float32))
    for a, b in zip(parts, parts[1:]):
        if a.max_doc[-1] >= _first_doc(b):
            raise ValueError("posting shards overlap; cannot concat-merge")
    sizes = [len(p.payload) for p in parts]
    base = np.cumsum([0] + sizes[:-1])
    offsets = np.concatenate([p.offsets[:-1] + base[i] for i, p in enumerate(parts)] + [np.array([sum(sizes)], dtype=np.int64)])
    return PostingBlocks(
        max_doc=np.concatenate([p.max_doc for p in parts]),
        counts=np.concatenate([p.counts for p in parts]),
        offsets=offsets.astype(np.int64),
        max_weight=np.concatenate([p.max_weight for p in parts]),
        payload=b"".join(p.payload for p in parts),
    )


def _first_doc(pb: PostingBlocks) -> int:
    raw = np.frombuffer(pb.payload, dtype=np.uint8, count=int(pb.offsets[1] - pb.offsets[0]), offset=0)
    return int(decode_varint(raw, count=1)[0])
