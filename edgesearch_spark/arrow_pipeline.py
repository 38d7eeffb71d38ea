"""Arrow-native postings pipeline (mapInArrow) — the zero-PyObject hot path.

The pandas-UDF pipeline materializes every term as a Python string twice
(Arrow→pandas on the tokenizer output and again on the encoder input):
~10^8 PyObject allocations per 10^6 docs, which saturates memory bandwidth
long before the CPU (measured: the postings stage plateaus at ~13 effective
cores). ``mapInArrow`` hands us ``pyarrow.RecordBatch``es instead:

  * tokenizer: content strings are the only per-doc PyObjects (regex needs
    them); emitted terms are a pyarrow DictionaryArray built from the
    factorize codes — the 55M-row string column is materialized once in
    C++, never as PyObjects;
  * encoder: group change-points come from ``pyarrow.compute`` adjacent
    comparisons (C++), numerics are zero-copy numpy views, and only the
    ~n_groups head terms ever become Python strings.

Both stages produce output identical to the pandas path (tested
byte-for-byte via the postings fingerprint).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

from .codec import encode_postings_batch
from .tokenizer import MAX_TERM_BYTES, PAIRS_SCHEMA

_TOKEN_PAT = re.compile(r"[a-zA-Z0-9]+")

POSTINGS_ARROW_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("block_first_doc", pa.list_(pa.int64())),
        ("block_max_doc", pa.list_(pa.int64())),
        ("block_count", pa.list_(pa.int32())),
        ("block_offset", pa.list_(pa.int64())),
        ("block_max_weight", pa.list_(pa.float32())),
        ("block_kind", pa.list_(pa.int32())),
        ("payload", pa.binary()),
    ]
)


def tokenize_pairs_arrow(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    word_map: dict[str, str] | None = None,
    field_prefix: str | None = None,
) -> DataFrame:
    """(doc_id, content) → (doc_id, term, tf, dl) via mapInArrow.

    ``word_map``/``field_prefix`` are the demo-convention normalization hooks
    (reference demo/work-at-microsoft/data/build.ts:14-29,50) — applied at the
    UNIQUE level then re-factorized, so terms merged by the map combine their
    counts exactly like ``tokenize_pairs_pandas`` (byte-identical postings,
    parity-tested)."""
    import pandas as pd

    wmap = dict(word_map or {})
    prefix = f"{field_prefix}_" if field_prefix else ""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            doc_ids = batch.column(batch.schema.get_field_index(doc_id_col)).to_numpy(zero_copy_only=False).astype(np.int64)
            contents = batch.column(batch.schema.get_field_index(content_col)).to_pylist()
            tok_lists = [_TOKEN_PAT.findall(c.lower()) if c else [] for c in contents]
            lens = np.fromiter((len(t) for t in tok_lists), np.int64, count=len(tok_lists))
            if lens.sum() == 0:
                continue
            doc_rep = np.repeat(doc_ids, lens)
            flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
            codes, uniques = pd.factorize(flat, sort=False)
            ulen = np.fromiter((len(u) for u in uniques), np.int64, count=len(uniques))
            bad = np.flatnonzero(ulen > MAX_TERM_BYTES)
            if bad.size:
                keep = ~np.isin(codes, bad)
                codes, doc_rep = codes[keep], doc_rep[keep]
            if wmap or prefix:
                s = pd.Series(np.asarray(uniques, dtype=object))
                if wmap:
                    s = s.map(lambda t: wmap.get(t, t))
                if prefix:
                    s = prefix + s
                recodes, uniques = pd.factorize(s, sort=False)
                codes = recodes[codes]
            n_u = len(uniques)
            key = doc_rep * np.int64(n_u) + codes
            ukey, tf = np.unique(key, return_counts=True)
            doc_out = ukey // n_u
            code_out = (ukey % n_u).astype(np.int32)
            heads = np.flatnonzero(np.concatenate([[True], doc_out[1:] != doc_out[:-1]]))
            dlp = np.add.reduceat(tf, heads)
            dl = np.repeat(dlp, np.diff(np.concatenate([heads, [doc_out.size]])))
            # term column as DictionaryArray → string cast happens in C++
            term_arr = pa.DictionaryArray.from_arrays(
                pa.array(code_out), pa.array(uniques, type=pa.string())
            ).cast(pa.string())
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_out), term_arr, pa.array(tf.astype(np.int64)), pa.array(dl.astype(np.int64))],
                names=["doc_id", "term", "tf", "dl"],
            )

    return df.select(doc_id_col, content_col).mapInArrow(run, schema=PAIRS_SCHEMA)


def make_stream_encoder_arrow(block_size: int, salt_shift: int = 16):
    """mapInArrow over the (term, doc-range)-partitioned, (term, doc_id)-
    sorted posting stream. The salt column never travels through the
    shuffle — it is a pure function of doc_id (salt = doc_id >> salt_shift,
    monotone in doc_id, so sorting by (term, doc_id) already yields
    (term, salt, doc_id) order) and is recomputed here in numpy. Measured
    ~14% off the shuffle+transfer wall time at 55M rows. Cross-batch carry
    is an Arrow Table slice (no PyObjects)."""

    def _emit(tbl: pa.Table, bounds: np.ndarray) -> pa.RecordBatch:
        docs = tbl.column("doc_id").to_numpy().astype(np.int64, copy=False)
        tfs = tbl.column("tf").to_numpy().astype(np.int64, copy=False)
        ws = tbl.column("w").to_numpy().astype(np.float32, copy=False)
        salts = docs >> salt_shift
        heads = np.concatenate([[0], bounds]).astype(np.int64)
        docs_list = np.split(docs, bounds)
        tfs_list = np.split(tfs, bounds)
        ws_list = np.split(ws, bounds)
        pbs = encode_postings_batch(docs_list, tfs_list, ws_list, block_size=block_size)
        term_heads = tbl.column("term").take(pa.array(heads))  # C++ gather, n_groups strings
        n_groups = len(pbs)

        def list_arr(parts: list[np.ndarray], typ):
            offsets = np.zeros(n_groups + 1, dtype=np.int32)
            np.cumsum([len(p) for p in parts], out=offsets[1:])
            values = np.concatenate(parts) if parts else np.array([], dtype=typ)
            return pa.ListArray.from_arrays(pa.array(offsets), pa.array(values.astype(typ)))

        return pa.RecordBatch.from_arrays(
            [
                term_heads.combine_chunks() if isinstance(term_heads, pa.ChunkedArray) else term_heads,
                pa.array(salts[heads].astype(np.int64)),
                pa.array(np.fromiter((d.size for d in docs_list), np.int64, count=n_groups)),
                pa.array(np.fromiter((int(t.sum()) for t in tfs_list), np.int64, count=n_groups)),
                list_arr([pb.first_doc for pb in pbs], np.int64),
                list_arr([pb.max_doc for pb in pbs], np.int64),
                list_arr([pb.counts for pb in pbs], np.int32),
                list_arr([pb.offsets for pb in pbs], np.int64),
                list_arr([pb.max_weight for pb in pbs], np.float32),
                list_arr([pb.kinds for pb in pbs], np.int32),
                pa.array([pb.payload for pb in pbs], type=pa.binary()),
            ],
            schema=POSTINGS_ARROW_SCHEMA,
        )

    def _changes(tbl: pa.Table) -> np.ndarray:
        """Indices where (term, salt) differs from the previous row — term
        compare in C++, salt derived from doc_id in numpy."""
        n = tbl.num_rows
        if n <= 1:
            return np.empty(0, np.int64)
        term = tbl.column("term").combine_chunks()
        tchg = pc.not_equal(term.slice(1), term.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        salts = tbl.column("doc_id").to_numpy().astype(np.int64, copy=False) >> salt_shift
        mask = tchg | (salts[1:] != salts[:-1])
        return np.flatnonzero(mask) + 1

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        carry: pa.Table | None = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            chg = _changes(tbl)
            if chg.size == 0:
                carry = tbl
                continue
            last_head = int(chg[-1])
            carry = tbl.slice(last_head)
            yield _emit(tbl.slice(0, last_head), chg[:-1])
        if carry is not None and carry.num_rows:
            yield _emit(carry, _changes(carry))

    return encode
