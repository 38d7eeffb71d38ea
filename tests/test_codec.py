import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from edgesearch_spark.codec import (
    PostingBlocks,
    concat_blocks,
    decode_all,
    decode_block,
    decode_varint,
    encode_postings,
    encode_varint,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**32 - 1, 2**63], dtype=np.uint64)
    assert (decode_varint(encode_varint(vals)) == vals).all()


def test_varint_empty():
    assert encode_varint(np.empty(0, np.uint64)) == b""
    assert decode_varint(b"").size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert (decode_varint(encode_varint(vals)) == vals).all()


def _mk(docs, tfs=None, w=None, block_size=4):
    docs = np.array(docs, dtype=np.int64)
    tfs = np.array(tfs if tfs is not None else np.ones(len(docs)), dtype=np.int64)
    w = np.array(w if w is not None else np.zeros(len(docs)), dtype=np.float32)
    return encode_postings(docs, tfs, w, block_size=block_size)


def test_postings_roundtrip():
    docs = [0, 1, 5, 100, 101, 102, 4_000_000_000]
    tfs = [1, 3, 2, 9, 1, 1, 7]
    pb = _mk(docs, tfs, block_size=3)
    d, t = decode_all(pb)
    assert d.tolist() == docs
    assert t.tolist() == tfs
    assert pb.n_blocks == 3
    assert pb.max_doc.tolist() == [5, 102, 4_000_000_000]
    assert pb.counts.tolist() == [3, 3, 1]


def test_postings_blockmax():
    pb = encode_postings(
        np.array([1, 2, 3, 4], np.int64),
        np.array([1, 1, 1, 1], np.int64),
        np.array([0.1, 0.9, 0.2, 0.5], np.float32),
        block_size=2,
    )
    assert pb.max_weight.tolist() == pytest.approx([0.9, 0.5])


def test_postings_rejects_unsorted():
    with pytest.raises(ValueError):
        _mk([3, 2, 1])


def test_decode_single_block():
    pb = _mk([10, 20, 30, 40, 50], [1, 2, 3, 4, 5], block_size=2)
    d, t = decode_block(pb, 1)
    assert d.tolist() == [30, 40]
    assert t.tolist() == [3, 4]


def test_concat_blocks_is_merge_of_disjoint_shards():
    a = _mk([0, 1, 2, 3], [1, 2, 1, 1])
    b = _mk([10, 11], [5, 5])
    c = _mk([20], [1])
    merged = concat_blocks([a, b, c])
    d, t = decode_all(merged)
    assert d.tolist() == [0, 1, 2, 3, 10, 11, 20]
    assert t.tolist() == [1, 2, 1, 1, 5, 5, 1]
    assert merged.n_postings == 7
    # block boundaries preserved, offsets rebased correctly
    d1, _ = decode_block(merged, 1)
    assert d1.tolist() == [10, 11]


def test_concat_blocks_rejects_overlap():
    with pytest.raises(ValueError):
        concat_blocks([_mk([0, 5]), _mk([3, 9])])


@given(
    st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=400, unique=True),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=30, deadline=None)
def test_postings_roundtrip_property(docs, bs):
    docs = sorted(docs)
    tfs = [(d % 17) + 1 for d in docs]
    pb = _mk(docs, tfs, block_size=bs)
    d, t = decode_all(pb)
    assert d.tolist() == docs
    assert t.tolist() == tfs


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=300, unique=True),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=30, deadline=None)
def test_batch_encoder_identical_to_per_row(rows, bs):
    from edgesearch_spark.codec import encode_postings_batch

    docs_list = [np.array(sorted(r), dtype=np.int64) for r in rows]
    tfs_list = [(d % 17 + 1).astype(np.int64) for d in docs_list]
    ws_list = [((d % 7 + 1) / 10.0).astype(np.float32) for d in docs_list]
    batch = encode_postings_batch(docs_list, tfs_list, ws_list, block_size=bs)
    for d, t, w, pb in zip(docs_list, tfs_list, ws_list, batch):
        ref = encode_postings(d, t, w, block_size=bs)
        assert pb.payload == ref.payload
        assert pb.max_doc.tolist() == ref.max_doc.tolist()
        assert pb.counts.tolist() == ref.counts.tolist()
        assert pb.offsets.tolist() == ref.offsets.tolist()
        assert pb.max_weight.tolist() == pytest.approx(ref.max_weight.tolist())


def test_batch_encoder_rejects_unsorted_rows():
    from edgesearch_spark.codec import encode_postings_batch

    with pytest.raises(ValueError):
        encode_postings_batch(
            [np.array([5, 3], np.int64)], [np.array([1, 1], np.int64)], [np.zeros(2, np.float32)]
        )
