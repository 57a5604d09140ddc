"""Posting codec round-trip + property tests (SURVEY.md §5 item (b))."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raysearch.codec import (
    BLOCK,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**35, 2**63 - 1], dtype=np.uint64)
    buf = varint_encode(vals)
    assert varint_decode(buf).tolist() == vals.tolist()
    # single-byte economy
    assert len(varint_encode(np.array([5], dtype=np.uint64))) == 1
    assert len(varint_encode(np.array([128], dtype=np.uint64))) == 2
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(a)).tolist() == values


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=1000),
)
def test_postings_roundtrip(doc_set, tf_seed):
    doc_ids = np.array(sorted(doc_set), dtype=np.int64)
    rng = np.random.default_rng(tf_seed)
    tfs = rng.integers(1, 1000, size=doc_ids.size).astype(np.int64)
    doc_blob, tf_blob, bm_blob = encode_postings(doc_ids, tfs)
    got_ids, got_tfs = decode_postings(doc_blob, tf_blob)
    assert got_ids.tolist() == doc_ids.tolist()
    assert got_tfs.tolist() == tfs.tolist()
    # block-max property: every block's encoded max equals the true max
    bm = varint_decode(bm_blob)
    for bi in range(bm.size):
        blk = tfs[bi * BLOCK : (bi + 1) * BLOCK]
        assert bm[bi] == blk.max()


def test_encode_rejects_unsorted():
    import pytest

    with pytest.raises(ValueError):
        encode_postings(np.array([3, 2], dtype=np.int64), np.array([1, 1], dtype=np.int64))
    with pytest.raises(ValueError):
        encode_postings(np.array([2, 2], dtype=np.int64), np.array([1, 1], dtype=np.int64))
