"""Delta-gap + varint posting-list codec, numpy-vectorized.

The reference stores one SQL row per (lemma, page) posting
(model/SearchIndex.java:11-27); at 10^12-turn scale postings must be
compressed blobs instead.  Format per posting list (doc-ascending):

* ``doc_blob``  — LEB128 varints of ``gaps`` where ``gaps[0] =
  doc_ids[0]`` and ``gaps[i] = doc_ids[i] - doc_ids[i-1]`` (strictly
  positive for i>0 because doc_ids are unique and sorted).
* ``tf_blob``   — LEB128 varints of the term frequencies, same order.
* ``bm_blob``   — LEB128 varints of per-block max tf (one value per
  ``BLOCK`` docs) — the block-max metadata used for WAND-style pruning
  at query time (SURVEY §2.4 J2 mapping).

Both encode and decode are vectorized: encode writes each varint byte
position for all values at once; decode locates value boundaries from
the continuation bits and reduces with ``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # docs per block-max entry


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64/uint64 array (vectorized)."""
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    if a.ndim != 1:
        raise ValueError("1-D array required")
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(a.size, dtype=np.int64)
    shifted = a >> np.uint64(7)
    while shifted.any():
        nbytes += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(7)
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    starts = np.cumsum(nbytes) - nbytes
    max_nb = int(nbytes.max())
    for k in range(max_nb):
        mask = nbytes > k
        chunk = (a[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = np.where(nbytes[mask] > k + 1, 0x80, 0).astype(np.uint8)
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte string to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    lengths = ends - starts + 1
    pos_in_value = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    contrib = payload << (np.uint64(7) * pos_in_value.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray
) -> tuple[bytes, bytes, bytes]:
    """(doc_blob, tf_blob, bm_blob) for a doc-ascending posting list."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if doc_ids.size == 0:
        return b"", b"", b""
    gaps = np.empty_like(doc_ids)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    if doc_ids.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    n_blocks = (doc_ids.size + BLOCK - 1) // BLOCK
    bm = np.maximum.reduceat(tfs, np.arange(0, doc_ids.size, BLOCK)) if n_blocks else tfs[:0]
    return varint_encode(gaps), varint_encode(tfs), varint_encode(bm)


def decode_postings(
    doc_blob: bytes, tf_blob: bytes
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` (block-max blob decoded
    separately via :func:`varint_decode` when pruning needs it)."""
    gaps = varint_decode(doc_blob).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = varint_decode(tf_blob).astype(np.int64)
    return doc_ids, tfs
