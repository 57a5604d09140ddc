"""Feature extraction for downstream model training.

``hashed_features`` — the hashing-trick bag-of-words featurizer
(Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning", ICML'09): feature index = stable 64-bit token hash mod
``dim``, weight = term frequency.  No vocabulary is built or shipped —
the map is a pure hash, so the operator is a single stateful-lexer
``map_batches`` pass with no shuffle and no driver state, and feature
spaces agree across runs/partitions/clusters by construction.

Per batch everything is vectorized: one lexer call yields (parent,
code) token pairs, the batch's UNIQUE tokens are hashed once
(``dedup._stable_u64`` — blake2b64, the same hash the simhash family
uses, so the persisted (tok, h64) fixture parquet lets DuckDB replay
it), then ``np.unique`` over combined (parent, feature) keys produces
the sparse (doc_id, feature, tf) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysearch.lex import Lexer
from raysearch.pipelines.dedup import _stable_u64


class _HashedFeatures:
    def __init__(self, dim: int):
        self.dim = dim
        self.lexer = Lexer("simple")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        parent, codes, uniq = self.lexer.token_parent_codes(
            batch["text"].combine_chunks()
        )
        if len(codes) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "feature": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        feat = (_stable_u64(list(uniq)) % np.uint64(self.dim)).astype(np.int64)
        key = parent.astype(np.int64) * self.dim + feat[codes]
        kk, tf = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[kk // self.dim], pa.int64()),
                "feature": pa.array(kk % self.dim, pa.int64()),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
            }
        )


_CACHE: dict[int, _HashedFeatures] = {}


def _features_task(batch: pa.Table, *, dim: int) -> pa.Table:
    # per-worker cached instance — the textstats._cached idiom (tiny
    # state: task-based map_batches beats an actor pool's ramp)
    inst = _CACHE.get(dim)
    if inst is None:
        inst = _CACHE[dim] = _HashedFeatures(dim)
    return inst(batch)


def hashed_features(ds, dim: int = 1024):
    """Sparse hashed bag-of-words: ``(doc_id, feature, tf)`` rows with
    ``feature = blake2b64(token) % dim``.  Lexer compiled once per
    worker; streams, never shuffles."""
    return ds.map_batches(
        _features_task, batch_format="pyarrow", fn_kwargs={"dim": dim}
    )
