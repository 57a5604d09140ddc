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


def tfidf_features(ds, dim: int = 1024, decimals: int = 4):
    """Hashed TF-IDF: :func:`hashed_features` weighted by
    ``idf = ln(n_docs / df)`` with df = docs-containing-feature.

    The df table is bounded by ``dim`` (not vocabulary), so the plan
    is: one feature groupby over the sparse rows (≤ dim output rows),
    collect the tiny (feature, df) array to the driver, ``ray.put``
    the dense idf vector, and weight in a second streaming pass — the
    canonical small-side broadcast, never a join shuffle.

    Output: ``(doc_id, feature, tf, weight)`` with weight rounded to
    ``decimals`` (round-half-away, the SQL convention)."""
    import ray
    from ray.data.aggregate import Count

    from raysearch.util import round_half_away

    n_docs = ds.count()
    hashed = hashed_features(ds, dim=dim).materialize()
    df_tbl = hashed.groupby("feature").aggregate(Count(alias_name="df")).to_pandas()
    idf = np.zeros(dim, np.float64)
    idf[df_tbl.feature.to_numpy(np.int64)] = np.log(
        n_docs / df_tbl.df.to_numpy(np.float64)
    )
    idf_ref = ray.put(idf)

    def weigh(b: pa.Table) -> pa.Table:
        v = ray.get(idf_ref)
        f = b["feature"].to_numpy(zero_copy_only=False)
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column(
            "weight", pa.array(round_half_away(tf * v[f], decimals), pa.float64())
        )

    return hashed.map_batches(weigh, batch_format="pyarrow")
