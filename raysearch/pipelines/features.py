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


def build_vocab(ds, vocab_size: int = 1024) -> "pa.Table":
    """Top-``vocab_size`` terms by corpus frequency with PINNED tie
    order (count desc, term asc) and contiguous ids ``0..V-1`` — the
    dictionary-featurization / pretokenization vocabulary.

    Per-batch partial counts (one row per DISTINCT term per batch) →
    one vocabulary-bounded ``groupby(term)`` fold → block-local exact
    top-V (the fold hash-partitions terms, so each folded block holds
    FINAL counts — the ``bigram_topk`` pruning argument) → global sort
    over ≤ V × blocks candidate rows → ``limit(V)``.  The only driver
    materialization is the V-row vocabulary itself (bounded by the
    caller's parameter, never by the corpus)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        inst = _CACHE.get(0)
        if inst is None:
            inst = _CACHE[0] = _HashedFeatures(1)  # lexer carrier
        _, codes, uniq = inst.lexer.token_parent_codes(
            batch["text"].combine_chunks()
        )
        if len(codes) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"term": pa.array(list(uniq), pa.string()),
             "n": pa.array(cnt, pa.int64())}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )

    def local_topv(b: pa.Table) -> pa.Table:
        b = b.append_column("_negn", pc.multiply(b["n"], pa.scalar(-1)))
        order = pc.sort_indices(
            b, sort_keys=[("_negn", "ascending"), ("term", "ascending")]
        )
        return b.take(order[: vocab_size])

    cand = (
        folded.map_batches(local_topv, batch_format="pyarrow")
        .sort(["_negn", "term"])
        .limit(vocab_size)
    )
    batches = [pa.table(b) for b in cand.iter_batches(batch_format="pyarrow")]
    if batches:
        tbl = pa.concat_tables(batches).drop_columns(["_negn"])
    else:
        tbl = pa.table(
            {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    return tbl.append_column(
        "token_id", pa.array(np.arange(tbl.num_rows, dtype=np.int64))
    ).select(["token_id", "term", "n"])


def vocab_encode(ds, vocab_size: int = 1024):
    """Pretokenization: encode every doc into its ordered token-id
    sequence under the corpus top-``vocab_size`` vocabulary
    (:func:`build_vocab`), OOV → −1 — the step that turns curated text
    into trainer-ready integer streams (and the exact-dictionary
    counterpart of :func:`hashed_features`' hash trick).

    The V-row vocabulary is broadcast ONCE via ``ray.put`` and read by
    every encode task (never re-shipped per batch); encoding is one
    stateful-lexer pass — per batch, the dict lookup runs once per
    DISTINCT surface form and is broadcast back through integer codes,
    and per-token positions come from one ``arange`` minus the
    flattened row starts.  No shuffle beyond the pinned output sort.

    Output: ``(doc_id, pos, token_id)`` — one row per kept token,
    pinned (doc_id, pos) order, int64 throughout."""
    import ray

    vocab = build_vocab(ds, vocab_size)
    vmap = dict(
        zip(
            vocab["term"].to_pylist(),
            vocab["token_id"].to_numpy(zero_copy_only=False),
        )
    )
    vref = ray.put(vmap)

    def encode(batch: pa.Table) -> pa.Table:
        vm = ray.get(vref)
        inst = _CACHE.get(0)
        if inst is None:
            inst = _CACHE[0] = _HashedFeatures(1)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        parent, codes, uniq = inst.lexer.token_parent_codes(
            batch["text"].combine_chunks()
        )
        if len(codes) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "token_id": pa.array([], pa.int64()),
                }
            )
        ids = np.fromiter(
            (vm.get(t, -1) for t in uniq), dtype=np.int64, count=len(uniq)
        )
        # positions: token order within each row is list_flatten order;
        # parent is non-decreasing, so row starts fall out of the deltas
        starts = np.flatnonzero(
            np.concatenate(([True], parent[1:] != parent[:-1]))
        )
        base = np.repeat(
            np.arange(len(parent), dtype=np.int64)[starts],
            np.diff(np.concatenate((starts, [len(parent)]))),
        )
        pos = np.arange(len(parent), dtype=np.int64) - base
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[parent], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "token_id": pa.array(ids[codes], pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow").sort(
        ["doc_id", "pos"]
    )


def vocab_encode_sql(vocab_size: int = 1024, table: str = "documents") -> str:
    """DuckDB twin of :func:`vocab_encode` (same tokenizer rule, same
    (count desc, term asc) vocabulary order, LEFT JOIN → −1 OOV)."""
    return (
        f"WITH arr AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
        f"'[^a-z0-9]+'), x -> x <> '') AS toks FROM {table}), "
        "tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term "
        "FROM arr, UNNEST(range(1, len(toks) + 1)) AS t(i)), "
        "cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY 1), "
        "vocab AS (SELECT term, row_number() OVER (ORDER BY c DESC, term) - 1 "
        f"AS token_id FROM cnt ORDER BY c DESC, term LIMIT {int(vocab_size)}) "
        "SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos, "
        "CAST(COALESCE(v.token_id, -1) AS BIGINT) AS token_id "
        "FROM tok t LEFT JOIN vocab v USING (term) ORDER BY doc_id, pos"
    )
