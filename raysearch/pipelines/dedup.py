"""Deduplication family over a (doc_id, text) / (vec_id, embedding) table.

Five dedup strategies, each Ray-Data-first (the general pattern the
reference only hints at with its exact URL/page dedup, D1/D2 in SURVEY
§2.7 — here generalized to content dedup at corpus scale):

* exact_dedup       — md5(text) → groupby(hash) → keep min doc_id.
* minhash_lsh_pairs — word-shingle MinHash signatures (vectorized
  universal hashing), banded LSH → candidate pairs via one groupby →
  exact Jaccard verification.  The canonical near-dup path.
* simhash_pairs     — 64-bit SimHash over token multiset, 4×16-bit
  band blocking, Hamming-distance verification.
* ngram_jaccard     — character-n-gram Jaccard verification for a
  candidate pair list (the verifier used after any blocking scheme).
* embedding_near_dup — cosine ≥ threshold pairs over an embedding
  column, LSH-bucketed by random-hyperplane sign bits with exact
  verification inside buckets.

All hashing is seeded/deterministic (no builtin ``hash``); signatures
are computed vectorized per batch; the only wide steps are
groupby(bucket-key) shuffles over small signature rows, never over raw
text.  Candidate verification rereads only candidate docs (broadcast
of the candidate text map when small; at scale this becomes a
hash-partitioned join on doc_id).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.lex import Lexer

MERSENNE = (1 << 61) - 1


def _stable_u64(values: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per string (blake2b, process-stable)."""
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "little")
            for v in values
        ],
        dtype=np.uint64,
    )


def _minhash_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(ds):
    """Keep the smallest doc_id per distinct text: hash in map_batches,
    ONE groupby over (hash, doc_id) pairs — raw text never shuffles."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "text_hash": pa.array(hashes, pa.string()),
                "doc_id": batch["doc_id"],
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_MIX3 = np.uint64(0x9E3779B97F4A7C15)


def _mix_step(acc: np.ndarray, nxt: np.ndarray) -> np.ndarray:
    """One round of a splitmix-style combiner (uint64 wraparound)."""
    x = (acc ^ (nxt * _MIX1)) * _MIX2
    return x ^ (x >> np.uint64(31))


class _MinHashSigs:
    """Per-batch: word shingles → n_perm MinHash values → banded rows
    (doc_id, band, band_hash).  Fully vectorized: per-UNIQUE-token
    stable hashes, rolling k-gram combination via integer mixing (no
    per-shingle string building or hashlib), permutations as one
    (n_shingle × n_perm) broadcast, per-doc minima via
    np.minimum.reduceat, band keys by vectorized mixing."""

    def __init__(self, n_perm: int = 64, bands: int = 16, shingle: int = 3):
        self.lexer = Lexer("simple")
        self.n_perm, self.bands, self.shingle = n_perm, bands, shingle
        self.rows_per_band = n_perm // bands
        self.a, self.b = _minhash_params(n_perm)
        self._tok_hash_memo: dict[str, int] = {}

    def _uniq_hashes(self, uniq: np.ndarray) -> np.ndarray:
        memo = self._tok_hash_memo
        out = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            h = memo.get(t)
            if h is None:
                h = memo[t] = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
                )
            out[i] = h
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        parent, codes, uniq = self.lexer.token_parent_codes(batch["text"])
        k = self.shingle
        if not len(codes):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.uint64()),
                }
            )
        th = self._uniq_hashes(uniq)[codes]
        n = len(th)
        # token counts per row (docs ordered; parent nondecreasing)
        row_starts = np.searchsorted(parent, np.arange(batch.num_rows))
        row_counts = np.diff(np.concatenate((row_starts, [n])))

        # rolling k-gram mix at positions whose full window stays in-doc
        if n >= k:
            m = n - k + 1
            sh = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                sh = _mix_step(sh, th[j : j + m])
            valid = parent[:m] == parent[k - 1 :]
            sh_parent = parent[:m][valid]
            sh = sh[valid]
        else:
            sh = np.empty(0, dtype=np.uint64)
            sh_parent = np.empty(0, dtype=np.int64)
        # short docs (1..k-1 tokens): one shingle over all their tokens
        short_rows = np.flatnonzero((row_counts > 0) & (row_counts < k))
        if len(short_rows):
            extra = []
            for r in short_rows:
                s, c = row_starts[r], row_counts[r]
                acc = np.zeros(1, dtype=np.uint64)
                for j in range(int(c)):
                    acc = _mix_step(acc, th[s + j : s + j + 1])
                extra.append(acc[0])
            sh = np.concatenate((sh, np.array(extra, dtype=np.uint64)))
            sh_parent = np.concatenate((sh_parent, short_rows))
            order = np.argsort(sh_parent, kind="stable")
            sh, sh_parent = sh[order], sh_parent[order]

        if not len(sh):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.uint64()),
                }
            )
        h = sh % MERSENNE
        perm = (h[:, None] * self.a[None, :] + self.b[None, :]) % MERSENNE
        doc_bounds = np.flatnonzero(
            np.concatenate(([True], sh_parent[1:] != sh_parent[:-1]))
        )
        sig = np.minimum.reduceat(perm, doc_bounds, axis=0)  # (docs, n_perm)
        sig_docs = doc_ids[sh_parent[doc_bounds]]

        out_doc, out_band, out_hash = [], [], []
        for band in range(self.bands):
            cols = sig[:, band * self.rows_per_band : (band + 1) * self.rows_per_band]
            acc = np.full(len(sig), np.uint64(band + 1), dtype=np.uint64)
            for j in range(self.rows_per_band):
                acc = _mix_step(acc, cols[:, j].astype(np.uint64))
            out_doc.append(sig_docs)
            out_band.append(np.full(len(sig), band, dtype=np.int32))
            out_hash.append(acc)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "band_hash": pa.array(np.concatenate(out_hash), pa.uint64()),
            }
        )


def _pairs_from_buckets(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(group["doc_id"].tolist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


_SIG_CACHE: dict[tuple, object] = {}


def _minhash_task(batch: pa.Table, *, n_perm: int, bands: int, shingle: int):
    key = ("minhash", n_perm, bands, shingle)
    inst = _SIG_CACHE.get(key)
    if inst is None:
        inst = _SIG_CACHE[key] = _MinHashSigs(n_perm, bands, shingle)
    return inst(batch)


def _simhash_task(batch: pa.Table):
    inst = _SIG_CACHE.get("simhash")
    if inst is None:
        inst = _SIG_CACHE["simhash"] = _SimHash()
    return inst(batch)


def minhash_candidates(ds, n_perm: int = 64, bands: int = 16, shingle: int = 3):
    """documents → candidate near-dup pairs (doc_a < doc_b), deduped."""
    sigs = ds.map_batches(
        _minhash_task,
        fn_kwargs={"n_perm": n_perm, "bands": bands, "shingle": shingle},
        batch_format="pyarrow",
    )
    pairs = sigs.groupby(["band", "band_hash"]).map_groups(
        _pairs_from_buckets, batch_format="pandas"
    )
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def _jaccard(sa: set, sb: set) -> float:
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def minhash_lsh_pairs(ds, threshold: float = 0.6, **kw):
    """Candidates → exact shingle-Jaccard verification ≥ threshold.

    Verification broadcasts the candidate doc texts (small side) via
    ray.put and checks pairs inside map_batches — no text shuffle."""
    import ray

    cands = minhash_candidates(ds, **kw)
    cand_tbl = cands.to_pandas()
    if cand_tbl.empty:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    needed = set(cand_tbl.doc_a) | set(cand_tbl.doc_b)
    texts = {}
    shingle = kw.get("shingle", 3)
    lexer = Lexer("simple")
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if d in needed:
                toks = lexer.tokenize(t)
                texts[d] = set(
                    " ".join(toks[i : i + shingle])
                    for i in range(max(1, len(toks) - shingle + 1))
                )
    texts_ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(texts_ref)
        jac = [
            _jaccard(tx.get(a, set()), tx.get(b, set()))
            for a, b in zip(batch.doc_a, batch.doc_b)
        ]
        batch = batch.assign(jaccard=np.round(jac, 4))
        return batch[batch.jaccard >= threshold][["doc_a", "doc_b", "jaccard"]]

    import ray.data as rd

    return rd.from_pandas(cand_tbl).map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class _SimHash:
    """64-bit SimHash per doc over the token multiset; emits 4×16-bit
    band keys for Hamming-≤3 blocking (a pair within distance 3 shares
    at least one exact 16-bit band by pigeonhole)."""

    def __init__(self):
        self.lexer = Lexer("simple")
        self._memo: dict[str, np.ndarray] = {}

    def _bits(self, token: str) -> np.ndarray:
        v = self._memo.get(token)
        if v is None:
            h = _stable_u64([token])[0]
            shifted = h >> np.arange(64, dtype=np.uint64)
            v = (shifted & np.uint64(1)).astype(np.int64) * 2 - 1
            self._memo[token] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        parent, codes, uniq = self.lexer.token_parent_codes(batch["text"])
        if not len(codes):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "simhash": pa.array([], pa.uint64()),
                    "band": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.int64()),
                }
            )
        # ±1 bit matrix over the batch's UNIQUE tokens (memoized)
        bit_rows = np.stack([self._bits(t) for t in uniq])  # (n_uniq, 64)
        n_uniq = len(uniq)
        key = parent.astype(np.int64) * n_uniq + codes
        ukeys, cnt = np.unique(key, return_counts=True)
        rows = ukeys // n_uniq
        ucs = ukeys % n_uniq
        contrib = cnt[:, None] * bit_rows[ucs]  # (pairs, 64)
        starts = np.flatnonzero(np.concatenate(([True], rows[1:] != rows[:-1])))
        acc = np.add.reduceat(contrib, starts, axis=0)  # (docs, 64)
        present_docs = doc_ids[rows[starts]]
        bits = (acc > 0).astype(np.uint64)
        sims = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        nd = len(sims)
        bands = np.repeat(np.arange(4, dtype=np.int32), nd)
        sims_r = np.tile(sims, 4)
        keys = (sims_r >> (np.uint64(16) * bands.astype(np.uint64))) & np.uint64(
            0xFFFF
        )
        return pa.table(
            {
                "doc_id": pa.array(np.tile(present_docs, 4), pa.int64()),
                "simhash": pa.array(sims_r, pa.uint64()),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(keys.astype(np.int64), pa.int64()),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3):
    """documents → (doc_a, doc_b, hamming) pairs with distance ≤ max."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(group.doc_id, group.simhash)))
        a, b, h = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = int(rows[i][1]) ^ int(rows[j][1])
                dist = bin(d).count("1")
                if dist <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    h.append(dist)
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": h})

    sigs = ds.map_batches(_simhash_task, batch_format="pyarrow")
    cand = sigs.groupby(["band", "band_key"]).map_groups(pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    return cand.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ---------------------------------------------------------------------------
# char-ngram Jaccard (verification primitive)
# ---------------------------------------------------------------------------


def char_ngram_jaccard(text_a: str, text_b: str, n: int = 5) -> float:
    sa = {text_a[i : i + n] for i in range(max(1, len(text_a) - n + 1))}
    sb = {text_b[i : i + n] for i in range(max(1, len(text_b) - n + 1))}
    return round(_jaccard(sa, sb), 4)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(ds, threshold: float = 0.95, n_planes: int = 8, seed: int = 11):
    """(vec_id, embedding) → near-dup pairs by cosine ≥ threshold.

    Scale path: random-hyperplane sign buckets (LSH) shuffle only
    (bucket, vec_id, vector) rows; exact cosine verification runs
    inside each bucket.  n_planes=0 degenerates to one bucket
    (brute force) — used to measure recall in tests."""
    import ray.data as rd

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch["embedding"].to_pylist()]
        )
        if n_planes:
            dim = emb.shape[1]
            rng = np.random.Generator(np.random.PCG64(seed))
            planes = rng.standard_normal((dim, n_planes))
            signs = (emb @ planes) > 0
            bucket = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
        else:
            bucket = np.zeros(len(emb), dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack([np.asarray(v, dtype=np.float64) for v in group["embedding"]])
        ids = group["vec_id"].to_numpy()
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        unit = emb / norms[:, None]
        sim = unit @ unit.T
        ii, jj = np.where(np.triu(sim >= threshold, k=1))
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        from raysearch.util import round_half_away

        return pd.DataFrame(
            {"vec_a": a, "vec_b": b, "cosine": round_half_away(sim[ii, jj], 4)}
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["vec_a", "vec_b"]).aggregate(Max("cosine", alias_name="cosine"))
