"""Query engine over the merged index (SURVEY.md §3.2 restated).

Replaces the reference's SQL-backed search
(services/SearchServiceImpl.java:33-115: lemma lookups J5, posting
fetch J1, conjunctive intersection J2, per-pair tf lookups J3, tf-sum
scoring A4) with an ``IndexSearcher`` that holds the lexicon and
segment handles once (actor-pool-friendly: construct per actor, reuse
across query batches) and fetches posting rows with parquet row-group
pruning (the merged postings are term-clustered, so a term's chunks
live in O(1) row groups).

The candidate semantics + scorers live in scoring.py and are shared
verbatim with the oracle; doc text fetch for snippets is a point read
into the original transcript parquet with predicate pushdown instead of
the reference's live HTTP re-fetch (SearchServiceImpl.java:82-94, M9).

Block-max pruning: each posting chunk row carries per-128-doc block
maxima of tf (codec.BLOCK).  For conjunctive top-k the searcher scores
the exact candidate set (reference semantics demand it — the candidate
count is part of the response, SearchServiceImpl.java:66); the block
maxima give ``max_score`` upper bounds used by the disjunctive
(OR-mode) WAND path ``search_or`` to skip blocks that cannot reach the
current heap threshold.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raysearch.codec import BLOCK, decode_postings, varint_decode
from raysearch.lex import Lexer, validate_query
from raysearch.scoring import (
    BM25_B,
    BM25_K1,
    TermPostings,
    bm25_idf,
    order_query_terms,
    rank_results,
    search_postings,
)
from raysearch.snippet import build_snippet


class IndexSearcher:
    """Holds lexicon + doc-length table + posting locators; stateless
    across queries, safe to use as a ``map_batches`` actor class.

    ``doc_range=(lo, hi)`` builds a SHARD searcher that owns only that
    doc_id range: doc-length/norm arrays are sized to the range
    (predicate-pushdown reads), posting CHUNKS wholly outside the range
    are pruned before decode via their first_doc/last_doc metadata, and
    every search is implicitly range-scoped.  Global statistics (df,
    n_docs, avg_doc_len) stay global, so per-doc scores are identical
    to an unsharded searcher — :class:`ShardedSearcher` merges shard
    top-ks into exactly the single-node ranking."""

    def __init__(
        self,
        index_dir: str,
        doc_range: tuple[int, int] | None = None,
        warm_top_terms: int = 0,
        lazy_lexicon: bool = False,
    ):
        self.index_dir = index_dir
        merged = os.path.join(index_dir, "merged")
        with open(os.path.join(merged, "meta.json")) as f:
            self.meta = json.load(f)
        self.mode = self.meta["mode"]
        self.lexer = Lexer(self.mode)
        self.n_docs = self.meta["n_docs"]
        self.avg_doc_len = self.meta["avg_doc_len"]
        self.buckets = int(self.meta.get("buckets", 1))
        self.doc_lo, self.doc_hi = doc_range if doc_range else (0, self.n_docs)

        self._post_dir = post_dir = os.path.join(merged, "postings")
        loc_dir = os.path.join(merged, "termlocs")
        lexparts_dir = os.path.join(merged, "lexparts")
        import glob as _glob

        loc_files = sorted(_glob.glob(os.path.join(loc_dir, "termloc-*.parquet")))

        # Lexicon + posting locator, three regimes:
        #
        # * lazy (shard actors): NOTHING vocab-scale is loaded — a
        #   term's df and its (file, row_group) locations are point-read
        #   from the per-bucket lexicon/locator slices the merge wrote
        #   (term → bucket is a hash, so the owning slice is known
        #   without any lookup); slices are LRU-cached per bucket, so
        #   per-actor memory is O(cached_buckets × vocab/buckets), flat
        #   in global vocabulary as bucket count scales with it.
        # * full + sidecar: load the merge-written term→row-group
        #   locator (one small parquet per bucket) — startup does ZERO
        #   posting-file reads (round 1 scanned the term column of
        #   every posting row group here).
        # * full, no sidecar (old index layout): fall back to the scan.
        # lazy routing hashes term → bucket, so it is only sound when
        # meta.json records the merge's bucket count; an index with
        # termloc files but no "buckets" field (foreign/old layout)
        # would silently route every term to bucket 0 — fall back to
        # eager in that case rather than trust the default of 1.
        self._lazy = bool(
            lazy_lexicon and loc_files and "buckets" in self.meta
        )
        self._term_locs: dict[str, list[tuple[str, int]]] = {}
        self._lex_index: dict[str, int] = {}
        self._lex_terms: list[str] = []
        self._lex_df = np.empty(0, dtype=np.int64)
        if self._lazy:
            self._lexparts_dir = lexparts_dir
            self._loc_dir = loc_dir
            self._bucket_cache: OrderedDict[
                int, tuple[dict, dict]
            ] = OrderedDict()
            self._bucket_cache_max = int(
                os.environ.get("RAYSEARCH_LAZY_BUCKETS", "64")
            )
        else:
            lex_table = pq.read_table(os.path.join(merged, "lexicon.parquet"))
            self._lex_terms = lex_table["term"].to_pylist()
            self._lex_df = lex_table["df"].to_numpy()
            self._lex_index = {t: i for i, t in enumerate(self._lex_terms)}
            if loc_files:
                for lf in loc_files:
                    b = os.path.basename(lf)[len("termloc-") : -len(".parquet")]
                    path = os.path.join(post_dir, f"bucket-{b}.parquet")
                    lt = pq.read_table(lf)
                    for term, rg in zip(
                        lt["term"].to_pylist(), lt["row_group"].to_pylist()
                    ):
                        self._term_locs.setdefault(term, []).append((path, int(rg)))
            else:
                for fname in sorted(os.listdir(post_dir)):
                    if not fname.endswith(".parquet"):
                        continue
                    path = os.path.join(post_dir, fname)
                    pf = pq.ParquetFile(path)
                    for rg in range(pf.metadata.num_row_groups):
                        tcol = pf.read_row_group(rg, columns=["term"])
                        for term in pc.unique(tcol["term"]).to_pylist():
                            self._term_locs.setdefault(term, []).append((path, rg))
        self._pf_cache: dict[str, pq.ParquetFile] = {}
        # LRU caches: repeated queries share terms (Zipf), so decoded
        # postings and raw row groups are kept hot.  Byte-bounded so a
        # searcher over a huge index stays within its actor heap.
        self._rg_cache: OrderedDict[tuple[str, int], pa.Table] = OrderedDict()
        self._rg_cache_max = int(os.environ.get("RAYSEARCH_RG_CACHE", "32"))
        self._term_cache: OrderedDict[str, TermPostings] = OrderedDict()
        self._term_cache_bytes = 0
        self._term_cache_budget = int(
            os.environ.get("RAYSEARCH_TERM_CACHE_BYTES", str(1 << 30))
        )
        self._bm_cache: OrderedDict[str, np.ndarray] = OrderedDict()

        # doc lengths (BM25 length normalization); int32 array indexed by doc_id
        # doc lengths for the owned range only (shards never hold the
        # global array — at 10^12 docs that is the point of sharding)
        self.doc_lens = np.zeros(self.doc_hi - self.doc_lo, dtype=np.int64)
        import glob as _glob

        filters = None
        if doc_range:
            filters = [
                ("doc_id", ">=", self.doc_lo),
                ("doc_id", "<", self.doc_hi),
            ]
        for p in sorted(
            _glob.glob(os.path.join(index_dir, "waves", "*", "doclens", "*.parquet"))
        ):
            t = pq.read_table(p, columns=["doc_id", "doc_len"], filters=filters)
            self.doc_lens[t["doc_id"].to_numpy() - self.doc_lo] = t[
                "doc_len"
            ].to_numpy()
        from raysearch.scoring import precompute_norms

        self.doc_norms = precompute_norms(self.doc_lens, self.avg_doc_len)

        # serving warm-up: decode the N highest-df posting lists once at
        # startup (they dominate tail latency; everything else is small)
        if warm_top_terms and not self._lazy:
            order = np.argsort(-self._lex_df)[:warm_top_terms]
            for i in order:
                self.fetch_postings(self._lex_terms[int(i)])

        # conv scope ranges (J4 analog) + doc→(conv, turn) inverse
        offsets = pq.read_table(os.path.join(index_dir, "conv_offsets.parquet"))
        self._conv_ids = offsets["conv_id"].to_pylist()
        self._conv_offsets = offsets["offset"].to_numpy()
        self._conv_turns = offsets["n_turns"].to_numpy()
        self._conv_index = {c: i for i, c in enumerate(self._conv_ids)}
        with open(os.path.join(index_dir, "input_meta.json")) as f:
            self._input_meta = json.load(f)

    # -- lexicon access (lazy per-bucket slices vs full dicts) -------------

    def _bucket_maps(self, b: int) -> tuple[dict, dict]:
        """(term→df, term→[(file, rg)]) for one bucket, LRU-cached."""
        hit = self._bucket_cache.get(b)
        if hit is not None:
            self._bucket_cache.move_to_end(b)
            return hit
        dfs: dict[str, int] = {}
        locs: dict[str, list[tuple[str, int]]] = {}
        lex_path = os.path.join(self._lexparts_dir, f"lexicon-{b:04d}.parquet")
        if os.path.exists(lex_path):
            lt = pq.read_table(lex_path, columns=["term", "df"])
            dfs = dict(zip(lt["term"].to_pylist(), lt["df"].to_pylist()))
            post_path = os.path.join(self._post_dir, f"bucket-{b:04d}.parquet")
            ll = pq.read_table(
                os.path.join(self._loc_dir, f"termloc-{b:04d}.parquet")
            )
            for term, rg in zip(ll["term"].to_pylist(), ll["row_group"].to_pylist()):
                locs.setdefault(term, []).append((post_path, int(rg)))
        out = (dfs, locs)
        self._bucket_cache[b] = out
        while len(self._bucket_cache) > self._bucket_cache_max:
            self._bucket_cache.popitem(last=False)
        return out

    def _df_of(self, term: str) -> int | None:
        if self._lazy:
            from raysearch.build import term_bucket

            df = self._bucket_maps(term_bucket(term, self.buckets))[0].get(term)
            return None if df is None else int(df)
        idx = self._lex_index.get(term)
        return None if idx is None else int(self._lex_df[idx])

    def _locs_of(self, term: str) -> list[tuple[str, int]] | None:
        if self._lazy:
            from raysearch.build import term_bucket

            return self._bucket_maps(term_bucket(term, self.buckets))[1].get(term)
        return self._term_locs.get(term)

    # -- posting fetch (J1 analog) ----------------------------------------

    def _read_row_group(self, path: str, rg: int) -> pa.Table:
        key = (path, rg)
        t = self._rg_cache.get(key)
        if t is not None:
            self._rg_cache.move_to_end(key)
            return t
        pf = self._pf_cache.get(path)
        if pf is None:
            pf = self._pf_cache[path] = pq.ParquetFile(path)
        t = pf.read_row_group(rg)
        self._rg_cache[key] = t
        while len(self._rg_cache) > self._rg_cache_max:
            self._rg_cache.popitem(last=False)
        return t

    def _term_rows(self, term: str) -> pa.Table | None:
        """All posting-chunk rows for a term (exact-located row groups);
        a shard searcher additionally prunes chunks wholly outside its
        doc range via the first_doc/last_doc chunk metadata."""
        locs = self._locs_of(term)
        if not locs:
            return None
        sharded = (self.doc_lo, self.doc_hi) != (0, self.n_docs)
        found = []
        for path, rg in locs:
            t = self._read_row_group(path, rg)
            mask = pc.equal(t["term"], term)
            if sharded:
                mask = pc.and_(
                    mask,
                    pc.and_(
                        pc.greater_equal(t["last_doc"], self.doc_lo),
                        pc.less(t["first_doc"], self.doc_hi),
                    ),
                )
            rows = t.filter(mask)
            if rows.num_rows:
                found.append(rows)
        if not found:
            return None
        return pa.concat_tables(found)

    def fetch_postings(self, term: str) -> TermPostings | None:
        df = self._df_of(term)
        if df is None:
            return None
        hit = self._term_cache.get(term)
        if hit is not None:
            self._term_cache.move_to_end(term)
            return hit
        rows = self._term_rows(term)
        if rows is None:
            return None
        chunks = sorted(
            zip(
                rows["first_doc"].to_pylist(),
                rows["chunk_id"].to_pylist(),
                rows["doc_blob"].to_pylist(),
                rows["tf_blob"].to_pylist(),
            )
        )
        parts = [decode_postings(db, tb) for _, _, db, tb in chunks]
        doc_ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        out = TermPostings(term, df, doc_ids, tfs)
        self._term_cache[term] = out
        self._term_cache_bytes += doc_ids.nbytes + tfs.nbytes
        while self._term_cache_bytes > self._term_cache_budget and self._term_cache:
            _, old = self._term_cache.popitem(last=False)
            self._term_cache_bytes -= old.doc_ids.nbytes + old.tfs.nbytes
        return out

    # -- query plan (J5 + K1/K2 analog) -----------------------------------

    def query_terms(self, query: str) -> list[str]:
        lemmas = self.lexer.split_to_lemmas(query)
        found = []
        for t in lemmas:
            df = self._df_of(t)
            if df is not None:
                found.append((t, df))
        return order_query_terms(found, self.n_docs)

    def conv_range(self, conv_id: str) -> tuple[int, int] | None:
        i = self._conv_index.get(conv_id)
        if i is None:
            return None
        lo = int(self._conv_offsets[i])
        return lo, lo + int(self._conv_turns[i])

    # -- search (shared scoring path) -------------------------------------

    def search(
        self,
        query: str,
        k: int = 10,
        scope: str | None = None,
        scorer: str = "bm25",
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """(top doc_ids, scores, total candidates) — must be
        rank-identical to Oracle.search on the same corpus."""
        terms = self.query_terms(query)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), 0)
        if not terms:
            return empty
        postings = []
        for t in terms:
            p = self.fetch_postings(t)
            if p is None:
                return empty
            postings.append(p)
        # effective range = conv scope ∩ shard range (either may be absent)
        lo, hi = self.doc_lo, self.doc_hi
        if scope:
            sr = self.conv_range(scope)
            if sr is None:
                return empty
            lo, hi = max(lo, sr[0]), min(hi, sr[1])
            if lo >= hi:
                return empty
        doc_range = None if (lo, hi) == (0, self.n_docs) else (lo, hi)
        return search_postings(
            postings,
            self.n_docs,
            self.avg_doc_len,
            self.doc_lens,
            k=k,
            scorer=scorer,
            doc_range=doc_range,
            doc_norms=self.doc_norms,
            doc_offset=self.doc_lo,
        )

    # -- disjunctive block-max WAND top-k ----------------------------------

    def _score_union(self, docs: np.ndarray, infos) -> np.ndarray:
        """Exact OR-mode BM25 scores for the given (sorted, in-range)
        doc set: Σ over matching terms, vectorized membership via
        searchsorted into each decoded posting list."""
        scores = np.zeros(len(docs), dtype=np.float64)
        norm = self.doc_norms[docs - self.doc_lo]
        for p, _bm, idf in infos:
            pos = np.minimum(np.searchsorted(p.doc_ids, docs), len(p.doc_ids) - 1)
            hit = p.doc_ids[pos] == docs
            tf = np.where(hit, p.tfs[pos], 0).astype(np.float64)
            scores += np.where(
                hit, idf * (tf * (BM25_K1 + 1.0)) / (tf + norm), 0.0
            )
        return scores

    def search_or(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """OR-semantics BM25 top-k with vectorized block-max pruning.

        Per-term, per-128-doc block maxima (bm_blob) bound each block's
        best possible contribution (dl→0 normalization).  A threshold θ
        is seeded by exactly scoring each term's single best block;
        then a block b of term t is pruned when
        ``ub_t[b] < θ − Σ_{t'≠t} max(ub_t')`` — any doc all of whose
        blocks are pruned satisfies bound(doc) < θ (its own block's
        inequality already absorbs every other term's maximum), so the
        union of surviving blocks' docs is a superset of the true
        top-k.  Surviving docs are scored exactly; every returned score
        is fully computed."""
        terms = self.query_terms(query)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if not terms:
            return empty
        infos = []
        for t in terms:
            p = self.fetch_postings(t)
            if p is None:
                continue
            bm = self._block_maxes(t)
            idf = bm25_idf(p.df, self.n_docs)
            infos.append((p, bm, idf))
        if not infos:
            return empty
        sharded = (self.doc_lo, self.doc_hi) != (0, self.n_docs)

        def in_range(d: np.ndarray) -> np.ndarray:
            if not sharded:
                return d
            return d[(d >= self.doc_lo) & (d < self.doc_hi)]

        # per-term block upper bounds
        ubs = [
            idf * (BM25_K1 + 1.0) * bm / (bm + BM25_K1 * (1.0 - BM25_B))
            for _p, bm, idf in infos
        ]
        max_ub = np.array([u.max() if len(u) else 0.0 for u in ubs])

        # θ seed: exact scores of each term's best block's docs
        seed = []
        for (p, _bm, _idf), u in zip(infos, ubs):
            if not len(u):
                continue
            b = int(np.argmax(u))
            seed.append(in_range(p.doc_ids[b * BLOCK : (b + 1) * BLOCK]))
        seed_docs = np.unique(np.concatenate(seed)) if seed else np.empty(0, np.int64)
        # A shard whose doc range contains none of the globally-best
        # blocks gets an empty seed — that only means no θ bound is
        # available, NOT that the shard has no matches; fall through
        # with θ=-inf so every block survives and is scored exactly.
        if len(seed_docs) >= k:
            seed_scores = self._score_union(seed_docs, infos)
            theta = float(-np.partition(-seed_scores, k - 1)[k - 1])
        else:
            theta = -np.inf

        # prune: block b of term t survives iff ub + Σ other maxima ≥ θ
        surv = []
        for ti, ((p, _bm, _idf), u) in enumerate(zip(infos, ubs)):
            rest = float(max_ub.sum() - max_ub[ti])
            keep = np.flatnonzero(u >= theta - rest)
            if len(keep) == len(u):
                surv.append(in_range(p.doc_ids))
                continue
            for b in keep:
                surv.append(in_range(p.doc_ids[b * BLOCK : (b + 1) * BLOCK]))
        docs = np.unique(np.concatenate(surv)) if surv else np.empty(0, np.int64)
        if not len(docs):
            return empty
        scores = self._score_union(docs, infos)
        return rank_results(docs, scores, k)

    def _block_maxes(self, term: str) -> np.ndarray:
        hit = self._bm_cache.get(term)
        if hit is not None:
            self._bm_cache.move_to_end(term)
            return hit
        rows = self._term_rows(term)
        bms = []
        if rows is not None:
            bms = sorted(
                (
                    (fd, varint_decode(bb).astype(np.float64))
                    for fd, bb in zip(
                        rows["first_doc"].to_pylist(), rows["bm_blob"].to_pylist()
                    )
                ),
                key=lambda x: x[0],
            )
        out = (
            np.concatenate([b for _, b in bms]) if bms else np.empty(0, np.float64)
        )
        self._bm_cache[term] = out
        while len(self._bm_cache) > 4096:
            self._bm_cache.popitem(last=False)
        return out

    # -- doc fetch (M9 analog: no network, predicate-pushdown point read) --

    def doc_locate(self, doc_id: int) -> tuple[str, int]:
        """doc_id → (conv_id, turn_idx) via the conv-offset table
        (inverse of the build's dense-rank assignment)."""
        i = int(np.searchsorted(self._conv_offsets, doc_id, side="right")) - 1
        conv = self._conv_ids[i]
        turn = doc_id - int(self._conv_offsets[i])
        if not 0 <= turn < int(self._conv_turns[i]):
            raise KeyError(f"doc_id {doc_id} out of range")
        return conv, int(turn)

    def fetch_docs(self, doc_ids: list[int]) -> pa.Table:
        """Point-read turn rows for result rendering; prunes fragments
        by the per-file conv ranges captured at build time and pushes
        (conv_id, turn_idx) filters into parquet."""
        wanted = [(d, *self.doc_locate(d)) for d in doc_ids]
        by_file: dict[str, list[tuple[int, str, int]]] = {}
        ranges = self._input_meta["file_ranges"]
        for d, conv, turn in wanted:
            for fr in ranges:
                if (fr["conv_min"] is None or fr["conv_min"] <= conv) and (
                    fr["conv_max"] is None or conv <= fr["conv_max"]
                ):
                    by_file.setdefault(fr["path"], []).append((d, conv, turn))
        tables = []
        for path, rows in by_file.items():
            convs = sorted({c for _, c, _ in rows})
            t = pq.read_table(
                path,
                columns=["conv_id", "turn_idx", "role", "text"],
                filters=[("conv_id", "in", convs)],
            )
            wanted_keys = {(c2, t2) for _, c2, t2 in rows}  # hoisted: O(rows+wanted)
            key_ok = pa.array(
                [
                    (c, tu) in wanted_keys
                    for c, tu in zip(
                        t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()
                    )
                ]
            )
            tables.append(t.filter(key_ok))
        if not tables:
            return pa.table({})
        out = pa.concat_tables(tables)
        # attach doc_id and order as requested
        idx = {
            (c, tu): i
            for i, (c, tu) in enumerate(
                zip(out["conv_id"].to_pylist(), out["turn_idx"].to_pylist())
            )
        }
        order = [idx[(c, tu)] for _, c, tu in wanted if (c, tu) in idx]
        out = out.take(order)
        return out.append_column("doc_id", pa.array([d for d, _, _ in wanted], pa.int64()))

    # -- full response (SearchData analog, dto/search/SearchData.java:6-13) --

    def suggest(self, term: str, max_d: int = 2, limit: int = 5) -> list[dict]:
        """Did-you-mean candidates over the INDEX lexicon — the
        serving-side sibling of ``pipelines.textstats.fuzzy_terms``
        (same ranking: Levenshtein distance asc, df desc, term asc;
        same admissible length prune; the banded capped DP from
        ``dedup._lev_capped``).  In lazy-lexicon mode the full
        lexicon parquet is read ONCE on first use and cached —
        suggestion is a miss-path feature, not per-query work."""
        from raysearch.pipelines.dedup import _lev_capped

        q = term.lower()
        if not self._lex_terms:
            lex_table = pq.read_table(
                os.path.join(self.index_dir, "merged", "lexicon.parquet")
            )
            self._lex_terms = lex_table["term"].to_pylist()
            self._lex_df = lex_table["df"].to_numpy()
        out = []
        for t, df in zip(self._lex_terms, self._lex_df):
            if abs(len(t) - len(q)) > max_d:
                continue
            d = _lev_capped(q, t, max_d)
            if d <= max_d:
                out.append((d, -int(df), t))
        out.sort()
        return [
            {"term": t, "d": d, "df": -ndf} for d, ndf, t in out[:limit]
        ]

    def search_response(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        scope: str | None = None,
        scorer: str = "bm25",
        mode: str = "and",
    ) -> dict:
        err = validate_query(query, self.mode)
        if err:
            return {"result": False, "error": err}
        if mode == "or":
            # disjunctive block-max WAND path; scope/scorer are the
            # conjunctive path's options (OR is BM25-only by design).
            # ``count`` is the number of RETURNED rows: WAND prunes
            # without materializing the full candidate union, so an
            # exact total would defeat the pruning (documented).
            ids, scores = self.search_or(query, k=offset + k)
            total = int(len(ids))
        else:
            ids, scores, total = self.search(
                query, k=offset + k, scope=scope, scorer=scorer
            )
        ids, scores = ids[offset : offset + k], scores[offset : offset + k]
        docs = self.fetch_docs(ids.tolist()) if len(ids) else pa.table({})
        query_lemmas = self.query_terms(query)
        data = []
        for i in range(len(ids)):
            text = docs["text"][i].as_py() if docs.num_rows > i else ""
            conv, turn = self.doc_locate(int(ids[i]))
            data.append(
                {
                    "conv_id": conv,
                    "turn_idx": turn,
                    "doc_id": int(ids[i]),
                    "role": docs["role"][i].as_py() if docs.num_rows > i else "",
                    "snippet": build_snippet(text, list(query_lemmas), self.lexer),
                    "relevance": float(scores[i]),
                }
            )
        return {"result": True, "count": total, "data": data}


def search(
    index_dir: str,
    query: str,
    k: int = 10,
    scope: str | None = None,
    scorer: str = "bm25",
) -> dict:
    """One-shot convenience wrapper (constructs a searcher per call —
    for repeated queries hold an IndexSearcher or use batch_search)."""
    return IndexSearcher(index_dir).search_response(query, k=k, scope=scope, scorer=scorer)


class _ShardSearch:
    """Ray-actor payload: one doc-range shard of the index."""

    def __init__(self, index_dir: str, doc_range: tuple[int, int]):
        # lazy lexicon: shard actors hold NO vocab-scale state — per-
        # bucket lexicon/locator slices are point-read + LRU-cached
        self.s = IndexSearcher(index_dir, doc_range=doc_range, lazy_lexicon=True)

    def search(self, query: str, k: int, scope, scorer: str):
        ids, scores, total = self.s.search(query, k=k, scope=scope, scorer=scorer)
        return ids, scores, total

    def search_or(self, query: str, k: int):
        return self.s.search_or(query, k=k)


class ShardedSearcher:
    """Distributed query path: the doc space is split into N contiguous
    ranges, one shard actor per range (each holds ONLY its range's
    doc-length/norm arrays and prunes posting chunks to its range —
    nothing per-shard scales with global n_docs except the lexicon).
    Per query every shard computes its exact range-scoped result with
    GLOBAL statistics (df, n_docs, avg_doc_len), so merging the shard
    top-ks by (score desc, doc_id asc) reproduces the single-node
    ranking bit-for-bit; candidate counts add because ranges are
    disjoint.  The reference scorer's max-normalization is global, so
    shards return raw tf-sums (``reference_abs``) and the driver
    normalizes by the global candidate max (= max over shard maxima,
    since each shard's top-1 is its max).

    This is the §3.2 restatement at cluster scale: on N nodes each
    shard actor lives near its segment data; query fan-out is one RPC
    per shard, merge is k×N rows on the driver."""

    def __init__(self, index_dir: str, n_shards: int = 4):
        import ray

        with open(os.path.join(index_dir, "merged", "meta.json")) as f:
            n_docs = json.load(f)["n_docs"]
        bounds = np.linspace(0, n_docs, n_shards + 1).astype(int)
        actor = ray.remote(num_cpus=1)(_ShardSearch)
        self.shards = [
            actor.remote(index_dir, (int(bounds[i]), int(bounds[i + 1])))
            for i in range(n_shards)
        ]
        self.n_shards = n_shards

    def search(
        self,
        query: str,
        k: int = 10,
        scope: str | None = None,
        scorer: str = "bm25",
    ) -> tuple[np.ndarray, np.ndarray, int]:
        import ray

        shard_scorer = "reference_abs" if scorer == "reference" else scorer
        parts = ray.get(
            [s.search.remote(query, k, scope, shard_scorer) for s in self.shards]
        )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))
        if not len(ids):
            return ids, scores, total
        if scorer == "reference":
            # global max over ALL candidates = max over shard maxima
            # (each shard's rank-1 result is its candidate max)
            scores = scores / max(float(p[1][0]) for p in parts if len(p[1]))
        order = np.lexsort((ids, -scores))[:k]
        return ids[order], scores[order], total

    def search_or(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        import ray

        parts = ray.get([s.search_or.remote(query, k) for s in self.shards])
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        if not len(ids):
            return ids, scores
        order = np.lexsort((ids, -scores))[:k]
        return ids[order], scores[order]


class SearcherActor:
    """Batch query evaluation stage: ``queries_ds.map_batches(SearcherActor,
    fn_constructor_kwargs={"index_dir": ...}, concurrency=N)`` — the Ray
    restatement of serving queries from a pool of IndexSearchers
    (SURVEY §3.2 step 5).  Input batch columns: query_id, query, scope
    (may be ""), k; output: one row per (query_id, rank)."""

    def __init__(self, index_dir: str, scorer: str = "bm25"):
        self.searcher = IndexSearcher(index_dir)
        self.scorer = scorer

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ks = batch["k"].to_pylist() if "k" in batch.column_names else None
        scopes = batch["scope"].to_pylist() if "scope" in batch.column_names else None
        for i, (qid, q) in enumerate(
            zip(batch["query_id"].to_pylist(), batch["query"].to_pylist())
        ):
            k = int(ks[i]) if ks else 10
            scope = scopes[i] if scopes and scopes[i] else None
            ids, scores, _ = self.searcher.search(q, k=k, scope=scope, scorer=self.scorer)
            for rank, (d, s) in enumerate(zip(ids.tolist(), scores.tolist())):
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(d)
                out["score"].append(s)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "rank": pa.array(out["rank"], pa.int32()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )
