"""Single-process reference-faithful oracle (FIXTURES.md §4).

Replays the reference's whole pipeline naively in one process — the
ground truth the Ray engine must match rank-identically (doc_ids AND
scores) at every partition count and parallelism level:

* per-turn tokenize/lemmatize via the SAME lex.py kernel the engine
  uses (one lemmatizer definition, SURVEY §7 Phase 0);
* doc_id = dense rank under stable (conv_id, turn_idx) sort — the
  deterministic replacement for the reference's MySQL auto-increment
  page ids (model/Page.java:14-16);
* postings kept as plain dict term → (doc_ids, tfs) — the in-memory
  analog of the reference's ``index`` table
  (model/SearchIndex.java:11-27), df of a term = number of docs
  containing it, matching ``Lemma.frequency`` semantics
  (services/RecursiveSearch.java:150-162);
* queries answered through the SHARED scoring.py path (candidate
  semantics + scorers), so engine-vs-oracle comparison isolates the
  distributed build, not the math.

Also carries ``trim_to_limit`` — a faithful replica of the reference's
pre-score pagination quirk (SearchServiceImpl.java:142-151, K4 in
SURVEY §2.6) kept for parity tests; the engine's public API paginates
after scoring (documented divergence, SURVEY §2.6).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq

from raysearch.lex import Lexer
from raysearch.scoring import TermPostings, order_query_terms, search_postings


class Oracle:
    def __init__(self, transcripts_dir: str, mode: str = "latin"):
        self.mode = mode
        self.lexer = Lexer(mode)
        paths = sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))
        tables = [pq.read_table(p, columns=["conv_id", "turn_idx", "text"]) for p in paths]
        import pyarrow as pa

        table = pa.concat_tables(tables)
        table = table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        self.conv_ids = table["conv_id"].to_pylist()
        self.turn_idx = table["turn_idx"].to_pylist()
        texts = table["text"].to_pylist()
        self.n_docs = len(texts)
        post: dict[str, list[tuple[int, int]]] = {}
        doc_lens = np.zeros(self.n_docs, dtype=np.int64)
        for doc_id, text in enumerate(texts):
            counts = self.lexer.split_to_lemmas(text)
            doc_lens[doc_id] = sum(counts.values())
            for lemma, tf in counts.items():
                post.setdefault(lemma, []).append((doc_id, tf))
        self.postings: dict[str, TermPostings] = {}
        for term, pairs in post.items():
            doc_ids = np.array([d for d, _ in pairs], dtype=np.int64)
            tfs = np.array([t for _, t in pairs], dtype=np.int64)
            self.postings[term] = TermPostings(term, len(pairs), doc_ids, tfs)
        self.doc_lens = doc_lens
        self.total_tokens = int(doc_lens.sum())
        self.avg_doc_len = self.total_tokens / self.n_docs if self.n_docs else 0.0
        # conv → (first doc_id, end doc_id) for scoped queries (J4 analog)
        self.conv_ranges: dict[str, tuple[int, int]] = {}
        for doc_id, conv in enumerate(self.conv_ids):
            if conv not in self.conv_ranges:
                self.conv_ranges[conv] = (doc_id, doc_id + 1)
            else:
                lo, _ = self.conv_ranges[conv]
                self.conv_ranges[conv] = (lo, doc_id + 1)

    # ------------------------------------------------------------------

    def lexicon(self) -> dict[str, tuple[int, int]]:
        """term → (df, cf) — the ``lemma`` table analog."""
        return {
            t: (p.df, int(p.tfs.sum())) for t, p in self.postings.items()
        }

    def query_terms(self, query: str) -> list[str]:
        """getLemmaList analog (SearchServiceImpl.java:153-168): lemmatize,
        drop unknown, drop df/N>0.95, order (df asc, term asc)."""
        lemmas = self.lexer.split_to_lemmas(query)
        found = [
            (t, self.postings[t].df) for t in lemmas if t in self.postings
        ]
        return order_query_terms(found, self.n_docs)

    def search(
        self,
        query: str,
        k: int = 10,
        scope: str | None = None,
        scorer: str = "bm25",
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """(top doc_ids, scores, total candidates) via shared scoring.py."""
        terms = self.query_terms(query)
        if not terms:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
                0,
            )
        postings = [self.postings[t] for t in terms]
        doc_range = self.conv_ranges.get(scope) if scope else None
        if scope and doc_range is None:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
                0,
            )
        return search_postings(
            postings,
            self.n_docs,
            self.avg_doc_len,
            self.doc_lens,
            k=k,
            scorer=scorer,
            doc_range=doc_range,
        )


def trim_to_limit(items: list, limit: int, offset: int) -> list:
    """Faithful replica of the reference's pagination
    (SearchServiceImpl.java:142-151) including its quirk: when the list
    is longer than ``limit``, it returns ``items[offset:offset+limit]``
    via two subList calls — the second of which
    (``subList(limit, size - offset)``) can throw for offset>0 in the
    original; here we reproduce the *intended* slice and raise the same
    way the reference would when the arithmetic is invalid."""
    if len(items) <= limit:
        return list(items)
    rest = items[offset:]
    if limit > len(items) - offset:
        raise IndexError("reference trimToLimit arithmetic invalid for this offset")
    return rest[:limit]
