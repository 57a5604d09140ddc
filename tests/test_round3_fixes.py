"""Regression tests for the round-3 VERDICT/ADVICE items:

* transcripts_snippets golden hash (the one fixture search row without
  a SQL twin — VERDICT r2 next-round #5);
* lazy-lexicon hard fallback when meta.json lacks "buckets" (ADVICE);
* minhash LSH verification domain == jaccard_pairs_exact domain
  (short <k-token docs excluded on BOTH sides — ADVICE);
* HTTP handlers return structured JSON on malformed params (ADVICE)
  — in test_serve.py, which owns the server fixture.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest


def test_transcripts_snippets_golden_hash(ray_session):
    """Pinned canonical hash of the full snippet row output (sf0.001
    fixture corpus).  Regenerate after a DELIBERATE fixture/snippet
    change with:

        python3 -c "import sys; sys.path.insert(0, '.'); \
import importlib.util, hashlib; \
spec = importlib.util.spec_from_file_location('e', '__ray_entry__.py'); \
e = importlib.util.module_from_spec(spec); spec.loader.exec_module(e); \
df = e._q_transcripts_snippets('/root/testdata/sf0.001'); \
rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)); \
h = hashlib.sha256(); \
[ (h.update(chr(31).join(r).encode()), h.update(b'\\x1e')) for r in rows ]; \
print(h.hexdigest()[:16])"
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_snippet_golden",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__ray_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    df = entry._q_transcripts_snippets("/root/testdata/sf0.001")
    assert len(df) == 12
    rows = sorted(
        tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    assert h.hexdigest()[:16] == "ef9ed7002720c540"


def test_lazy_lexicon_requires_buckets_meta(ray_session, tiny_corpus, tmp_path):
    """An index with termloc sidecars but NO "buckets" field in
    meta.json (foreign/old layout) must fall back to EAGER lexicon
    loading instead of silently hashing every term to bucket 0."""
    from raysearch.build import build_index
    from raysearch.search import IndexSearcher
    from raysearch.vocab import LEMMAS

    index = str(tmp_path / "idx")
    build_index(tiny_corpus, index, mode="latin", n_partitions=2)

    lazy = IndexSearcher(index, lazy_lexicon=True)
    assert lazy._lazy  # normal layout: lazy engages

    # strip the buckets field
    stripped = str(tmp_path / "idx_nobuckets")
    shutil.copytree(index, stripped)
    meta_path = os.path.join(stripped, "merged", "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta.pop("buckets")
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    s = IndexSearcher(stripped, lazy_lexicon=True)
    assert not s._lazy  # fell back to eager
    ids, scores, total = s.search(LEMMAS[3], k=5)
    ref_ids, ref_scores, ref_total = IndexSearcher(index).search(LEMMAS[3], k=5)
    assert total == ref_total and (ids == ref_ids).all()


def test_minhash_short_doc_domain_matches_exact(ray_session):
    """Two identical 2-token docs (< shingle k=3) must NOT be emitted
    by minhash_lsh_pairs — jaccard_pairs_exact excludes <k-token docs,
    and since round 3 the LSH verification shares that domain (so the
    recall row's 'precision 1.0 by construction' is literally true)."""
    import ray.data as rd

    from raysearch.pipelines.dedup import jaccard_pairs_exact, minhash_lsh_pairs

    texts = [
        "tiny doc",          # 2 tokens: outside the shingle domain
        "tiny doc",          # identical twin
        "a full length document about streaming data engines",
        "a full length document about streaming data planes",  # near-dup
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    lsh = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    exact = jaccard_pairs_exact(ds, threshold=0.5).to_pandas()
    l = set(zip(lsh.doc_a, lsh.doc_b))
    e = set(zip(exact.doc_a, exact.doc_b))
    assert (0, 1) not in l  # short twins excluded, like the exact twin
    assert l == e  # identical domain + exact verification
