"""Regression tests for the round-2 correctness fixes (ADVICE.md):

* sharded ``search_or`` must not lose a shard's results when every
  term's globally-best block lies outside the shard's doc range;
* snippet fallback loop mirrors the reference's aliased-list loop
  (SnippetSearch.java:56-68): ceil(n/2) shrinking attempts, the
  surviving (never reset) lemma list drives the ``<b>`` highlight;
* ``rank_results`` with k=0 returns empty instead of raising;
* ``partitions_of`` returns EVERY partition whose file conv range
  covers the conversation (straddling convs rebuild all of them);
* batch and scalar tokenize paths lower-case identically on
  non-ASCII input (pc.utf8_lower == str.lower).
"""

import json
import os

import numpy as np
import pytest

from raysearch.lex import Lexer
from raysearch.snippet import build_snippet
from raysearch.vocab import LEMMAS

pytest.importorskip("ray")


@pytest.fixture(scope="module")
def built(ray_session, small_corpus, tmp_path_factory):
    from raysearch.build import build_index

    out = str(tmp_path_factory.mktemp("r2idx") / "idx")
    build_index(small_corpus, out, mode="latin", n_partitions=4)
    return small_corpus, out


def test_sharded_or_keeps_out_of_seed_shards(built):
    """ADVICE high: a shard owning none of the globally-best blocks
    used to return empty from search_or.  Every matching doc must
    surface from exactly one shard when k is large enough."""
    from raysearch.oracle import Oracle
    from raysearch.search import IndexSearcher

    corpus, index = built
    oracle = Oracle(corpus, mode="latin")
    single = IndexSearcher(index)
    q = f"{LEMMAS[10]} {LEMMAS[100]}"
    terms = single.query_terms(q)
    assert terms
    union = sorted(
        set().union(*[set(oracle.postings[t].doc_ids.tolist()) for t in terms])
    )
    bounds = np.linspace(0, single.n_docs, 6).astype(int)
    got: list[int] = []
    for i in range(5):
        sh = IndexSearcher(index, doc_range=(int(bounds[i]), int(bounds[i + 1])))
        ids, scores = sh.search_or(q, k=len(union) + 10)
        # scores must be the exact global scores (global stats)
        gids, gscores = single.search_or(q, k=len(union) + 10)
        gmap = dict(zip(gids.tolist(), gscores.tolist()))
        for d, s in zip(ids.tolist(), scores.tolist()):
            assert s == pytest.approx(gmap[d], rel=1e-12)
        got.extend(ids.tolist())
    assert sorted(got) == union  # no shard lost docs, no duplicates


def test_rank_results_k0():
    from raysearch.scoring import rank_results

    cand = np.array([1, 2, 3], dtype=np.int64)
    scores = np.array([0.5, 0.9, 0.1])
    ids, sc = rank_results(cand, scores, 0)
    assert len(ids) == 0 and len(sc) == 0


def test_search_k0(built):
    from raysearch.search import IndexSearcher

    s = IndexSearcher(built[1])
    ids, scores, total = s.search(LEMMAS[10], k=0)
    assert len(ids) == 0 and total >= 0


def test_snippet_fallback_mirrors_reference_loop():
    """SnippetSearch.java:56-68: `lemmaList` ALIASES the query list so a
    2-lemma query gets ONE attempt; the failed query renders the
    [0,20] head window and bolds via the surviving list."""
    lexer = Lexer("simple")
    words = [f"w{i}" for i in range(30)]
    words[25] = "alpha"  # present, but never tried alone (n=2 → 1 attempt)
    text = " ".join(words)
    snip = build_snippet(text, ["alpha", "zzmissing"], lexer)
    rendered = snip.split()
    assert rendered[0] == "w0" and len(rendered) == 21  # head window
    assert "<b>" not in snip  # alpha is outside the window


def test_snippet_single_lemma_total_miss_bolds_nothing():
    """n=1 failure empties the list → reference bolds nothing."""
    lexer = Lexer("simple")
    text = " ".join(f"w{i}" for i in range(25))
    snip = build_snippet(text, ["absent"], lexer)
    assert "<b>" not in snip and snip.startswith("w0 ")


def test_snippet_found_window_still_bolds():
    lexer = Lexer("simple")
    words = [f"w{i}" for i in range(40)]
    words[30] = "alpha"
    words[32] = "beta"
    snip = build_snippet(" ".join(words), ["alpha", "beta"], lexer)
    assert "<b>alpha</b>" in snip and "<b>beta</b>" in snip


def test_batch_scalar_lowercase_identity():
    """U+212A KELVIN SIGN lowers to 'k' in BOTH tokenize paths, so
    index-time and query-time lemmas agree (rank identity)."""
    import pyarrow as pa

    text = "boiling 373K exactly"
    for mode in ("latin", "simple"):
        lexer = Lexer(mode)
        parent, lemmas = lexer.token_parent_pairs(pa.array([text]))
        batch_tokens = sorted(lemmas.tolist())
        scalar_tokens = sorted(lexer.tokenize(text))
        assert batch_tokens == scalar_tokens


def test_partitions_of_straddling_conv(tmp_path):
    """A conv covered by files in two partitions must report both."""
    from raysearch.build import partition_of, partitions_of

    out = tmp_path / "idx"
    out.mkdir()
    meta = {
        "files": ["a.parquet", "b.parquet", "c.parquet", "d.parquet"],
        "n_partitions": 2,
        "file_ranges": [
            {"path": "a.parquet", "conv_min": "conv-000", "conv_max": "conv-009"},
            {"path": "b.parquet", "conv_min": "conv-009", "conv_max": "conv-019"},
            {"path": "c.parquet", "conv_min": "conv-020", "conv_max": "conv-029"},
            {"path": "d.parquet", "conv_min": "conv-030", "conv_max": "conv-039"},
        ],
    }
    with open(out / "input_meta.json", "w") as f:
        json.dump(meta, f)
    # conv-009 straddles files a (partition 0) and b (partition 1)
    assert partitions_of(str(out), "conv-009") == [0]
    meta["file_ranges"][1]["conv_min"] = "conv-005"
    with open(out / "input_meta.json", "w") as f:
        json.dump(meta, f)
    assert partitions_of(str(out), "conv-009") == [0]  # both files in p0
    # now spread the straddle across the partition boundary
    meta["file_ranges"][2]["conv_min"] = "conv-009"
    with open(out / "input_meta.json", "w") as f:
        json.dump(meta, f)
    assert partitions_of(str(out), "conv-009") == [0, 1]
    assert partition_of(str(out), "conv-009") == 0
    with pytest.raises(KeyError):
        partitions_of(str(out), "conv-999")


def test_termloc_sidecar_matches_scan(built):
    """The merge-written term→row-group locator must equal the startup
    scan's locator exactly (same files, same row groups), and startup
    must not read any posting file when the sidecar exists."""
    import glob
    import shutil

    from raysearch.search import IndexSearcher

    _, index = built
    merged = os.path.join(index, "merged")
    assert glob.glob(os.path.join(merged, "termlocs", "termloc-*.parquet"))
    s_sidecar = IndexSearcher(index)

    # force the scan fallback by hiding the sidecar
    hid = os.path.join(merged, "_hidden_termlocs")
    shutil.move(os.path.join(merged, "termlocs"), hid)
    try:
        s_scan = IndexSearcher(index)
    finally:
        shutil.move(hid, os.path.join(merged, "termlocs"))
    assert s_sidecar._term_locs == s_scan._term_locs


def test_lazy_lexicon_shard_state_and_identity(built):
    """lazy_lexicon searchers hold no vocab-scale dicts and return
    bit-identical results to the full searcher."""
    from raysearch.search import IndexSearcher

    _, index = built
    full = IndexSearcher(index)
    lazy = IndexSearcher(index, lazy_lexicon=True)
    assert lazy._lazy
    assert not lazy._lex_index and not lazy._term_locs  # nothing global
    for q in (LEMMAS[10], f"{LEMMAS[10]} {LEMMAS[100]}", LEMMAS[1], "unknownzz"):
        i1, s1, t1 = full.search(q, k=10)
        i2, s2, t2 = lazy.search(q, k=10)
        assert i1.tolist() == i2.tolist()
        assert s1.tolist() == s2.tolist() and t1 == t2
        o1 = full.search_or(q, k=10)
        o2 = lazy.search_or(q, k=10)
        assert o1[0].tolist() == o2[0].tolist()
    # bucket cache is bounded
    assert len(lazy._bucket_cache) <= lazy._bucket_cache_max
