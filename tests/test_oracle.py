"""Oracle invariants + reference-quirk parity (SURVEY.md §5 item (f))."""

import numpy as np
import pytest

from raysearch.gen import GOLDEN_SENTENCES, conv_name
from raysearch.oracle import Oracle, trim_to_limit
from raysearch.scoring import TermPostings, search_postings
from raysearch.vocab import LEMMAS


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    return Oracle(tiny_corpus, mode="latin")


def test_df_equals_distinct_doc_count(oracle):
    for term, p in oracle.postings.items():
        assert p.df == len(set(p.doc_ids.tolist())), term
        assert (np.diff(p.doc_ids) > 0).all(), term  # sorted unique


def test_doc_len_is_sum_of_tfs(oracle):
    lens = np.zeros(oracle.n_docs, dtype=np.int64)
    for p in oracle.postings.values():
        lens[p.doc_ids] += p.tfs
    assert lens.tolist() == oracle.doc_lens.tolist()


def test_intersection_subset_property(oracle):
    hot = LEMMAS[0]
    rare = LEMMAS[150]
    ids, _, total = oracle.search(f"{hot} {rare}", k=-1)
    assert total == len(ids)
    for term in [hot, rare]:
        p = oracle.postings.get(term)
        if p is not None:
            assert set(ids.tolist()) <= set(p.doc_ids.tolist())


def test_hot_term_zipf_skew(oracle):
    # Zipf sampling ⇒ rank-0 lemma df far above rank-500
    df0 = oracle.postings[LEMMAS[0]].df
    assert df0 > oracle.n_docs * 0.5
    tail = oracle.postings.get(LEMMAS[500])
    assert tail is None or tail.df < df0 / 5


def test_stop_lemma_prune(oracle):
    # df/N > 0.95 terms dropped from query plans (SearchServiceImpl.java:161-163)
    for term, p in oracle.postings.items():
        if p.df / oracle.n_docs > 0.95:
            assert term not in oracle.query_terms(term)


def test_rarest_first_order(oracle):
    terms = oracle.query_terms(f"{LEMMAS[0]} {LEMMAS[40]} {LEMMAS[400]}")
    dfs = [oracle.postings[t].df for t in terms]
    assert dfs == sorted(dfs)


def test_bm25_monotone_in_tf():
    # property: higher tf ⇒ higher BM25, all else equal
    doc_lens = np.full(10, 50, dtype=np.int64)
    p = TermPostings(
        "t", 5, np.arange(5, dtype=np.int64), np.array([1, 2, 4, 8, 16], dtype=np.int64)
    )
    ids, scores, _ = search_postings([p], 10, 50.0, doc_lens, k=-1)
    by_doc = dict(zip(ids.tolist(), scores.tolist()))
    ordered = [by_doc[d] for d in range(5)]
    assert ordered == sorted(ordered)


def test_reference_scorer_max_normalized(oracle):
    ids, scores, _ = oracle.search(LEMMAS[1], k=-1, scorer="reference")
    if len(scores):
        assert scores.max() == 1.0
        assert (scores > 0).all()
        assert (np.diff(scores) <= 0).all()


def test_scoped_search(oracle):
    scope = conv_name(3)
    lo, hi = oracle.conv_ranges[scope]
    ids, _, _ = oracle.search(LEMMAS[0], k=-1, scope=scope)
    assert all(lo <= d < hi for d in ids.tolist())
    assert oracle.search(LEMMAS[0], k=5, scope="conv-nonexistent")[2] == 0


def test_inflected_query_matches_via_lemma(oracle):
    # a query in an inflected surface form must hit the lemma's postings
    from raysearch.vocab import LEMMA_FORMS

    lemma = next(l for l in LEMMAS[:50] if len(LEMMA_FORMS[l]) > 1 and l in oracle.postings)
    inflected = LEMMA_FORMS[lemma][1]
    ids_a, sc_a, _ = oracle.search(lemma, k=10)
    ids_b, sc_b, _ = oracle.search(inflected, k=10)
    assert ids_a.tolist() == ids_b.tolist()
    assert sc_a.tolist() == sc_b.tolist()


def test_golden_sentence_reachable(oracle):
    # golden Russian cells exist but latin mode tokenizes them away
    ids, _, total = oracle.search("xyzzy notaword", k=10)
    assert total == 0 and len(ids) == 0


def test_empty_and_unknown_queries(oracle):
    assert oracle.search("", k=10)[2] == 0
    assert oracle.search("qqqqzzzz", k=10)[2] == 0


def test_trim_to_limit_reference_quirk():
    items = list(range(30))
    assert trim_to_limit(items, 50, 0) == items  # size <= limit → all
    assert trim_to_limit(items, 10, 5) == list(range(5, 15))
    with pytest.raises(IndexError):
        trim_to_limit(items, 25, 10)  # the reference's broken arithmetic
