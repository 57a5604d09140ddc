"""Snippet construction — faithful port of the reference algorithm
(services/SnippetSearch.java, M10–M12 in SURVEY §2.2).

Algorithm (cites into /root/reference/src/main/java/searchengine/services/SnippetSearch.java):

* tokenize the document with the SAME regex pipeline as indexing,
  keeping function words and computing each word's normal form via
  ``wordToLemmaString`` (:14-29);
* find the query window: for window sizes |query lemmas| … 19, scan
  left-to-right for the first window whose normal forms contain ALL
  query lemmas (:31-55); on failure drop the LAST query lemma — the
  most frequent one, since the query list arrives df-ascending — and
  retry (:57-68; note the reference mutates the shared list, we copy);
* render a 21-word window positioned by the reference's arithmetic
  (:70-83), wrapping every word whose normal form is a query lemma in
  ``<b>`` and joining with trailing spaces (:85-96).

Documented divergence: the reference's ``getSnippetPosition`` returns
index 20 / size-21 unconditionally and would throw on texts shorter
than 21 words (the constructor clamps ``snippetSize`` but not the
render positions); we clamp the render window to the text bounds
instead of crashing.
"""

from __future__ import annotations

SNIPPET_WINDOW = 20


def _word_list(text: str, lexer) -> tuple[list[str], list[str]]:
    """(surface words, normal forms) — SnippetSearch.java:18-26; note
    function words are KEPT here, unlike the index path."""
    cleaned = lexer._strip.sub("" if lexer.joins else " ", text.lower()).strip()
    if not cleaned:
        return [], []
    words = lexer._ws.split(cleaned)
    normals = [lexer.word_to_lemma(w) for w in words]
    return words, normals


def _find_query_window(
    normals: list[str], query_lemmas: list[str], snippet_size: int
) -> tuple[int, int] | None:
    """SnippetSearch.java:31-55: smallest, leftmost window containing
    every query lemma; window sizes |lemmas| … snippet_size-1."""
    need = set(query_lemmas)
    n = len(normals)
    for box in range(len(query_lemmas), snippet_size):
        for i in range(0, n - box):
            if need <= set(normals[i : i + box]):
                return i, i + box
    return None


def build_snippet(text: str, query_lemmas: list[str], lexer) -> str:
    words, normals = _word_list(text, lexer)
    if not words:
        return ""
    snippet_size = min(SNIPPET_WINDOW, len(words))
    # getQueryPositionInText (SnippetSearch.java:56-68): `lemmaList`
    # ALIASES the query list, so each removal also shrinks the loop
    # bound — an n-lemma query tries only ceil(n/2) shrinking attempts
    # and the surviving list (floor(n/2) lemmas; empty iff n==1 fails)
    # is what isWordInQuery bolds (:99-105).  We mutate a copy with the
    # identical loop shape instead of the caller's list.
    lemmas = list(query_lemmas)
    pos = None
    i = 0
    while i < len(lemmas):
        pos = _find_query_window(normals, lemmas, snippet_size)
        if pos is not None:
            break
        lemmas.pop()  # drop most frequent (df-asc order ⇒ last)
        i += 1

    n = len(words)
    if pos is None:
        lo, hi = 0, SNIPPET_WINDOW
    else:
        start, end = pos
        box = end - start + 1
        if start <= 10 - box // 2:
            lo, hi = 0, SNIPPET_WINDOW
        elif end >= n - 11 + box // 2:
            lo, hi = n - 21, n - 1
        else:
            lo, hi = start - 10 + box // 2, end + 10 - box // 2
    lo = max(0, lo)
    hi = min(n - 1, hi)

    # reference bolds via the (mutated) query list — when every lemma
    # was popped it bolds NOTHING (SnippetSearch.java:99-105)
    in_query = set(lemmas)
    parts = []
    for i in range(lo, hi + 1):
        if normals[i] in in_query:
            parts.append(f"<b>{words[i]}</b> ")
        else:
            parts.append(f"{words[i]} ")
    return "".join(parts)
